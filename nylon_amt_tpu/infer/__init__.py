"""Inference: batched sliding-window transcription + note decoding + MIDI."""

from nylon_amt_tpu.infer.decode import mpe2note
from nylon_amt_tpu.infer.transcribe import Transcriber


def __getattr__(name):
    # lazy: stream/serve pull in ring-buffer machinery most callers skip
    if name == "StreamingTranscriber":
        from nylon_amt_tpu.infer.stream import StreamingTranscriber
        return StreamingTranscriber
    if name == "StreamServer":
        from nylon_amt_tpu.infer.serve import StreamServer
        return StreamServer
    raise AttributeError(name)


__all__ = ["Transcriber", "mpe2note", "StreamingTranscriber", "StreamServer"]
