"""Inference: batched sliding-window transcription + note decoding + MIDI."""

from nylon_amt_tpu.infer.decode import mpe2note
from nylon_amt_tpu.infer.transcribe import Transcriber

__all__ = ["Transcriber", "mpe2note"]
