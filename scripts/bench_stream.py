"""Streaming (serving) benchmark: real-time factor and block latency.

Drives :class:`nylon_amt_tpu.infer.stream.StreamingTranscriber` on the
paper-scale model exactly as ``cli serve`` does — audio fed in fixed-ms
chunks, posterior blocks emitted as soon as their future margin exists —
and reports:

* ``rtf``: audio seconds processed per wall second (streaming, batch 1);
* ``block_ms_p50`` / ``p95``: wall time of the feeds that finalize a block
  (model forward + feature rows + ring-buffer bookkeeping + tunnel RTT);
* ``algorithmic_latency_s``: the emit delay inherent to the model geometry
  (block + future margin + STFT lookahead), independent of compute.

The serving regime is latency-bound, not throughput-bound: blocks arrive
every 2.048 s of audio and each costs a batch-1 forward, so rtf >> 1 means
one chip can serve many concurrent streams (~rtf sessions at full duty).

Prints one JSON line. Run on a real TPU: python scripts/bench_stream.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--chunk-ms", type=float, default=100.0)
    args = ap.parse_args()

    import jax

    from nylon_amt_tpu.config import Config, ModelConfig
    from nylon_amt_tpu.infer.stream import StreamingTranscriber
    from nylon_amt_tpu.models.hft import init_params
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = Config(model=ModelConfig(
        hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3, enc_head=4,
        dec_head=4, dropout=0.0, compute_dtype="bfloat16"))
    params = init_params(config, jax.random.key(0))
    sr = config.feature.sr
    rng = np.random.default_rng(0)
    t = np.arange(int(args.seconds * sr)) / sr
    wav = (0.2 * np.sin(2 * np.pi * 440.0 * t)
           * (np.sin(2 * np.pi * 0.7 * t) > 0)
           + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
    chunk = max(1, int(sr * args.chunk_ms / 1000))

    # ONE Transcriber shared between warmup and the timed run: a serving
    # process keeps its jitted forward alive across sessions; per-session
    # re-jit would recompile (bound-method jit caches are per instance)
    from nylon_amt_tpu.infer.transcribe import Transcriber

    tr = Transcriber(config, params=params, batch_windows=1)

    # warmup: compile the batch-1 forward + both feature bucket shapes
    st = StreamingTranscriber(config, transcriber=tr)
    st.feed(wav[: chunk * 40])
    st.flush()

    st = StreamingTranscriber(config, transcriber=tr)
    block_times = []
    t0 = time.perf_counter()
    for i in range(0, wav.shape[0], chunk):
        tb = time.perf_counter()
        blocks = st.feed(wav[i : i + chunk])
        if blocks:
            # fence: posteriors are numpy already (host-materialized)
            block_times.append(time.perf_counter() - tb)
    st.flush()
    wall = time.perf_counter() - t0
    # decode timed separately: with random-init params the posteriors sit at
    # ~0.5 and produce absurd note counts, which is a property of the params,
    # not of the serving pipeline
    td = time.perf_counter()
    n_notes = len(st.notes())
    decode_s = time.perf_counter() - td

    bt = np.sort(np.asarray(block_times)) * 1e3
    print(json.dumps({
        "metric": "stream_rtf",
        "value": round(args.seconds / wall, 2),
        "unit": "audio_sec/wall_sec (streaming, batch 1)",
        "chunk_ms": args.chunk_ms,
        "blocks": len(block_times),
        "block_ms_p50": round(float(bt[len(bt) // 2]), 2),
        "block_ms_p95": round(float(bt[int(len(bt) * 0.95)]), 2),
        "algorithmic_latency_s": round(st.latency_seconds, 3),
        "notes": n_notes,
        "final_decode_s": round(decode_s, 2),
    }))


if __name__ == "__main__":
    main()
