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
    ap.add_argument("--streams", type=int, default=1,
                    help=">1: concurrent sessions through StreamServer "
                         "(one batched forward per pump)")
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

    if args.streams > 1:
        return bench_multi(config, params, wav, chunk, args)

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


def bench_multi(config, params, wav, chunk, args) -> None:
    """N concurrent sessions through StreamServer: aggregate audio-sec per
    wall-sec, and per-pump wall time (one batched forward for all streams)."""
    import time

    import numpy as np

    from nylon_amt_tpu.infer.serve import StreamServer
    from nylon_amt_tpu.infer.transcribe import Transcriber

    N = args.streams
    tr = Transcriber(config, params=params, batch_windows=N)
    # offset each stream's audio so content differs (defeats nothing on
    # device — just keeps the workload honest)
    wavs = [np.roll(wav, 1000 * i) for i in range(N)]

    # warmup: compile the batch-N forward + the steady-state batched
    # featurize shape (first block = 160 rows/session, later blocks = 128;
    # the 128-shape only appears once block 2 is ready, i.e. 288 frames in)
    srv = StreamServer(config, transcriber=tr)
    sids = [srv.open() for _ in range(N)]
    for i in range(0, int(6.5 * config.feature.sr), chunk):
        for sid, w in zip(sids, wavs):
            srv.feed(sid, w[i : i + chunk])
        srv.pump()
    for sid in sids:
        srv.close(sid)
    while srv.session_ids:
        srv.pump()

    # realistic decode load: random-init posteriors sit at ~0.5, so default
    # thresholds decode absurd note counts (a params artifact, not a
    # pipeline property) — raise them so the decode cost matches a trained
    # model's sparse onsets
    dk = dict(thred_onset=0.9, thred_offset=0.9, thred_mpe=0.9)

    srv = StreamServer(config, transcriber=tr)
    sids = [srv.open() for _ in range(N)]
    pump_times = []
    t0 = time.perf_counter()
    for i in range(0, wav.shape[0], chunk):
        for sid, w in zip(sids, wavs):
            srv.feed(sid, w[i : i + chunk])
        tb = time.perf_counter()
        srv.pump(**dk)
        dt = time.perf_counter() - tb
        if dt > 5e-3:                       # pumps that actually ran blocks
            pump_times.append(dt)
    # wall covers the live streaming loop only: the end-of-stream drain is
    # a one-off (its flush featurize shapes even compile fresh), not the
    # serving steady state
    wall = time.perf_counter() - t0
    for sid in sids:
        srv.close(sid)
    while srv.session_ids:
        srv.pump(**dk)

    pt = np.sort(np.asarray(pump_times)) * 1e3
    print(json.dumps({
        "metric": "stream_rtf_aggregate",
        "value": round(N * args.seconds / wall, 2),
        "unit": f"audio_sec/wall_sec ({N} concurrent streams)",
        "streams": N,
        "chunk_ms": args.chunk_ms,
        "pump_ms_p50": round(float(pt[len(pt) // 2]), 2),
        "pump_ms_p95": round(float(pt[int(len(pt) * 0.95)]), 2),
        "pumps_with_blocks": len(pump_times),
    }))


if __name__ == "__main__":
    main()
