"""Bisect the long-run host-memory leak (OOM after ~27k train steps).

A 60-epoch head-to-head run grew to 118 GB RSS (~4 MB/step — one batch's
host staging per step) and was OOM-killed. This probe isolates which stage
retains host memory, printing RSS every ``--every`` steps for each mode:

  put        — device_put of fresh numpy batches only (no compute)
  put-reuse  — device_put of the SAME preallocated numpy buffers each step
               (fresh data np.copyto'd in); tests per-source-buffer retention
  put-del    — like put, but explicitly .delete()s the previous device batch
               before transferring the next; tests deferred-deletion pinning
  step       — train_step on ONE device-resident batch (no transfers)
  full       — the production path: gather -> prefetch thread -> device_put ->
               train_step (what the Trainer runs)

Usage: python scripts/probe_leak.py --mode full --steps 600
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["put", "put-reuse", "put-del", "step", "full"],
                    default="full")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--every", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reset-every", type=int, default=0, metavar="N",
                    help="full mode: carry state across a transfer-journal "
                         "reset every N steps (utils/tunnel.py) — the "
                         "production mitigation; RSS should stay flat")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.train.step import create_train_state, make_train_step
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # head-to-head scale (the run that OOMed)
    cfg = Config(
        model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                          enc_head=2, dec_head=2, dropout=0.1,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=args.batch, n_slice=4))
    B = args.batch
    nf, nb, nn = cfg.input.num_frame, cfg.feature.n_bins, cfg.midi.num_note
    wf = cfg.window_frames
    rng = np.random.default_rng(0)

    def fresh_batch():
        return {
            "spec": rng.standard_normal((B, nb, wf)).astype(np.float32),
            "onset": rng.random((B, nf, nn)).astype(np.float32),
            "offset": rng.random((B, nf, nn)).astype(np.float32),
            "mpe": (rng.random((B, nf, nn)) > 0.9).astype(np.float32),
            "velocity": rng.integers(0, 127, (B, nf, nn)).astype(np.int32),
            "valid": np.ones((B,), np.float32),
        }

    print(f"backend={jax.default_backend()} mode={args.mode}", flush=True)
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)
    step = make_train_step(cfg)
    key = jax.random.key(1)

    base = None
    t0 = time.time()
    if args.mode in ("put", "put-reuse", "put-del"):
        staging = fresh_batch() if args.mode == "put-reuse" else None
        last = None
        for i in range(args.steps):
            nxt = fresh_batch()
            if args.mode == "put-reuse":
                for k in staging:
                    np.copyto(staging[k], nxt[k])
                nxt = staging
            if args.mode == "put-del" and last is not None:
                jax.block_until_ready(last)
                for v in last.values():
                    v.delete()
            last = jax.device_put(nxt)
            if (i + 1) % args.every == 0:
                jax.block_until_ready(last)
                r = rss_mb()
                base = base or r
                print(f"{i+1:6d} rss {r:9.1f} MB (+{r-base:8.1f})", flush=True)
        del last
    elif args.mode == "step":
        batch = jax.device_put(fresh_batch())
        losses = []
        for i in range(args.steps):
            state, metrics = step(state, batch, key)
            losses.append(metrics["loss"])
            if (i + 1) % args.every == 0:
                float(jax.device_get(losses[-1]))
                losses.clear()
                r = rss_mb()
                base = base or r
                print(f"{i+1:6d} rss {r:9.1f} MB (+{r-base:8.1f})", flush=True)
    else:  # full — the Trainer.train_epoch shape
        from nylon_amt_tpu.data.prefetch import prefetch
        from nylon_amt_tpu.utils.tunnel import (
            journal_reset_supported,
            reset_transfer_journal,
        )

        if args.reset_every:
            print("journal reset supported:", journal_reset_supported(),
                  flush=True)

        def gen(n):
            for _ in range(n):
                yield fresh_batch()

        losses, i = [], 0
        remaining = args.steps
        chunk = args.reset_every or args.steps
        while remaining > 0:
            n = min(chunk, remaining)
            remaining -= n
            for batch in prefetch(gen(n), transfer=jax.device_put):
                state, metrics = step(state, batch, key)
                losses.append(metrics["loss"])
                i += 1
                if i % args.every == 0:
                    float(jax.device_get(losses[-1]))
                    losses.clear()
                    r = rss_mb()
                    base = base or r
                    print(f"{i:6d} rss {r:9.1f} MB (+{r-base:8.1f})",
                          flush=True)
            if args.reset_every and remaining > 0:
                if losses:
                    float(jax.device_get(losses[-1]))
                    losses.clear()
                state, key = reset_transfer_journal((state, key))
    print(f"done in {time.time()-t0:.0f}s; final rss {rss_mb():.1f} MB",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
