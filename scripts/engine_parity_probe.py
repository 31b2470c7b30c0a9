"""Quantify fused-engine vs flax-XLA posterior agreement on trained params.

Loads a checkpoint from the e2e proof run, runs the same feature windows
through (a) the fused-layer inference engine and (b) the flax model with
attention_impl='xla', and reports logit/posterior deltas and the number of
threshold crossings (cells where the two sides land on opposite sides of
0.5) — the quantity that actually moves note-level F1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/nylon_e2e_proof/checkpoints")
    ap.add_argument("--epoch", type=int, default=24)
    ap.add_argument("--div", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scripts.e2e_learning_proof import synth_piece

    from nylon_amt_tpu.infer import engine
    from nylon_amt_tpu.models.hft import build_model
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.checkpoint import load_params

    cfg = Config(model=ModelConfig(
        hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2, enc_head=2,
        dec_head=2, dropout=0.1, compute_dtype="bfloat16"))
    params = load_params(args.ckpt_dir, args.epoch, args.div)

    rng = np.random.default_rng(42)
    for _ in range(18):
        synth_piece(rng, dur=20.0)
    test_wav, _ = synth_piece(rng, dur=20.0)
    feat = np.asarray(MelFrontend(cfg.feature)(test_wav))

    # one batch of 8 windows from the middle of the piece
    nb, wf = cfg.feature.n_bins, cfg.window_frames
    starts = np.arange(8) * 64
    spec = jnp.asarray(np.stack([feat[s:s + wf].T for s in starts]))

    out_e = engine.forward(params, spec, cfg)

    cfg_x = Config(model=ModelConfig(
        hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2, enc_head=2,
        dec_head=2, dropout=0.1, compute_dtype="bfloat16",
        attention_impl="xla"))
    model = build_model(cfg_x)
    out_x = model.apply({"params": params}, spec, deterministic=True)

    rep = {"backend": jax.default_backend()}
    for k in ["onset_B", "offset_B", "mpe_B", "onset_A"]:
        a = np.asarray(out_e[k], np.float32)
        b = np.asarray(out_x[k], np.float32)
        pa, pb = 1 / (1 + np.exp(-a)), 1 / (1 + np.exp(-b))
        rep[k] = {
            "max_abs_logit_diff": round(float(np.max(np.abs(a - b))), 4),
            "mean_abs_logit_diff": round(float(np.mean(np.abs(a - b))), 5),
            "threshold_flips": int(np.sum((pa >= 0.5) != (pb >= 0.5))),
            "cells_above_thresh_engine": int(np.sum(pa >= 0.5)),
            "cells_above_thresh_xla": int(np.sum(pb >= 0.5)),
        }
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
