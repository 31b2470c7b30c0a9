"""A/B: fused custom-VJP train path vs flax autodiff path on the same
synthetic corpus — isolates whether the in-kernel hash-mask dropout changes
generalization dynamics (valid-loss trajectory) vs flax ``nn.Dropout``.

Usage: python scripts/ab_dropout_paths.py [--epochs 12] [--pieces 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--pieces", type=int, default=12)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--which", choices=["fused", "flax", "both"],
                    default="both")
    args = ap.parse_args()

    from scripts.e2e_learning_proof import synth_piece

    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.labels import note2label
    from nylon_amt_tpu.ops.mel import MelFrontend

    base = dict(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                enc_head=2, dec_head=2, dropout=0.1,
                compute_dtype="bfloat16")
    cfg0 = Config(model=ModelConfig(**base),
                  train=TrainConfig(epochs=args.epochs, batch_size=8,
                                    lr=1e-3, n_slice=4,
                                    plateau_patience=10_000))
    rng = np.random.default_rng(42)
    frontend = MelFrontend(cfg0.feature)
    train_pieces, valid_pieces = [], []
    for i in range(args.pieces + 2):
        wav, notes = synth_piece(rng, dur=args.dur)
        feat = np.asarray(frontend(wav))
        labels = note2label(cfg0, notes, nframe=feat.shape[0])
        (train_pieces if i < args.pieces else valid_pieces).append(
            (feat, labels))
    train_arrays = assemble_split(cfg0, *zip(*train_pieces))
    valid_arrays = assemble_split(cfg0, *zip(*valid_pieces))
    print("corpus ready", flush=True)

    results = {}
    which = ["fused", "flax"] if args.which == "both" else [args.which]
    for name in which:
        from nylon_amt_tpu.train.loop import Trainer

        impl = "pallas" if name == "fused" else "xla"
        cfg = Config(model=ModelConfig(**base, attention_impl=impl),
                     train=cfg0.train)

        def provider(split, div):
            arrays = train_arrays if split == "train" else valid_arrays
            return WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)

        out = f"/tmp/ab_dropout_{name}"
        os.system(f"rm -rf {out}")
        tr = Trainer(cfg, out)
        t0 = time.time()
        tr.fit(provider)
        results[name] = {
            "train": [round(v, 5) for v in tr.performance["loss_train"]],
            "valid": [round(v, 5) for v in tr.performance["loss_valid"]],
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
