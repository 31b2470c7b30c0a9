"""Discriminating probe: score a trained checkpoint on one of its own
TRAINING pieces.

The h2h/proof runs memorize the train split (train loss 0.26 -> 0.007) yet
score F1 ~0.05-0.16 on the held-out piece. Two incompatible explanations:

* pure small-data overfit -> a TRAIN piece should decode near-perfectly
  (the model has memorized its labels);
* a train/serve misalignment (window/frame offset between training labels
  and `Transcriber.transcript`, or a decode bug) -> TRAIN pieces score as
  badly as held-out ones, and generalization was never the problem.

Usage: python scripts/probe_trainpiece.py --ckpt-dir /tmp/nylon_headtohead/checkpoints \
           [--epoch 59] [--piece 0] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/nylon_headtohead/checkpoints")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--div", type=int, default=None)
    ap.add_argument("--pieces", type=int, default=16)
    ap.add_argument("--piece", type=int, default=0,
                    help="which corpus draw to score (0-based; train pieces "
                         "are draws 0..pieces-1, valid pieces the next two, "
                         "the held-out test piece the last)")
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from scripts.e2e_learning_proof import synth_piece

    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.metrics.harness import score_notes
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.checkpoint import load_params

    cfg = Config(
        model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                          enc_head=2, dec_head=2, dropout=0.1,
                          compute_dtype="float32" if args.cpu else "bfloat16"),
        train=TrainConfig(epochs=60, batch_size=8, lr=1e-3, n_slice=4))
    rng = np.random.default_rng(42)
    wav, notes = None, None
    for i in range(args.pieces + 3):
        w, n = synth_piece(rng, dur=args.dur)
        if i == args.piece:
            wav, notes = w, n
            break

    params = load_params(args.ckpt_dir, args.epoch, args.div)
    feat = np.asarray(MelFrontend(cfg.feature)(wav))
    tr = Transcriber(cfg, params=params, batch_windows=8)
    post = tr.transcript(feat)
    est = tr.mpe2note(post["onset_B"], post["offset_B"], post["mpe_B"],
                      post["velocity_B"], mode_velocity="org")
    s = score_notes(notes, est, with_velocity=False)

    # Raw posterior diagnostics at the labeled onset cells: how confident is
    # the model exactly where the training labels put the onsets?
    hop_sec = cfg.feature.hop_sample / cfg.feature.sr
    at_label = []
    for n in notes:
        f = int(round(n["onset"] / hop_sec))
        p = int(n["pitch"]) - cfg.midi.note_min
        if 0 <= f < post["onset_B"].shape[0] and 0 <= p < 88:
            at_label.append(float(post["onset_B"][f, p]))
    print(json.dumps({
        "piece": args.piece,
        "role": ("train" if args.piece < args.pieces
                 else "valid" if args.piece < args.pieces + 2 else "test"),
        "est_notes": len(est), "ref_notes": len(notes),
        "f1_no_offset": round(s["F-measure_no_offset"], 4),
        "precision": round(s["Precision_no_offset"], 4),
        "recall": round(s["Recall_no_offset"], 4),
        "onset_posterior_at_labels_mean": round(float(np.mean(at_label)), 4),
        "onset_posterior_at_labels_p90": round(
            float(np.percentile(at_label, 90)), 4),
        "onset_posterior_global_max": round(float(post["onset_B"].max()), 4),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
