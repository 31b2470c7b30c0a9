"""Score a saved checkpoint from the e2e proof run against the held-out
synthetic piece (regenerated deterministically with the proof's seed)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/nylon_e2e_proof/checkpoints")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--div", type=int, default=None)
    ap.add_argument("--pieces", type=int, default=16)
    ap.add_argument("--dur", type=float, default=20.0)
    args = ap.parse_args()

    from scripts.e2e_learning_proof import synth_piece

    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.metrics.harness import score_notes
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.checkpoint import load_params

    cfg = Config(
        model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                          enc_head=2, dec_head=2, dropout=0.1,
                          compute_dtype="bfloat16"),
        train=TrainConfig(epochs=60, batch_size=8, lr=1e-3, n_slice=4))
    rng = np.random.default_rng(42)
    # burn the same draws as the proof: pieces+2 corpus pieces, then test
    for _ in range(args.pieces + 2):
        synth_piece(rng, dur=args.dur)
    test_wav, test_notes = synth_piece(rng, dur=args.dur)

    params = load_params(args.ckpt_dir, args.epoch, args.div)
    frontend = MelFrontend(cfg.feature)
    feat = np.asarray(frontend(test_wav))
    tr = Transcriber(cfg, params=params, batch_windows=8)
    post = tr.transcript(feat)
    notes = tr.mpe2note(post["onset_B"], post["offset_B"], post["mpe_B"],
                        post["velocity_B"], mode_velocity="org")
    scores = score_notes(test_notes, notes, with_velocity=False)
    print(json.dumps({
        "epoch": args.epoch, "est": len(notes), "ref": len(test_notes),
        "f1_no_offset": scores["F-measure_no_offset"],
        "precision": scores["Precision_no_offset"],
        "recall": scores["Recall_no_offset"]}, indent=2))


if __name__ == "__main__":
    main()
