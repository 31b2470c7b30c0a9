"""End-to-end learning proof on synthetic audio.

Generates a synthetic corpus, trains the reduced-recipe hFT on it (the
reference README's scale: hid 64 / pf 128 / 2+2 layers — ``README.md:8-12``),
transcribes a HELD-OUT SET of pieces, and scores note-level P/R/F1
(±offset, ±velocity), per piece and corpus mean, against the ground truth.

Two corpus styles:
* ``--style rich`` (default): the round-5 instrument — MIDI-driven pieces
  with CC64 sustain spans, same-pitch re-onsets, chords (polyphony to
  ~8-13), full velocity spread, and a mid-piece tempo change, generated
  through the real SMF writer -> ``midi2note`` -> synthesis path
  (``scripts/proof_corpus.py``). Built so a well-trained reduced model
  scores clearly below 1.0 — the instrument can detect regressions.
* ``--style legacy``: the round-4 sparse monophonic generator (which the
  trained model saturates at F1 1.0).

Training length matters: with ~0.3% positive onset cells, the model spends
the first ~1k steps in an all-negative plateau before carving out confident
onsets (measured: at-label posterior 0.002 at step 400 -> 0.78 at step 3k on
a fixed batch). 40 epochs (~9k varied steps) clears it comfortably.

Usage: python scripts/e2e_learning_proof.py [--epochs 40] [--pieces 24]
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


def synth_piece(rng, sr=16000, dur=20.0, n_notes=40, pitch_lo=48, pitch_hi=84):
    """Random monophonic-ish piece with decaying-harmonic tones."""
    t_all = np.arange(int(dur * sr)) / sr
    wav = np.zeros_like(t_all)
    notes = []
    onset = 0.2
    for _ in range(n_notes):
        pitch = int(rng.integers(pitch_lo, pitch_hi))
        length = float(rng.uniform(0.15, 0.5))
        vel = int(rng.integers(50, 110))
        f0 = 440.0 * 2 ** ((pitch - 69) / 12)
        seg = (t_all >= onset) & (t_all < onset + length)
        t = t_all[seg] - onset
        amp = (vel / 127.0) * 0.4 * np.exp(-t * 4.0)
        tone = np.sin(2 * np.pi * f0 * t) + 0.4 * np.sin(4 * np.pi * f0 * t) \
            + 0.15 * np.sin(6 * np.pi * f0 * t)
        wav[seg] += amp * tone
        notes.append({"pitch": pitch, "onset": round(onset, 4),
                      "offset": round(onset + length, 4), "velocity": vel})
        onset += float(rng.uniform(0.18, 0.45))
        if onset > dur - 1.0:
            break
    return np.clip(wav, -1, 1).astype(np.float32), notes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--pieces", type=int, default=16)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-slice", type=int, default=4)
    ap.add_argument("--patience", type=int, default=10_000,
                    help="plateau-scheduler patience (epochs); the default "
                         "effectively disables lr decay")
    ap.add_argument("--plateau-factor", type=float, default=0.1,
                    help="plateau lr-decay factor (torch default 0.1; 0.5 "
                         "gives the gentle staircase that stabilizes the "
                         "constant-lr 1e-3 recipe, whose train loss climbs "
                         "again after ~15 epochs at 96 pieces)")
    ap.add_argument("--attention-impl", default="auto",
                    choices=["auto", "pallas", "xla"],
                    help="'xla' forces the flax/autodiff training path "
                         "(reference semantics, nn.Dropout) — the A/B "
                         "control for the fused custom-VJP kernels")
    ap.add_argument("--n-notes", type=int, default=40,
                    help="notes per synthetic piece (40 fills only ~13 s of "
                         "a 20 s piece; 64 fills it, denser supervision per "
                         "corpus frame)")
    ap.add_argument("--style", default="rich", choices=["rich", "legacy"])
    ap.add_argument("--held-out", type=int, default=8,
                    help="number of held-out test pieces (per-piece and "
                         "mean scores are reported)")
    ap.add_argument("--pass-f1", type=float, default=0.70,
                    help="PASS threshold on mean held-out onset F1")
    ap.add_argument("--out", default="/tmp/nylon_e2e_proof")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the newest checkpoint in --out "
                         "(crash recovery for interrupted proof runs)")
    ap.add_argument("--init-from", default=None,
                    help="warm-start params from this checkpoint dir's best "
                         "(fresh optimizer/scheduler — scaling up the "
                         "corpus without retraining from scratch)")
    args = ap.parse_args()

    import jax

    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.labels import note2label
    from nylon_amt_tpu.metrics.harness import score_notes
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.loop import Trainer

    print("backend:", jax.default_backend(), flush=True)
    from nylon_amt_tpu.models import fused_train
    from nylon_amt_tpu.models.hft import resolve_attention_impl
    from nylon_amt_tpu.ops.attention import on_tpu
    cfg = Config(
        model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                          enc_head=2, dec_head=2, dropout=0.1,
                          compute_dtype="bfloat16",
                          attention_impl=args.attention_impl),
        # constant lr by default: the plateau scheduler watches the total
        # valid loss, which the (hard) velocity/offset heads dominate — it
        # can kill the lr while onset learning is still mid-breakout
        train=TrainConfig(epochs=args.epochs, batch_size=8, lr=args.lr,
                          n_slice=args.n_slice,
                          plateau_patience=args.patience,
                          plateau_factor=args.plateau_factor),
    )
    fused = (fused_train.supports(cfg) and on_tpu()
             and resolve_attention_impl(cfg.model.attention_impl) == "pallas")
    print(f"train path: {'fused-pallas' if fused else 'flax-autodiff'} "
          f"(attention_impl={args.attention_impl}, "
          f"patience={args.patience})", flush=True)
    rng = np.random.default_rng(42)
    frontend = MelFrontend(cfg.feature)

    def make_piece(i):
        if args.style == "rich":
            import proof_corpus

            os.makedirs(os.path.join(args.out, "midi"), exist_ok=True)
            return proof_corpus.synth_rich_piece(
                rng, cfg, os.path.join(args.out, "midi", f"piece_{i:03d}.mid"),
                dur=args.dur)
        return synth_piece(rng, dur=args.dur, n_notes=args.n_notes)

    t0 = time.time()
    train_pieces, valid_pieces = [], []
    for i in range(args.pieces + 2):
        wav, notes = make_piece(i)
        feat = np.asarray(frontend(wav))
        labels = note2label(cfg, notes, nframe=feat.shape[0])
        (train_pieces if i < args.pieces else valid_pieces).append(
            (feat, labels))
    # held-out test pieces (never trained or validated on)
    test_set = [make_piece(10_000 + j) for j in range(args.held_out)]
    print(f"corpus built in {time.time() - t0:.0f}s "
          f"(style={args.style}, {args.pieces} train / 2 valid / "
          f"{args.held_out} held-out)", flush=True)

    train_arrays = assemble_split(cfg, *zip(*train_pieces))
    valid_arrays = assemble_split(cfg, *zip(*valid_pieces))

    def provider(split, div):
        arrays = train_arrays if split == "train" else valid_arrays
        return WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)

    state = None
    if args.init_from:
        from nylon_amt_tpu.train.checkpoint import load_params, merge_params
        from nylon_amt_tpu.train.step import create_train_state

        init_dir = args.init_from
        if os.path.isdir(os.path.join(init_dir, "checkpoints")):
            init_dir = os.path.join(init_dir, "checkpoints")
        state = create_train_state(cfg, jax.random.key(cfg.train.seed),
                                   batch_size=cfg.train.batch_size)
        state = state.replace(
            params=merge_params(state.params, load_params(init_dir)))
        print(f"warm start from {init_dir}", flush=True)

    trainer = Trainer(cfg, args.out)
    t0 = time.time()
    state = trainer.fit(provider, state=state,
                        resume="auto" if args.resume else None)
    print(f"training took {time.time() - t0:.0f}s; "
          f"losses {trainer.performance['loss_train'][:2]} ... "
          f"{trainer.performance['loss_train'][-2:]}", flush=True)

    test_feats = [np.asarray(frontend(w)) for w, _ in test_set]

    def score(params):
        tr = Transcriber(cfg, params=params, batch_windows=8)
        pieces = []
        for feat, (_, ref_notes) in zip(test_feats, test_set):
            post = tr.transcript(feat)
            # mode_velocity='org': velocity classification needs far more
            # data than onset detection (class 0 dominates 99.7% of cells);
            # the default ignore_zero mode would drop every detected note
            # at this corpus scale.
            notes = tr.mpe2note(post["onset_B"], post["offset_B"],
                                post["mpe_B"], post["velocity_B"],
                                mode_velocity="org")
            s = score_notes(ref_notes, notes, with_velocity=True)
            pieces.append({
                "est_notes": len(notes), "ref_notes": len(ref_notes),
                "f1_no_offset": s["F-measure_no_offset"],
                "precision_no_offset": s["Precision_no_offset"],
                "recall_no_offset": s["Recall_no_offset"],
                "f1_with_offset": s["F-measure"],
                # velocity-aware F1 (m_transcription.py:119-123 semantics):
                # onset+pitch+velocity re-match, mir_eval tolerance 0.1.
                "f1_velocity": s["F-measure_velocity"],
                "precision_velocity": s["Precision_velocity"],
                "recall_velocity": s["Recall_velocity"],
            })
        mean = {k: round(float(np.mean([p[k] for p in pieces])), 4)
                for k in pieces[0] if k.startswith(("f1", "precision",
                                                    "recall"))}
        return {"mean": mean, "per_piece": pieces}

    # Score both the final state (the reference's end-of-training test pass,
    # m_training.py:441-471) and the best-valid checkpoint (the reference's
    # best_model.pkl eval workflow, m_training.py:394-420).
    result = {"final": score(state.params)}
    try:
        from nylon_amt_tpu.train.checkpoint import load_params

        result["best"] = score(load_params(trainer.ckpt.directory))
        result["best_epoch"] = trainer.best_epoch
    except FileNotFoundError:
        pass
    result["loss_first"] = trainer.performance["loss_train"][0]
    result["loss_last"] = trainer.performance["loss_train"][-1]
    result["style"] = args.style
    print(json.dumps(result, indent=2))
    ok = max(result["final"]["mean"]["f1_no_offset"],
             result.get("best", {}).get("mean", {}).get("f1_no_offset", 0.0)
             ) >= args.pass_f1
    print("LEARNING PROOF:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
