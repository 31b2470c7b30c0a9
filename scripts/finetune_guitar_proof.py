"""Classical-guitar fine-tune proof: piano warm start vs from-scratch.

The reference repo's declared end goal is transcribing **classical guitar**
by reusing the piano-trained hFT stack (reference ``README.md:1-37`` — train
on MAESTRO, move to nylon-string guitar; the repo never built the
fine-tuning step). This script demonstrates that workflow end-to-end on
synthetic audio:

1. synthesize a plucked-string (Karplus-Strong) guitar corpus — a real
   timbre shift from the sine-piano corpus of
   ``scripts/e2e_learning_proof.py`` (inharmonic attack noise, different
   partial decay, E2-B5 range). Every note is assigned a STRING (uniform
   among strings reaching the pitch at fret <= 12) and the synthesis gives
   each string a distinct timbre (thicker strings: darker excitation,
   longer ring), so string identity is audible rather than a function of
   pitch;
2. fine-tune the reduced-recipe hFT **with the learned string/fret tab
   head** (``ModelConfig.tab_head`` — BASELINE config 3) from a
   piano-trained checkpoint (``cli train --init-from`` semantics:
   pretrained params merged into a fresh TrainState, the new head keeps
   its fresh init) and, as the control, train the same architecture from
   scratch on the same guitar corpus for the same number of epochs;
3. transcribe a held-out guitar piece with both, score note-level F1, and
   score the tab head's string predictions on correctly-detected notes.

Pass criteria (one JSON line at the end): the fine-tuned model reaches
onset F1 >= 0.75 on the held-out piece AND beats the from-scratch control.
String accuracy is reported (vs the 6-way chance rate and the
lowest-fret-rule baseline) but not gated — it exercises BASELINE config 3's
"string+fret tab head for Alphatab export" end to end.

Usage:
  python scripts/finetune_guitar_proof.py --init-from /tmp/nylon_proof_r2 \
      [--pieces 24] [--epochs 12]
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
from nylon_amt_tpu.infer.tab import STANDARD_TUNING

MAX_FRET = 12
CORPUS_SEED = 7          # np.random.default_rng seed for corpus synthesis
SYNTH_VERSION = "v3"     # bump when synth_guitar_piece/tuning change
# Per-string physics, string 1 (high E) .. string 6 (low E): thicker strings
# ring longer and sound darker.
STRING_DECAY = (0.990, 0.992, 0.994, 0.9955, 0.9965, 0.9975)
STRING_DARKEN = (0, 1, 2, 3, 4, 5)       # smoothing passes on the excitation
# v3 additive-synthesis string signatures. The r4 KS darken/decay cue was
# too weak (learned string accuracy tied the lowest-fret rule); these make
# string identity unambiguous in a mel spectrum:
# * inharmonicity B (partial k at k*f0*sqrt(1+B k^2)) grows ~20x from the
#   high E to the wound low E — at k=8 the low strings' partials are
#   shifted by ~1/4 semitone, a full mel bin;
# * spectral rolloff (partial amplitude k^-rolloff) darkens thick strings;
# * per-partial decay rate scales with string damping.
STRING_INHARM = (2e-5, 4e-5, 8e-5, 1.6e-4, 2.7e-4, 4.0e-4)
STRING_ROLLOFF = (0.7, 0.9, 1.1, 1.35, 1.6, 1.9)
STRING_DAMP = (3.2, 2.9, 2.6, 2.2, 1.9, 1.6)   # amplitude e-folds per sec


def pluck_additive(rng, f0: float, n: int, sr: int, string: int,
                   n_partials: int = 14):
    """Inharmonic additive pluck with per-string inharmonicity, rolloff,
    and damping (see STRING_* tables)."""
    B = STRING_INHARM[string - 1]
    roll = STRING_ROLLOFF[string - 1]
    damp = STRING_DAMP[string - 1]
    t = np.arange(n) / sr
    wav = np.zeros(n)
    for k in range(1, n_partials + 1):
        fk = k * f0 * np.sqrt(1.0 + B * k * k)
        if fk > 0.45 * sr:
            break
        amp = k ** -roll * np.exp(-t * damp * (1 + 0.35 * (k - 1)))
        wav += amp * np.sin(2 * np.pi * fk * t + rng.uniform(0, 2 * np.pi))
    wav *= np.minimum(1.0, t / 0.004)          # 4 ms attack
    # brief pick transient, darker on thick strings
    burst = rng.uniform(-1, 1, min(n, int(0.006 * sr)))
    for _ in range(STRING_DARKEN[string - 1]):
        burst = 0.5 * (burst + np.roll(burst, 1))
    wav[:burst.size] += 0.6 * burst * np.linspace(1, 0, burst.size)
    return 0.5 * wav


def ks_pluck(rng, f0: float, n: int, sr: int, decay: float = 0.996,
             darken: int = 0):
    """Karplus-Strong plucked string: noise burst through a damped
    one-period feedback comb (blockwise-vectorized)."""
    # the averaging filter adds half a sample of delay: effective period is
    # p - 0.5 under the blockwise update below, so round to p + 0.5
    p = max(2, int(round(sr / f0 + 0.5)))
    buf = rng.uniform(-1.0, 1.0, p)
    for _ in range(darken):  # thicker string = darker excitation
        buf = 0.5 * (buf + np.roll(buf, 1))
    buf -= buf.mean()  # the comb's DC gain equals its f0 gain: a DC offset
    # in the excitation would ring for the whole note
    blocks = [buf]
    total = p
    while total < n:
        buf = decay * 0.5 * (buf + np.roll(buf, -1))
        blocks.append(buf)
        total += p
    return np.concatenate(blocks)[:n]


def feasible_strings(pitch: int, max_fret: int = MAX_FRET) -> list[int]:
    return [s for s, open_pitch in enumerate(STANDARD_TUNING, start=1)
            if 0 <= pitch - open_pitch <= max_fret]


def synth_guitar_piece(rng, sr=16000, dur=20.0, n_notes=40,
                       pitch_lo=40, pitch_hi=76):
    """Random guitar-range piece of Karplus-Strong plucks with per-note
    string assignment (uniform among feasible strings) and per-string
    timbre."""
    wav = np.zeros(int(dur * sr))
    notes = []
    onset = 0.2
    for _ in range(n_notes):
        pitch = int(rng.integers(pitch_lo, pitch_hi))
        feas = feasible_strings(pitch)
        if not feas:
            continue
        string = int(feas[rng.integers(len(feas))])
        length = float(rng.uniform(0.15, 0.5))
        vel = int(rng.integers(50, 110))
        f0 = 440.0 * 2 ** ((pitch - 69) / 12)
        i0 = int(onset * sr)
        n = min(int(length * sr), wav.size - i0)
        if n <= 0:
            break
        wav[i0:i0 + n] += (vel / 127.0) * pluck_additive(
            rng, f0, n, sr, string)
        notes.append({"pitch": pitch, "onset": round(onset, 4),
                      "offset": round(onset + n / sr, 4), "velocity": vel,
                      "string": string})
        onset += float(rng.uniform(0.18, 0.45))
        if onset > dur - 1.0:
            break
    return np.clip(wav, -1, 1).astype(np.float32), notes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--init-from", required=True,
                    help="piano-trained checkpoint dir (best ckpt is used), "
                         "e.g. the e2e_learning_proof.py --out dir")
    ap.add_argument("--pieces", type=int, default=24)
    ap.add_argument("--n-notes", type=int, default=40,
                    help="notes per synthesized piece (denser = more onset "
                         "examples per window; the piano proof needed 64)")
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--epochs-scratch", type=int, default=None,
                    help="epoch budget for the from-scratch control "
                         "(default: same as --epochs; set higher to "
                         "compensate the fine-tune arm's pretraining)")
    ap.add_argument("--lr-ft", type=float, default=3e-4)
    ap.add_argument("--lr-scratch", type=float, default=1e-3)
    ap.add_argument("--n-slice", type=int, default=4)
    ap.add_argument("--plateau-factor", type=float, default=0.5)
    ap.add_argument("--patience", type=int, default=2)
    ap.add_argument("--out", default="/tmp/nylon_guitar_ft")
    ap.add_argument("--skip-scratch", action="store_true",
                    help="only run the fine-tune arm")
    ap.add_argument("--skip-zero-shot", action="store_true",
                    help="skip scoring the init checkpoint unadapted (use "
                         "when warm-starting from a tab-head checkpoint, "
                         "where 'piano zero-shot' is not meaningful)")
    ap.add_argument("--corpus-cache", default="/tmp/guitar_corpus",
                    help="directory for cached featurized corpora "
                         "('' disables)")
    args = ap.parse_args()

    import jax

    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.infer.tab import annotate_strings, to_alphatex
    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.labels import note2label
    from nylon_amt_tpu.metrics.harness import score_notes
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.checkpoint import load_params, merge_params
    from nylon_amt_tpu.train.loop import Trainer
    from nylon_amt_tpu.train.step import create_train_state

    print("backend:", jax.default_backend(), flush=True)

    def cfg_with(lr: float, tab_head: bool = True,
                 epochs: int | None = None) -> Config:
        return Config(
            model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2,
                              dec_layer=2, enc_head=2, dec_head=2,
                              dropout=0.1, compute_dtype="bfloat16",
                              tab_head=tab_head),
            train=TrainConfig(epochs=epochs or args.epochs, batch_size=8,
                              lr=lr,
                              n_slice=args.n_slice,
                              plateau_patience=args.patience,
                              plateau_factor=args.plateau_factor),
        )

    cfg = cfg_with(args.lr_ft)
    rng = np.random.default_rng(CORPUS_SEED)
    frontend = MelFrontend(cfg.feature)

    t0 = time.time()
    cache_path = None
    if args.corpus_cache:
        os.makedirs(args.corpus_cache, exist_ok=True)
        # Key includes the RNG seed and a synthesis-version tag so a stale
        # cache can't silently substitute an old corpus after the synth
        # code or seed changes (round-2 advisor finding).
        cache_path = os.path.join(
            args.corpus_cache,
            f"p{args.pieces}_n{args.n_notes}_d{args.dur:g}"
            f"_s{CORPUS_SEED}_{SYNTH_VERSION}.npy")
    if cache_path and os.path.exists(cache_path):
        train_pieces, valid_pieces, test_wav, test_notes = np.load(
            cache_path, allow_pickle=True)
        print(f"guitar corpus loaded from cache {cache_path}", flush=True)
    else:
        train_pieces, valid_pieces = [], []
        for i in range(args.pieces + 2):
            wav, notes = synth_guitar_piece(rng, dur=args.dur,
                                            n_notes=args.n_notes)
            feat = np.asarray(frontend(wav))
            labels = note2label(cfg, notes, nframe=feat.shape[0],
                                strings=True)
            (train_pieces if i < args.pieces else valid_pieces).append(
                (feat, labels))
        test_wav, test_notes = synth_guitar_piece(rng, dur=args.dur,
                                                  n_notes=args.n_notes)
        if cache_path:
            np.save(cache_path, np.array(
                [train_pieces, valid_pieces, test_wav, test_notes],
                dtype=object))
        print(f"guitar corpus built in {time.time() - t0:.0f}s "
              f"({args.pieces}+2 pieces)", flush=True)

    train_arrays = assemble_split(cfg, *zip(*train_pieces))
    valid_arrays = assemble_split(cfg, *zip(*valid_pieces))

    def provider(split, div):
        arrays = train_arrays if split == "train" else valid_arrays
        return WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)

    test_feat = np.asarray(frontend(test_wav))

    def string_scores(est_notes: list[dict]) -> dict:
        """String accuracy of annotated est notes vs ground truth, over
        correctly-detected notes (same pitch, onset within 50 ms), plus the
        lowest-fret-rule baseline on the same matches."""
        matched = same = rule_same = 0
        by_pitch: dict[int, list[dict]] = {}
        for r in test_notes:
            by_pitch.setdefault(r["pitch"], []).append(r)
        for e in est_notes:
            cands = [r for r in by_pitch.get(e["pitch"], ())
                     if abs(r["onset"] - e["onset"]) <= 0.05]
            if not cands:
                continue
            r = min(cands, key=lambda r: abs(r["onset"] - e["onset"]))
            matched += 1
            if e.get("string") == r["string"]:
                same += 1
            feas = feasible_strings(r["pitch"])
            lowest = min(feas, key=lambda s: r["pitch"]
                         - STANDARD_TUNING[s - 1]) if feas else 0
            rule_same += int(lowest == r["string"])
        return {"matched": matched,
                "string_acc": round(same / matched, 4) if matched else 0.0,
                "lowest_fret_rule_acc":
                    round(rule_same / matched, 4) if matched else 0.0}

    def score(params, c: Config) -> dict:
        tr = Transcriber(c, params=params, batch_windows=8)
        post = tr.transcript(test_feat)
        notes = tr.mpe2note(post["onset_B"], post["offset_B"],
                            post["mpe_B"], post["velocity_B"],
                            mode_velocity="org")
        s = score_notes(test_notes, notes, with_velocity=False)
        r = {"est_notes": len(notes), "ref_notes": len(test_notes),
             "f1_no_offset": s["F-measure_no_offset"],
             "precision_no_offset": s["Precision_no_offset"],
             "recall_no_offset": s["Recall_no_offset"]}
        if "string_B" in post:
            annotated = annotate_strings(notes, post["string_B"], c)
            r.update(string_scores(annotated))
            # end-to-end Alphatab export from model-predicted strings
            r["alphatex_lines"] = len(to_alphatex(annotated).splitlines())
        return r

    def run(tag: str, lr: float, init_params=None,
            epochs: int | None = None) -> dict:
        c = cfg_with(lr, epochs=epochs)
        out = os.path.join(args.out, tag)
        state = None
        if init_params is not None:
            # cli.py train --init-from semantics: pretrained params merged
            # into a fresh TrainState (step 0, fresh optimizer/scheduler);
            # the tab head (absent from the piano checkpoint) keeps its
            # fresh initialization.
            state = create_train_state(c, jax.random.key(c.train.seed),
                                       batch_size=c.train.batch_size)
            state = state.replace(
                params=merge_params(state.params, init_params))
        trainer = Trainer(c, out)
        t0 = time.time()
        final = trainer.fit(provider, state=state)
        secs = time.time() - t0
        try:
            best = load_params(trainer.ckpt.directory)
            best_epoch = trainer.best_epoch
        except FileNotFoundError:
            best, best_epoch = final.params, None
        r = {"train_s": round(secs, 1), "best_epoch": best_epoch,
             "loss_first": trainer.performance["loss_train"][0],
             "loss_last": trainer.performance["loss_train"][-1],
             "final": score(final.params, c), "best": score(best, c)}
        r["f1"] = max(r["final"]["f1_no_offset"], r["best"]["f1_no_offset"])
        print(f"[{tag}] f1={r['f1']:.3f} ({secs:.0f}s)", flush=True)
        return r

    init_dir = args.init_from
    if os.path.isdir(os.path.join(init_dir, "checkpoints")):
        init_dir = os.path.join(init_dir, "checkpoints")
    piano_params = load_params(init_dir)  # host arrays: survive the
    # Trainer's tunnel journal-reset fences

    result = {}
    if not args.skip_zero_shot:
        # zero-shot first (cheap, and the unadapted baseline doesn't depend
        # on training): the piano checkpoint on guitar audio, no adaptation
        # (no tab head in the checkpoint, so score without one)
        result["zero_shot"] = score(piano_params, cfg_with(args.lr_ft,
                                                           tab_head=False))
        print(f"[zero-shot] f1={result['zero_shot']['f1_no_offset']:.3f}",
              flush=True)

    result["finetune"] = run("finetune", args.lr_ft, piano_params)

    if not args.skip_scratch:
        result["scratch"] = run("scratch", args.lr_scratch,
                                epochs=args.epochs_scratch)

    ft = result["finetune"]["f1"]
    sc = result.get("scratch", {}).get("f1", 0.0)
    result["pass"] = bool(ft >= 0.75 and ft > sc)
    print(json.dumps(result, indent=2))
    print("GUITAR FINETUNE PROOF:", "PASS" if result["pass"] else "FAIL")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
