"""Head-to-head: a checkpoint trained HERE, served by the REFERENCE stack.

Closes the last indirection in the F1-parity chain: train the reduced-recipe
hFT on synthetic audio in this framework (TPU), export the checkpoint to the
reference's torch layout (``train/importer.py::save_reference_checkpoint``),
then run the reference's own inference stack — ``AMT.transcript`` chunk loop
+ ``AMT.mpe2note`` peak-picking decode (``/root/reference/hftt_code/model/
amt.py:66-118,179-344``) — on the held-out piece, and score BOTH outputs
with the same scorer. A reference user switching stacks in either direction
must see the same notes and the same F1.

Pass criteria (printed as one JSON line at the end):
  * posterior accuracy: our f32 posteriors are as close to a float64 torch
    oracle as the reference's own f32 path is (within 2x, floor 5e-4) — a
    fixed abs delta between the two f32 stacks is the wrong gate because a
    sharply-trained net amplifies f32 reassociation noise;
  * decode parity: identical note count, pitches, and onset order, F1 equal
    to 3 decimals;
  * absolute quality: onset F1 >= 0.75 on the held-out piece (same bar as
    ``scripts/e2e_learning_proof.py``).

Usage: python scripts/headtohead_reference.py [--epochs 60] [--pieces 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig

REFERENCE_PATH = os.environ.get("NYLON_REFERENCE_PATH", "/root/reference")


def reference_posteriors_f64(model, feat: np.ndarray, cfg: Config):
    """B-head posteriors from the torch model in float64 — the numerical
    oracle both f32 stacks are measured against. Same padding + 128-frame
    window loop as the reference ``AMT.transcript`` (``amt.py:66-118``),
    which hard-casts to float32 and so cannot produce this itself."""
    import copy

    import torch

    m64 = copy.deepcopy(model).double().eval()
    nf = cfg.input.num_frame
    pad_b = np.full((cfg.input.margin_b, cfg.feature.n_bins),
                    cfg.input.min_value)
    len_s = int(np.ceil(feat.shape[0] / nf) * nf) - feat.shape[0]
    pad_f = np.full((len_s + cfg.input.margin_f, cfg.feature.n_bins),
                    cfg.input.min_value)
    a_input = torch.from_numpy(
        np.concatenate([pad_b, feat.astype(np.float64), pad_f]))
    window = cfg.input.margin_b + nf + cfg.input.margin_f
    on, off, mpe = [], [], []
    with torch.no_grad():
        for i in range(0, feat.shape[0], nf):
            spec = a_input[i:i + window].T.unsqueeze(0)
            out = m64(spec)
            on.append(out[5].squeeze(0).numpy())
            off.append(out[6].squeeze(0).numpy())
            mpe.append(out[7].squeeze(0).numpy())
    return np.concatenate(on), np.concatenate(off), np.concatenate(mpe)


def reference_amt(cfg: Config, state_dict_path: str):
    """Build the reference AMT + Model_SPEC2MIDI (cpu) from an exported
    ``.dat`` checkpoint (``m_training.py:374-392`` format)."""
    import torch

    for mod in ("torchaudio", "pretty_midi"):  # unused at inference time
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.path.insert(0, os.path.join(REFERENCE_PATH, "hftt_code", "model"))
    try:
        import amt as ref_amt
        import model_spec2midi as ref_model
    finally:
        sys.path.pop(0)

    m = cfg.model
    encoder = ref_model.Encoder_SPEC2MIDI(
        cfg.input.margin_b, cfg.input.num_frame, cfg.feature.n_bins,
        m.cnn_channel, m.cnn_kernel, m.hid_dim, m.enc_layer, m.enc_head,
        m.pf_dim, m.dropout, "cpu")
    decoder = ref_model.Decoder_SPEC2MIDI(
        cfg.input.num_frame, cfg.feature.n_bins, cfg.midi.num_note,
        cfg.midi.num_velocity, m.hid_dim, m.dec_layer, m.dec_head, m.pf_dim,
        m.dropout, "cpu")
    model = ref_model.Model_SPEC2MIDI(encoder, decoder)
    ckpt = torch.load(state_dict_path, map_location="cpu", weights_only=False)
    model.load_state_dict({k: v for k, v in ckpt["model_dict"].items()})
    model.eval()

    config_dict = {
        "feature": {"sr": cfg.feature.sr, "hop_sample": cfg.feature.hop_sample,
                    "n_bins": cfg.feature.n_bins,
                    "log_offset": cfg.feature.log_offset},
        "input": {"margin_b": cfg.input.margin_b,
                  "margin_f": cfg.input.margin_f,
                  "num_frame": cfg.input.num_frame,
                  "min_value": cfg.input.min_value},
        "midi": {"num_note": cfg.midi.num_note,
                 "note_min": cfg.midi.note_min,
                 "num_velocity": cfg.midi.num_velocity},
    }
    a = ref_amt.AMT(config_dict, None)
    a.model = model
    a.device = "cpu"
    return a


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--pieces", type=int, default=16)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-notes", type=int, default=40,
                    help="notes per piece; match the proof run whose "
                         "checkpoint --out/--resume points at")
    ap.add_argument("--n-slice", type=int, default=4)
    ap.add_argument("--out", default="/tmp/nylon_headtohead")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend. TPU matmuls round operands "
                         "to bf16 even under f32 params (default matmul "
                         "precision), which floors posterior parity at ~1e-1; "
                         "run training on the TPU, then re-run with --resume "
                         "--cpu for the true-f32 comparison phase (fit() "
                         "returns the restored checkpoint instantly once all "
                         "epochs are complete).")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # The env's sitecustomize force-selects the TPU at startup; env vars
        # alone cannot override it (see .claude/skills/verify/SKILL.md).
        jax.config.update("jax_platforms", "cpu")

    from e2e_learning_proof import synth_piece
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.labels import note2label
    from nylon_amt_tpu.metrics.harness import score_notes
    from nylon_amt_tpu.ops.mel import MelFrontend
    from nylon_amt_tpu.train.importer import save_reference_checkpoint
    from nylon_amt_tpu.train.loop import Trainer

    print("backend:", jax.default_backend(), flush=True)
    cfg = Config(
        model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2, dec_layer=2,
                          enc_head=2, dec_head=2, dropout=0.1,
                          compute_dtype="bfloat16"),
        train=TrainConfig(epochs=args.epochs, batch_size=8, lr=args.lr,
                          n_slice=args.n_slice, plateau_patience=10_000),
    )
    rng = np.random.default_rng(42)
    frontend = MelFrontend(cfg.feature)

    t0 = time.time()
    train_pieces, valid_pieces = [], []
    for i in range(args.pieces + 2):
        wav, notes = synth_piece(rng, dur=args.dur, n_notes=args.n_notes)
        feat = np.asarray(frontend(wav))
        labels = note2label(cfg, notes, nframe=feat.shape[0])
        (train_pieces if i < args.pieces else valid_pieces).append(
            (feat, labels))
    test_wav, test_notes = synth_piece(rng, dur=args.dur,
                                       n_notes=args.n_notes)
    print(f"corpus built in {time.time() - t0:.0f}s", flush=True)

    train_arrays = assemble_split(cfg, *zip(*train_pieces))
    valid_arrays = assemble_split(cfg, *zip(*valid_pieces))

    def provider(split, div):
        arrays = train_arrays if split == "train" else valid_arrays
        return WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)

    trainer = Trainer(cfg, args.out)
    t0 = time.time()
    state = trainer.fit(provider, resume="auto" if args.resume else None)
    print(f"training took {time.time() - t0:.0f}s", flush=True)

    # Serve the BEST-valid checkpoint, the reference's ``best_model.pkl``
    # eval workflow (``m_training.py:394-420``; its inference CLI loads the
    # best model, not the last epoch). The 16-piece synthetic corpus overfits
    # hard after ~epoch 12 (valid 0.089 -> 0.29 by epoch 59); the final
    # state scores F1 ~0.05 on the held-out piece, the best ~0.8+.
    from nylon_amt_tpu.train.checkpoint import load_params

    try:
        params = load_params(trainer.ckpt.directory)
        print(f"serving best checkpoint (epoch {trainer.best_epoch} "
              f"div {trainer.best_div})", flush=True)
    except FileNotFoundError:
        params = state.params

    feat = np.asarray(frontend(test_wav))

    # --- our stack, f32 compute (the exported params are f32; comparing the
    # reference's f32 torch forward against our bf16 path would conflate
    # engine parity with precision) -------------------------------------
    cfg_f32 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    tr = Transcriber(cfg_f32, params=params, batch_windows=8)
    post = tr.transcript(feat)
    notes_ours = tr.mpe2note(post["onset_B"], post["offset_B"], post["mpe_B"],
                             post["velocity_B"], mode_velocity="org")
    s_ours = score_notes(test_notes, notes_ours, with_velocity=True)

    # --- export -> reference stack --------------------------------------
    export_path = os.path.join(args.out, "model_export.dat")
    save_reference_checkpoint(export_path, jax.device_get(params),
                              cfg.model.enc_layer, cfg.model.dec_layer)
    amt = reference_amt(cfg, export_path)
    ref_out = amt.transcript(feat)
    (r_on_A, r_off_A, r_mpe_A, r_vel_A,
     r_on_B, r_off_B, r_mpe_B, r_vel_B) = ref_out

    n = post["onset_B"].shape[0]
    post_delta = max(
        float(np.max(np.abs(post["onset_B"] - r_on_B[:n]))),
        float(np.max(np.abs(post["offset_B"] - r_off_B[:n]))),
        float(np.max(np.abs(post["mpe_B"] - r_mpe_B[:n]))),
    )
    vel_mismatch = int(np.sum(post["velocity_B"] != r_vel_B[:n]))

    # --- f64 oracle: is our f32 evaluation as accurate as the reference's
    # own? A sharply-trained net amplifies f32 reassociation noise (LN
    # rescaling, large attention logits) by orders of magnitude, so a fixed
    # abs gate on posteriors conflates conversion errors with conditioning.
    # Run the SAME torch weights in float64 over the same window loop and
    # measure both stacks' distance to it; ours must be within 2x the
    # reference f32 path's own error (floor 5e-4 for well-conditioned nets).
    oracle_on, oracle_off, oracle_mpe = reference_posteriors_f64(
        amt.model, feat, cfg)
    e_ref = max(
        float(np.max(np.abs(r_on_B[:n] - oracle_on[:n]))),
        float(np.max(np.abs(r_off_B[:n] - oracle_off[:n]))),
        float(np.max(np.abs(r_mpe_B[:n] - oracle_mpe[:n]))),
    )
    e_ours = max(
        float(np.max(np.abs(post["onset_B"] - oracle_on[:n]))),
        float(np.max(np.abs(post["offset_B"] - oracle_off[:n]))),
        float(np.max(np.abs(post["mpe_B"] - oracle_mpe[:n]))),
    )

    notes_ref = amt.mpe2note(r_on_B, r_off_B, r_mpe_B, r_vel_B,
                             mode_velocity="org")
    s_ref = score_notes(test_notes, notes_ref, with_velocity=True)

    same_notes = (
        len(notes_ours) == len(notes_ref)
        and all(a["pitch"] == b["pitch"]
                and abs(a["onset"] - b["onset"]) < 1e-3
                and abs(a["offset"] - b["offset"]) < 1e-3
                for a, b in zip(notes_ours, notes_ref)))

    result = {
        "f1_ours": round(s_ours["F-measure_no_offset"], 4),
        "f1_reference_stack": round(s_ref["F-measure_no_offset"], 4),
        "f1_velocity_ours": round(s_ours["F-measure_velocity"], 4),
        "f1_velocity_reference_stack": round(s_ref["F-measure_velocity"], 4),
        "precision_ours": round(s_ours["Precision_no_offset"], 4),
        "recall_ours": round(s_ours["Recall_no_offset"], 4),
        "n_notes_ours": len(notes_ours),
        "n_notes_reference_stack": len(notes_ref),
        "n_ref_notes": len(test_notes),
        "posterior_max_abs_delta": post_delta,
        "f32_err_vs_f64_oracle_reference": e_ref,
        "f32_err_vs_f64_oracle_ours": e_ours,
        "velocity_argmax_mismatches": vel_mismatch,
        "identical_note_stream": same_notes,
    }
    ok = (e_ours <= max(5e-4, 2.0 * e_ref)
          and same_notes
          and abs(result["f1_ours"] - result["f1_reference_stack"]) < 5e-4
          and result["f1_ours"] >= 0.75)
    result["pass"] = ok
    # Secondary soft gate: the relative f64-oracle gate above can loosen
    # arbitrarily if the reference's own f32 error e_ref grows, so make any
    # loosening past the historical fixed 5e-4 gate VISIBLE in the evidence
    # JSON rather than silently absorbed (round-2 advisor finding).
    result["posterior_delta_exceeds_legacy_5e-4_gate"] = post_delta > 5e-4
    if result["posterior_delta_exceeds_legacy_5e-4_gate"]:
        print(f"WARNING: posterior_max_abs_delta {post_delta:.3e} exceeds "
              f"the legacy fixed 5e-4 gate; passing only via the relative "
              f"oracle gate (e_ref={e_ref:.3e})", flush=True)
    print(json.dumps(result, indent=2))
    print("HEAD-TO-HEAD:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
