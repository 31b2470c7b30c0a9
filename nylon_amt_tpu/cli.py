"""Command-line interface.

Subcommands replace the reference's EXE shell pipelines
(``EXE-CORPUS-*.sh`` / ``EXE-TRAINING-*.sh`` / ``EXE-EVALUATION-*.sh``):

* ``corpus``     — WAV+MIDI pairs -> features, labels, windowable split arrays
* ``train``      — the MAESTRO training recipe on TPU (DP mesh optional)
* ``transcribe`` — WAV -> posteriors -> note events -> MIDI (+ JSON)
* ``evaluate``   — note-level and frame-level scoring vs reference MIDI
* ``serve``      — streaming transcription: PCM on stdin (or a simulated
  file stream) -> note events as JSON lines, bounded latency

Run ``python -m nylon_amt_tpu.cli <cmd> --help`` for flags.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _load_config(path: str | None):
    from nylon_amt_tpu.config import Config

    return Config.load(path) if path else Config()


# ---------------------------------------------------------------- corpus ----

def cmd_corpus(args) -> int:
    from nylon_amt_tpu.config import Config
    from nylon_amt_tpu.data.corpus import build_corpus_split, write_manifest
    from nylon_amt_tpu.data.lists import CorpusList, make_list_maestro, make_list_maps
    from nylon_amt_tpu.labels import midi2note, note2label
    from nylon_amt_tpu.ops.mel import get_frontend
    from nylon_amt_tpu.utils.wavio import load_mono

    config = _load_config(args.config)
    if args.maestro_csv:
        cl = make_list_maestro(args.maestro_csv, args.root or
                               os.path.dirname(args.maestro_csv))
    elif args.maps_root:
        cl = make_list_maps(args.maps_root)
    else:
        cl = CorpusList.load(args.lists)
    os.makedirs(args.out, exist_ok=True)
    cl.save(os.path.join(args.out, "lists"))

    frontend = get_frontend(config.feature)
    n_div = {"train": args.n_div_train, "valid": args.n_div_valid,
             "test": args.n_div_test}
    for split in ("train", "valid", "test"):
        entries = cl.entries[split]
        if args.limit:
            entries = entries[: args.limit]
        pieces = []
        for name, wav_path, midi_path in entries:
            print(f"[{split}] {name}: {wav_path}", file=sys.stderr)
            feat = np.asarray(frontend(load_mono(wav_path, config.feature.sr)))
            notes = midi2note(config, midi_path)
            labels = note2label(config, notes,
                                offset_duration_tolerance_flag=args.offset_duration_tolerance)
            if args.per_file:
                # per-piece archives (the fixed equivalent of the reference's
                # broken top-level dataset_creation.py nylon path)
                d = os.path.join(args.out, "per_file")
                os.makedirs(d, exist_ok=True)
                np.savez_compressed(os.path.join(d, name + ".npz"),
                                    feature=feat, **labels)
            if args.refs and split in ("valid", "test"):
                # mir_eval-compatible reference txts for external tooling
                # (EXE-CORPUS-MAESTRO.sh:43-45 runs conv_note2ref.py for the
                # valid and test splits only)
                from nylon_amt_tpu.labels.note2ref import write_note_refs

                d = os.path.join(args.out, "ref")
                os.makedirs(d, exist_ok=True)
                write_note_refs(notes, os.path.join(d, name))
            pieces.append((feat, labels))
        if pieces and not args.per_file:
            build_corpus_split(config, pieces, args.out, split,
                               n_div=n_div[split])
    write_manifest(config, args.out)
    print(f"corpus written to {args.out}")
    return 0


# ----------------------------------------------------------------- train ----

def cmd_train(args) -> int:
    import dataclasses

    from nylon_amt_tpu.data.corpus import SplitArrays
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.parallel.mesh import make_mesh
    from nylon_amt_tpu.train.loop import Trainer

    config = _load_config(args.config)
    overrides = {}
    for f in ("epochs", "batch_size", "lr", "n_slice", "seed",
              "keep_checkpoints"):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = v
    if overrides:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, **overrides))
    if args.remat:
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, remat=True))

    if args.multihost or args.coordinator:
        # Multi-host (e.g. v5e-16 = 4 hosts x 4 chips): every process runs
        # this same command; on a TPU pod slice all coordinates are
        # auto-detected, elsewhere pass --coordinator/--num-processes/
        # --process-id explicitly.
        from nylon_amt_tpu.parallel.distributed import initialize

        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import jax

    mesh = None
    if args.n_data or args.n_model > 1 or jax.process_count() > 1:
        mesh = make_mesh(n_data=args.n_data, n_model=args.n_model)

    t = config.train

    def provider(split: str, div: int):
        n_div = {"train": t.n_div_train, "valid": t.n_div_valid,
                 "test": t.n_div_test}[split]
        shard = div if n_div > 1 else None
        arrays = SplitArrays.load(args.dataset, split, shard=shard)
        return WindowDataset(arrays, config, n_slice=t.n_slice)

    metrics_fn = None
    if args.test_metrics:
        from nylon_amt_tpu.train.metrics import make_note_metrics_fn

        metrics_fn = make_note_metrics_fn(config)

    state = None
    if args.init_from:
        # Warm start (fine-tune): load pretrained params into a FRESH
        # TrainState (step 0, fresh optimizer/scheduler) — the workflow the
        # reference's long-term goal implies (train on MAESTRO piano,
        # fine-tune on nylon guitar; README.md:1-37) but never built.
        # Distinct from --resume, which restores the full training state.
        from nylon_amt_tpu.train.step import create_train_state

        state = create_train_state(config, jax.random.key(config.train.seed),
                                   batch_size=config.train.batch_size)
        if args.init_from.endswith((".pkl", ".dat")):
            from nylon_amt_tpu.train.importer import load_reference_checkpoint

            params = load_reference_checkpoint(args.init_from,
                                               config.model.enc_layer,
                                               config.model.dec_layer)
        else:
            from nylon_amt_tpu.train.checkpoint import load_params

            params = load_params(args.init_from, args.init_epoch,
                                 args.init_div)
        # Subset warm start: the checkpoint may lack heads this config adds
        # (e.g. a piano checkpoint into a tab_head guitar model) — shared
        # parameters load, new heads keep their fresh init.
        from nylon_amt_tpu.train.checkpoint import merge_params

        try:
            params = merge_params(state.params, params)
        except (KeyError, ValueError) as e:
            raise SystemExit(
                f"--init-from {args.init_from}: parameter tree does not "
                f"match this config's architecture ({e})")
        state = state.replace(params=params)

    trainer = Trainer(config, args.out, mesh=mesh)
    resume = ("auto" if args.resume_auto
              else tuple(args.resume) if args.resume else None)
    import contextlib

    ctx = contextlib.nullcontext()
    if args.trace:
        from nylon_amt_tpu.utils.profiling import trace

        ctx = trace(args.trace)
    with ctx:
        trainer.fit(provider, state=state, resume=resume,
                    metrics_fn=metrics_fn, valid_test=args.valid_test)
    print(f"training done; best valid loss {trainer.best_loss_valid:.5f} "
          f"(epoch {trainer.best_epoch} div {trainer.best_div})")
    return 0


# ------------------------------------------------------------ transcribe ----

def _load_params(args, config):
    if args.checkpoint.endswith((".pkl", ".dat")):
        from nylon_amt_tpu.train.importer import load_reference_checkpoint

        return load_reference_checkpoint(args.checkpoint,
                                         config.model.enc_layer,
                                         config.model.dec_layer)
    from nylon_amt_tpu.train.checkpoint import load_params

    return load_params(args.checkpoint, args.epoch, args.div)


def cmd_transcribe(args) -> int:
    from nylon_amt_tpu.infer.transcribe import Transcriber
    from nylon_amt_tpu.midi.smf import write_notes

    config = _load_config(args.config)
    params = _load_params(args, config)
    mesh = None
    if getattr(args, "n_data", None) and args.n_data > 1:
        from nylon_amt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.n_data)
    tr = Transcriber(config, params=params, batch_windows=args.batch_windows,
                     mesh=mesh,
                     precision="int8" if getattr(args, "int8", False)
                     else None)

    wavs = list(args.wav or [])
    if args.list:
        # Corpus-driven batch mode: iterate a lists dir the way the
        # reference's EXE-EVALUATION-MAESTRO.sh feeds m_inference.py.
        from nylon_amt_tpu.data.lists import CorpusList

        cl = CorpusList.load(args.list)
        wavs += [w for _, w, _ in cl.entries[args.split]]
    if not wavs:
        print("transcribe: no input (--wav or --list required)",
              file=sys.stderr)
        return 2

    # Head families, reference naming: stage-1 "A" heads -> _1st, stage-2
    # "B" heads -> _2nd; single mode emits only _1st
    # (m_inference.py:142-165).
    families = ([("1st", "A"), ("2nd", "B")] if args.mode == "combination"
                else [("1st", "A")])

    for wav in wavs:
        feature = tr.wav2feature(wav)
        if args.stride >= 0:
            post = tr.transcript_stride(feature, args.stride, mode=args.mode)
        else:
            post = tr.transcript(feature, mode=args.mode)
        stem = os.path.splitext(os.path.basename(wav))[0]
        out_dir = args.out or os.path.dirname(wav) or "."
        os.makedirs(out_dir, exist_ok=True)
        notes = []
        for suffix, fam in families:
            notes = tr.mpe2note(
                post[f"onset_{fam}"], post[f"offset_{fam}"],
                post[f"mpe_{fam}"], post[f"velocity_{fam}"],
                thred_onset=args.thred_onset, thred_offset=args.thred_offset,
                thred_mpe=args.thred_mpe, mode_offset=args.mode_offset)
            with open(os.path.join(out_dir, f"{stem}_{suffix}.notes.json"),
                      "w") as f:
                json.dump(notes, f, indent=2)
        # MIDI from the last-decoded family (B in combination — the
        # stronger head per the hFT paper; A in single mode).
        write_notes(os.path.join(out_dir, stem + ".mid"), notes)
        with open(os.path.join(out_dir, stem + ".notes.json"), "w") as f:
            json.dump(notes, f, indent=2)
        if args.tab:
            from nylon_amt_tpu.infer.tab import annotate_strings, write_alphatex

            tab_notes = notes
            if args.tab_head and "string_B" in post:
                # Learned tab head (ModelConfig.tab_head), opt-in: on the
                # measured guitar proof corpus it has not yet beaten the
                # greedy lowest-fret rule (docs/guitar_run.log: 0.55 vs
                # 0.60), so the default export uses the heuristic;
                # infeasible head cells fall back to the greedy assignment
                # inside write_alphatex either way.
                tab_notes = annotate_strings(notes, post["string_B"], config)
            write_alphatex(tab_notes,
                           os.path.join(out_dir, stem + ".alphatex"),
                           title=stem)
        if args.sheet:
            from nylon_amt_tpu.infer.sheet import write_musicxml

            write_musicxml(notes, os.path.join(out_dir, stem + ".musicxml"),
                           title=stem)
        if args.save_posteriors:
            np.savez_compressed(os.path.join(out_dir, stem + ".post.npz"),
                                **post)
        print(f"{wav}: {len(notes)} notes -> {out_dir}/{stem}.mid")
    return 0


# ----------------------------------------------------------------- serve ----

def cmd_serve(args) -> int:
    """Streaming transcription service (the reference has no serving path).

    Reads audio as signed-16-bit little-endian PCM at the config sample rate
    from stdin (or simulates a stream from ``--wav``), feeds it to the
    :class:`StreamingTranscriber` in ``--chunk-ms`` chunks, and prints each
    note event as one JSON line the moment it becomes stable (guaranteed
    not to change with more audio). A final flush emits the tail; ``--midi``
    additionally writes the full result as a MIDI file.
    """
    from nylon_amt_tpu.infer.stream import StreamingTranscriber

    config = _load_config(args.config)
    params = _load_params(args, config)
    st = StreamingTranscriber(config, params=params,
                              batch_windows=args.batch_windows)
    sr = config.feature.sr
    chunk = max(1, int(sr * args.chunk_ms / 1000))
    all_notes: list[dict] = []

    def emit(notes) -> None:
        for n in notes:
            all_notes.append(n)
            print(json.dumps(n), flush=True)

    # pop_stable_notes decodes a bounded tail and prunes consumed
    # posteriors, so the service runs in O(1) memory on endless streams
    if args.wav:
        from nylon_amt_tpu.utils.wavio import load_mono

        wav = load_mono(args.wav, sr)
        for i in range(0, wav.shape[0], chunk):
            if st.feed(wav[i : i + chunk]):
                emit(st.pop_stable_notes())
    else:
        while True:
            data = sys.stdin.buffer.read(chunk * 2)
            if not data:
                break
            samples = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
            if st.feed(samples):
                emit(st.pop_stable_notes())
    st.flush()
    emit(st.pop_stable_notes(final=True))
    if args.midi:
        from nylon_amt_tpu.midi.smf import write_notes

        write_notes(args.midi, sorted(
            sorted(all_notes, key=lambda x: x["pitch"]),
            key=lambda x: x["onset"]))
    print(f"# {len(all_notes)} notes, latency {st.latency_seconds:.2f}s",
          file=sys.stderr)
    return 0


# ------------------------------------------------------------------ export ----

def cmd_export(args) -> int:
    """Orbax checkpoint -> reference-format .dat (torch state_dict), so a
    model trained here can be loaded back into the PyTorch reference."""
    from nylon_amt_tpu.train.checkpoint import load_params
    from nylon_amt_tpu.train.importer import save_reference_checkpoint

    config = _load_config(args.config)
    params = load_params(args.checkpoint, args.epoch, args.div)
    save_reference_checkpoint(args.out, params, config.model.enc_layer,
                              config.model.dec_layer,
                              enc_alg=config.model.enc_alg,
                              dec_alg=config.model.dec_alg)
    print(f"exported {args.checkpoint} -> {args.out}")
    return 0


# -------------------------------------------------------------- evaluate ----

def cmd_evaluate(args) -> int:
    from nylon_amt_tpu.labels import midi2note
    from nylon_amt_tpu.metrics.harness import (
        aggregate,
        score_frames,
        score_mpe_posteriors,
        score_notes,
    )

    config = _load_config(args.config)
    pairs = list(args.pair or [])
    if args.list:
        # Corpus-driven batch mode, the EXE-EVALUATION-MAESTRO.sh flow:
        # pair every split entry's reference MIDI with the transcription
        # artifact `cli transcribe --list` wrote for it.
        from nylon_amt_tpu.data.lists import CorpusList

        cl = CorpusList.load(args.list)
        for _, wav, midi in cl.entries[args.split]:
            stem = os.path.splitext(os.path.basename(wav))[0]
            est = os.path.join(args.est_dir or ".", stem + args.suffix)
            pairs.append(f"{midi}:{est}")
    if not pairs:
        print("evaluate: no input (--pair or --list required)",
              file=sys.stderr)
        return 2
    per_file_notes, per_file_frames = {}, {}
    per_file_mpe = {}
    for pair in pairs:
        ref_path, est_path = pair.split(":")
        ref_notes = midi2note(config, ref_path)
        if est_path.endswith(".npz"):
            # thresholded-MPE-posterior frame scoring (reference m_mpe.py path)
            post = np.load(est_path)
            fam = "B" if "mpe_B" in post else "A"
            per_file_mpe[os.path.basename(est_path)] = score_mpe_posteriors(
                ref_notes, post[f"mpe_{fam}"],
                fps=config.feature.frames_per_sec,
                note_min=config.midi.note_min,
                num_note=config.midi.num_note)
            continue
        if est_path.endswith(".json"):
            with open(est_path) as f:
                est_notes = json.load(f)
        else:
            est_notes = midi2note(config, est_path)
        name = os.path.basename(est_path)
        per_file_notes[name] = score_notes(ref_notes, est_notes)
        per_file_frames[name] = score_frames(
            ref_notes, est_notes, fps=config.feature.frames_per_sec,
            note_min=config.midi.note_min, num_note=config.midi.num_note)

    result = {"note": {"per_file": per_file_notes,
                       "mean": aggregate(per_file_notes)},
              "frame": {"per_file": per_file_frames,
                        "mean": aggregate(per_file_frames)}}
    if per_file_mpe:
        result["mpe_posterior"] = {"per_file": per_file_mpe,
                                   "mean": aggregate(per_file_mpe)}
    text = json.dumps(result, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 0


# ----------------------------------------------------------------- parser ---

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nylon_amt_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("corpus", help="build a windowable training corpus")
    c.add_argument("--config")
    c.add_argument("--maestro-csv", help="maestro-v3.0.0.csv path")
    c.add_argument("--maps-root", help="MAPS dataset root")
    c.add_argument("--lists", help="directory with {split}.tsv lists")
    c.add_argument("--root", help="dataset root for relative csv paths")
    c.add_argument("--out", required=True)
    c.add_argument("--n-div-train", type=int, default=1)
    c.add_argument("--n-div-valid", type=int, default=1)
    c.add_argument("--n-div-test", type=int, default=1)
    c.add_argument("--limit", type=int, help="first N files per split (smoke)")
    c.add_argument("--offset-duration-tolerance", action="store_true")
    c.add_argument("--per-file", action="store_true",
                   help="write per-piece archives instead of split arrays")
    c.add_argument("--refs", action="store_true",
                   help="also write mir_eval reference txts for valid/test "
                        "(conv_note2ref.py equivalents) under OUT/ref/")
    c.set_defaults(fn=cmd_corpus)

    t = sub.add_parser("train", help="train the hFT model")
    t.add_argument("--config")
    t.add_argument("--dataset", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--epochs", type=int)
    t.add_argument("--batch-size", type=int)
    t.add_argument("--lr", type=float)
    t.add_argument("--n-slice", type=int)
    t.add_argument("--seed", type=int)
    resume_group = t.add_mutually_exclusive_group()
    resume_group.add_argument("--resume", nargs=2, type=int,
                              metavar=("EPOCH", "DIV"))
    resume_group.add_argument("--resume-auto", action="store_true",
                              help="resume from the newest checkpoint on disk "
                                   "(crash/preemption recovery)")
    t.add_argument("--init-from",
                   help="warm-start (fine-tune) from pretrained params: an "
                        "orbax checkpoint dir or a reference .pkl/.dat. "
                        "Fresh optimizer/scheduler/epoch counters — unlike "
                        "--resume, which restores full training state and "
                        "takes precedence if a checkpoint exists")
    t.add_argument("--init-epoch", type=int,
                   help="with --init-from DIR: pick this (epoch, div)")
    t.add_argument("--init-div", type=int)
    t.add_argument("--keep-checkpoints", type=int,
                   help="retain only the best + newest K checkpoints")
    t.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/decoder activations in the "
                        "backward pass (gradient checkpointing)")
    t.add_argument("--trace",
                   help="capture a JAX profiler trace of the run to this "
                        "dir (TensorBoard/Perfetto); intended for short "
                        "profiling runs")
    t.add_argument("--n-data", type=int, help="data-parallel mesh size")
    t.add_argument("--n-model", type=int, default=1, help="TP mesh size")
    t.add_argument("--multihost", action="store_true",
                   help="initialize multi-host execution (auto-detected "
                        "coordinates on a TPU pod slice)")
    t.add_argument("--coordinator", help="coordinator address host:port "
                                         "(manual multi-host rigs)")
    t.add_argument("--num-processes", type=int)
    t.add_argument("--process-id", type=int)
    t.add_argument("--test-metrics", action="store_true",
                   help="run the final test pass with note P/R/F1")
    t.add_argument("--valid-test", action="store_true",
                   help="also compute the test-split loss every (epoch, div) "
                        "(reference -valid_test)")
    t.set_defaults(fn=cmd_train)

    r = sub.add_parser("transcribe", help="WAV -> MIDI")
    r.add_argument("--config")
    r.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir, or reference .pkl/.dat")
    r.add_argument("--epoch", type=int)
    r.add_argument("--div", type=int)
    r.add_argument("--wav", nargs="+")
    r.add_argument("--list", help="lists dir (from `corpus`); transcribe "
                                  "every file of --split (batch mode)")
    r.add_argument("--split", default="test",
                   choices=["train", "valid", "test"])
    r.add_argument("--out")
    r.add_argument("--mode", choices=["combination", "single"],
                   default="combination")
    r.add_argument("--stride", type=int, default=-1,
                   help="center-crop offset for half-window stride mode")
    r.add_argument("--batch-windows", type=int, default=8)
    r.add_argument("--n-data", type=int,
                   help="shard each window batch over an n-chip data mesh")
    r.add_argument("--thred-onset", type=float, default=0.5)
    r.add_argument("--thred-offset", type=float, default=0.5)
    r.add_argument("--thred-mpe", type=float, default=0.5)
    r.add_argument("--mode-offset", default="shorter",
                   choices=["shorter", "longer", "offset"])
    r.add_argument("--save-posteriors", action="store_true")
    r.add_argument("--tab", action="store_true",
                   help="also export guitar tablature (alphaTex)")
    r.add_argument("--tab-head", action="store_true",
                   help="string assignment from the learned tab head "
                        "(ModelConfig.tab_head) instead of the default "
                        "lowest-fret heuristic; experimental — the head "
                        "has not yet beaten the heuristic on the guitar "
                        "proof corpus (docs/guitar_run.log)")
    r.add_argument("--sheet", action="store_true",
                   help="also export sheet music (MusicXML)")
    r.add_argument("--int8", action="store_true",
                   help="experimental W8A8 quantized engine (measured "
                        "SLOWER than bf16 on v5e — the engine is "
                        "bandwidth-bound, not MXU-bound; see PERF.md)")
    r.set_defaults(fn=cmd_transcribe)

    v = sub.add_parser("serve", help="streaming transcription (PCM stdin or "
                                     "simulated --wav stream) -> note JSONL")
    v.add_argument("--config")
    v.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir, or reference .pkl/.dat")
    v.add_argument("--epoch", type=int)
    v.add_argument("--div", type=int)
    v.add_argument("--wav", help="simulate streaming from a WAV file "
                                 "(default: s16le PCM on stdin)")
    v.add_argument("--chunk-ms", type=float, default=500.0)
    v.add_argument("--batch-windows", type=int, default=1)
    v.add_argument("--midi", help="also write the final MIDI here")
    v.set_defaults(fn=cmd_serve)

    x = sub.add_parser("export", help="orbax checkpoint -> reference-format "
                                      ".dat (torch state_dict)")
    x.add_argument("--config")
    x.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    x.add_argument("--epoch", type=int)
    x.add_argument("--div", type=int)
    x.add_argument("--out", required=True, help="output .dat path")
    x.set_defaults(fn=cmd_export)

    e = sub.add_parser("evaluate", help="score estimated vs reference notes")
    e.add_argument("--config")
    e.add_argument("--pair", nargs="+",
                   metavar="REF.mid:EST.{mid,json,post.npz}")
    e.add_argument("--list", help="lists dir (from `corpus`): score every "
                                  "file of --split against --est-dir "
                                  "artifacts (batch mode)")
    e.add_argument("--split", default="test",
                   choices=["train", "valid", "test"])
    e.add_argument("--est-dir",
                   help="directory of `transcribe` outputs (with --list)")
    e.add_argument("--suffix", default=".notes.json",
                   help="estimate filename suffix per wav stem (e.g. "
                        "'_1st.notes.json' for the A heads)")
    e.add_argument("--out")
    e.set_defaults(fn=cmd_evaluate)
    return p


def main(argv: list[str] | None = None) -> int:
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
