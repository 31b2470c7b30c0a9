"""MAESTRO-geometry scale smoke: GB-scale corpus -> sharded training ->
eval, on one chip, with the tunnel journal fence active.

The reference's production recipe is 20 epochs x 4 train shards over
~200 h of audio (``corpus/EXE-CORPUS-MAESTRO.sh:48``,
``training/EXE-TRAINING-MAESTRO.sh:9``, ``make_dataset.py:36-38`` n_div=4).
This script exercises that *operational geometry* at the ~1 GB scale this
single-v5e environment can hold: synthesize hours of audio, write a
4-shard memmap corpus with separate valid/test splits, train epochs
through the real Trainer (shard reload each div, journal fence, orbax
checkpoints, plateau scheduler), and record the operational numbers the
toy tests never see:

* per-(epoch, div) wall time and its decomposition (shard reload vs step
  loop vs valid pass),
* steady-state step time vs the compute-only bench (input overlap),
* host RSS trajectory (memmap + journal fence => must plateau),
* checkpoint save time at paper scale.

Writes a JSON-lines log to stdout (tee to docs/scale_run.log).

Usage: python scripts/scale_smoke.py [--gb 1.0] [--epochs 2] [--model paper]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def log(event: str, **kw):
    print(json.dumps({"event": event, "t": round(time.time() - T0, 1),
                      "rss_mb": round(rss_mb(), 1), **kw}), flush=True)


T0 = time.time()


def build_corpus(args, cfg, out_dir):
    """Synthesize pieces and write the sharded memmap corpus."""
    from scripts.e2e_learning_proof import synth_piece

    from nylon_amt_tpu.data.corpus import assemble_split, write_manifest
    from nylon_amt_tpu.labels import note2label
    from nylon_amt_tpu.ops.mel import MelFrontend

    frontend = MelFrontend(cfg.feature)
    rng = np.random.default_rng(2024)

    # bytes/frame ~1.9 kB (256 f32 mel + 3x88 f32 labels + 88 int8 + bool);
    # a 20 s piece is ~1409 frames incl. inter-piece gap ~ 2.7 MB
    frames_per_piece = int(args.dur * cfg.feature.sr
                           / cfg.feature.hop_sample) + 160
    bytes_per_piece = frames_per_piece * 1910
    n_train = max(args.shards, int(args.gb * 1e9 / bytes_per_piece))
    n_train -= n_train % args.shards
    n_valid = max(4, n_train // 10)
    n_test = max(4, n_train // 20)
    log("corpus_plan", pieces_train=n_train, pieces_valid=n_valid,
        pieces_test=n_test, shards=args.shards,
        est_train_gb=round(n_train * bytes_per_piece / 1e9, 2))

    def make_pieces(n):
        pieces = []
        for _ in range(n):
            wav, notes = synth_piece(rng, dur=args.dur, n_notes=args.n_notes)
            feat = np.asarray(frontend(wav))
            labels = note2label(cfg, notes, nframe=feat.shape[0])
            pieces.append((feat, labels))
        return pieces

    per_shard = n_train // args.shards
    for shard in range(args.shards):
        t0 = time.time()
        pieces = make_pieces(per_shard)
        arrays = assemble_split(cfg, *zip(*pieces))
        arrays.save(out_dir, "train", shard)
        log("shard_written", shard=shard, pieces=per_shard,
            frames=int(arrays.feature.shape[0]),
            gb=round(arrays.feature.nbytes * 1.86 / 1e9, 3),
            wall_s=round(time.time() - t0, 1))
        del pieces, arrays
    for split, n in (("valid", n_valid), ("test", n_test)):
        pieces = make_pieces(n)
        arrays = assemble_split(cfg, *zip(*pieces))
        arrays.save(out_dir, split, 0)
        log("split_written", split=split, pieces=n)
        del pieces, arrays
    write_manifest(cfg, out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=1.0,
                    help="target train-split size in GB (4 shards)")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--n-notes", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n-slice", type=int, default=16,
                    help="window stride sampler (TrainConfig default 16)")
    ap.add_argument("--model", default="paper", choices=["paper", "small"],
                    help="paper = hid 256 / 3+3 (the production scale)")
    ap.add_argument("--corpus", default="/tmp/nylon_scale_corpus")
    ap.add_argument("--out", default="/tmp/nylon_scale_run")
    ap.add_argument("--reuse-corpus", action="store_true")
    args = ap.parse_args()

    import jax

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.data.corpus import SplitArrays
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.train.loop import Trainer
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    model = (ModelConfig.paper_scale() if args.model == "paper"
             else ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2,
                              dec_layer=2, enc_head=2, dec_head=2))
    model = dataclasses.replace(model, dropout=0.1,
                                compute_dtype="bfloat16")
    cfg = Config(model=model,
                 train=TrainConfig(epochs=args.epochs, batch_size=8,
                                   lr=1e-4, n_slice=args.n_slice,
                                   n_div_train=args.shards))
    log("start", backend=jax.default_backend(), model=args.model,
        epochs=args.epochs, shards=args.shards)

    if not (args.reuse_corpus
            and os.path.exists(os.path.join(args.corpus, "train_idx_000.npy"))):
        build_corpus(args, cfg, args.corpus)
    else:
        log("corpus_reused", path=args.corpus)

    reload_times = []

    def provider(split, div):
        t0 = time.time()
        arrays = SplitArrays.load(args.corpus, split,
                                  div if split == "train" else 0, mmap=True)
        ds = WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)
        dt = time.time() - t0
        reload_times.append((split, div, round(dt, 2)))
        log("shard_loaded", split=split, div=div, wall_s=round(dt, 2),
            windows=len(ds))
        return ds

    trainer = Trainer(cfg, args.out)
    t0 = time.time()
    state = trainer.fit(provider)
    train_wall = time.time() - t0
    perf = trainer.performance
    # per-div wall times are implicit in the datetime trail; recover them
    times = [time.mktime(time.strptime(d[:19], "%Y-%m-%dT%H:%M:%S"))
             for d in perf["datetime"]]
    div_walls = [round(b - a, 1) for a, b in zip(times, times[1:])]
    ds0 = provider("train", 0)
    steps_per_div = ds0.steps_per_epoch
    log("train_done", wall_s=round(train_wall, 1),
        loss_train=perf["loss_train"], loss_valid=perf["loss_valid"],
        div_walls_s=div_walls, steps_per_div=steps_per_div,
        shard_reloads=reload_times)

    # eval pass wall time (the reference's valid() over the test shard)
    t0 = time.time()
    ds_test = provider("test", 0)
    loss_test, n_batches = trainer.valid_epoch(state, ds_test)
    log("eval_done", wall_s=round(time.time() - t0, 1),
        loss_test=round(loss_test / max(n_batches, 1), 5),
        n_batches=n_batches)
    log("end")


if __name__ == "__main__":
    main()
