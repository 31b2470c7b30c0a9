"""The training loop (reference ``m_training.py:300-477`` flow).

Per (epoch, div): train over the shard -> validate -> checkpoint + best
tracking -> append ``performance.json`` -> plateau-scheduler step on the
validation loss. After all epochs, an optional test pass computes note-level
P/R/F1 (the reference's ``valid(..., metrics=True)`` — ``train.py:178-251``).

TPU specifics: the step is jitted once and reused across shards (static
shapes via batch padding); the host gather + H2D enqueue run on a
background prefetch thread two batches deep (``data/prefetch.py``), so
input feeding overlaps device compute; under a mesh, batches are sharded
on the data axis and XLA reduces gradients over ICI.
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import signal
import time
from typing import Callable

import jax
import numpy as np

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.data.prefetch import prefetch
from nylon_amt_tpu.utils.tunnel import (
    journal_reset_supported,
    reset_transfer_journal,
)
from nylon_amt_tpu.data.windows import WindowDataset
from nylon_amt_tpu.parallel.distributed import is_coordinator
from nylon_amt_tpu.parallel.mesh import (
    MODEL_AXIS,
    replicate_state,
    shard_batch,
    shard_params,
)
from nylon_amt_tpu.train.checkpoint import CheckpointManager, rng_state_to_json
from nylon_amt_tpu.train.plateau import ReduceLROnPlateau
from nylon_amt_tpu.train.step import (
    TrainState,
    create_train_state,
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from nylon_amt_tpu.utils.logging import get_logger

log = get_logger(__name__)

DatasetProvider = Callable[[str, int], WindowDataset]


class Trainer:
    """Orchestrates the (epoch, div) training schedule."""

    def __init__(self, config: Config, out_dir: str, mesh=None):
        self.config = config
        self.out_dir = out_dir
        self.mesh = mesh
        os.makedirs(out_dir, exist_ok=True)
        self.ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        self.train_step = make_train_step(config, mesh=mesh)
        self.eval_step = make_eval_step(config, mesh=mesh)
        self.scheduler = ReduceLROnPlateau(
            lr=config.train.lr, factor=config.train.plateau_factor,
            patience=config.train.plateau_patience)
        self.performance = {"loss_train": [], "loss_valid": [],
                            "datetime": [], "lr": []}
        self.best_loss_valid = float("inf")
        self.best_epoch = -1
        self.best_div = -1
        self._preempt_requested = False
        # split-arrays id -> DeviceWindowDataset (corpus uploaded once,
        # reused across the epoch x div schedule). Insertion order = LRU
        # order; _wrap_ds evicts least-recently-used splits when the
        # AGGREGATE cached bytes would exceed the global HBM budget (the
        # per-split gate alone would let a multi-div corpus pin
        # n_div x 4 GB and exceed the v5e's 16 GB mid-run).
        self._dev_cache: dict = {}
        self._dev_cache_bytes = 0
        self._epoch_scan = None   # lazy jitted device-side epoch executor
        self._SCAN_CHUNK = 512    # steps per dispatch (see _train_epoch_scan)

    # -- preemption / failure handling ----------------------------------------
    #
    # The reference's only recovery is a manual -resume_epoch/-resume_div
    # restart (m_training.py:47-48,264-299). Production TPU slices are
    # preemptible: ``fit`` installs SIGTERM/SIGUSR1 handlers so an eviction
    # notice checkpoints the live state at the next batch boundary and exits
    # cleanly; ``fit(resume="auto")`` then continues from it, re-running the
    # interrupted shard (the checkpoint is tagged "preempted" so resume does
    # not skip past it).

    def request_preemption(self) -> None:
        """Ask the running fit() to checkpoint and exit at the next safe
        point. Safe to call from a signal handler or another thread."""
        self._preempt_requested = True

    @contextlib.contextmanager
    def _preemption_guard(self):
        def handler(signum, frame):
            log.warning("signal %d: checkpointing at next batch boundary",
                        signum)
            self.request_preemption()

        previous = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                previous[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread: rely on
                pass                       # request_preemption()
        try:
            yield
        finally:
            for sig, old in previous.items():
                # A previous handler installed from C reports as None and
                # cannot be re-installed through signal.signal.
                signal.signal(sig, old if old is not None else signal.SIG_DFL)

    # -- single-shard epochs -------------------------------------------------

    def _put(self, batch: dict) -> dict:
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def _wrap_ds(self, ds):
        """Promote a host WindowDataset to the device-resident sampler when
        the split fits in HBM (single-process, non-CPU — see
        ``data/device_windows.py``); identity otherwise. Cached so the
        corpus uploads once per split, not once per (epoch, div)."""
        if self.mesh is not None:
            return ds
        from nylon_amt_tpu.data.device_windows import (DeviceWindowDataset,
                                                       as_device_dataset,
                                                       device_dataset_budget,
                                                       split_nbytes)

        arrays = getattr(ds, "arrays", None)
        if arrays is None:
            return ds
        key = id(arrays)
        cached = self._dev_cache.get(key)
        if cached is not None and cached.arrays is arrays:
            cached.idx = ds.idx
            self._dev_cache[key] = self._dev_cache.pop(key)   # LRU touch
            return cached
        budget = device_dataset_budget()
        nbytes = split_nbytes(arrays)
        while self._dev_cache and self._dev_cache_bytes + nbytes > budget:
            old_key, old = next(iter(self._dev_cache.items()))
            del self._dev_cache[old_key]
            self._dev_cache_bytes -= old.cached_nbytes
            old.delete()   # evicted splits re-upload on their next wrap
        dev = as_device_dataset(ds, self.config)
        if isinstance(dev, DeviceWindowDataset):
            self._dev_cache[key] = dev
            self._dev_cache_bytes += dev.cached_nbytes
        return dev

    def train_epoch(self, state: TrainState, ds: WindowDataset,
                    rng: np.random.Generator,
                    dropout_rng: jax.Array) -> tuple[TrainState, float]:
        bs = self.config.train.batch_size
        from nylon_amt_tpu.data.device_windows import DeviceWindowDataset

        if (isinstance(ds, DeviceWindowDataset) and self.mesh is None
                and jax.process_count() == 1
                and state.batch_stats is None
                and not self._preempt_requested):
            return self._train_epoch_scan(state, ds, rng, dropout_rng)
        losses, n = [], 0
        # Keep per-step losses as device scalars and fetch once per epoch:
        # a host sync every step serializes the async dispatch pipeline
        # (measured 217 ms/step vs 26 ms/step raw through the TPU tunnel).
        # The gather + device_put run on the prefetch thread, 2 batches
        # ahead, overlapping device compute.
        batches = prefetch(
            ds.batches(bs, shuffle=True, rng=rng, pad_to_batch=True,
                       process_index=jax.process_index(),
                       process_count=jax.process_count()),
            transfer=self._put)
        for batch in batches:
            if self._preempt_requested:
                batches.close()
                break
            state, metrics = self.train_step(state, batch, dropout_rng)
            losses.append(metrics["loss"])
            n += 1
        total = float(np.sum(jax.device_get(losses))) if losses else 0.0
        return state, total / max(n, 1)

    def _train_epoch_scan(self, state: TrainState, ds,
                          rng: np.random.Generator,
                          dropout_rng: jax.Array) -> tuple[TrainState, float]:
        """Device-side epoch: one jitted lax.scan over every step, window
        gathers in-graph (``train/step.py::make_epoch_scan``). Selected for
        device-resident splits on a single process without a mesh. Replays
        the host path's exact shuffle/padding/rng semantics, so the two
        paths produce the same training trajectory. Preemption granularity
        is the epoch here (the scan cannot be interrupted mid-flight); the
        signal handler's request is honored at the next epoch boundary.
        """
        from nylon_amt_tpu.train.step import make_epoch_scan

        bs = self.config.train.batch_size
        if len(ds.idx) == 0:
            return state, 0.0
        ds.ensure_resident()
        if self._epoch_scan is None:
            # any instance's gather works: it closes over config window
            # geometry only; the split arrays are an explicit argument
            self._epoch_scan = make_epoch_scan(self.config, ds._gather_dev)
        order = np.arange(len(ds.idx))
        rng.shuffle(order)
        n_full, tail = divmod(len(order), bs)
        valid = np.ones(len(order), np.float32)
        if tail:
            pad = np.resize(order[n_full * bs:], bs)
            order = np.concatenate([order[:n_full * bs], pad])
            valid = np.concatenate([valid[:n_full * bs],
                                    (np.arange(bs) < tail).astype(np.float32)])
        starts = ds.idx[order].astype(np.int32).reshape(-1, bs)
        valid = valid.reshape(-1, bs)
        # Bounded dispatches: ONE scan over a 3750-step epoch is a ~100 s
        # device execution, which the tunnel's worker does not survive
        # (reproducibly "TPU worker process crashed or restarted"); chunks
        # of _SCAN_CHUNK steps keep each dispatch ~15 s while retaining
        # the scan path's amortization. The tail chunk (a second trace)
        # reuses the same jitted fn at its own length.
        out_losses = []
        n_steps = starts.shape[0]
        for lo in range(0, n_steps, self._SCAN_CHUNK):
            if self._preempt_requested:
                # Honor preemption at chunk (~15 s) granularity; the caller
                # saves the pre-shard checkpoint and re-runs this shard.
                break
            hi = min(lo + self._SCAN_CHUNK, n_steps)
            state, losses = self._epoch_scan(
                state, ds._dev, jax.numpy.asarray(starts[lo:hi]),
                jax.numpy.asarray(valid[lo:hi]), dropout_rng)
            out_losses.append(losses)
        if not out_losses:
            return state, 0.0
        losses = np.concatenate(
            [np.asarray(jax.device_get(l), np.float64) for l in out_losses])
        return state, float(losses.sum() / max(len(losses), 1))

    def valid_epoch(self, state: TrainState, ds: WindowDataset) -> tuple[float, int]:
        bs = self.config.train.batch_size
        losses, n = [], 0
        for batch in prefetch(ds.batches(bs, shuffle=False,
                                         pad_to_batch=True,
                                         process_index=jax.process_index(),
                                         process_count=jax.process_count()),
                              transfer=self._put):
            metrics = self.eval_step(state, batch)
            losses.append(metrics["loss"])
            n += 1
        total = float(np.sum(jax.device_get(losses))) if losses else 0.0
        return total, n

    # -- full fit -------------------------------------------------------------

    def fit(
        self,
        provider: DatasetProvider,
        state: TrainState | None = None,
        resume: tuple[int, int] | None = None,
        metrics_fn: Callable | None = None,
        valid_test: bool = False,
    ) -> TrainState:
        """Run the (epoch, div) schedule.

        ``valid_test=True`` additionally computes the test-split loss after
        every (epoch, div) and records it in ``performance["loss_test"]``
        (the reference ablation trainer's ``-valid_test`` option —
        ``m_training_ablation.py:449-492``).
        """
        cfg = self.config
        t = cfg.train
        self._preempt_requested = False
        rng = np.random.default_rng(t.seed)
        dropout_rng = jax.random.key(t.seed)

        if jax.process_count() > 1:
            if self.mesh is None:
                raise ValueError("multi-process training requires a mesh")
            if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
                raise NotImplementedError(
                    "TP across hosts is not supported (DP-only multi-host; "
                    "the model is far too small to split over DCN)")
        if state is None:
            state = create_train_state(cfg, jax.random.key(t.seed),
                                       batch_size=t.batch_size)
        if self.mesh is not None:
            if jax.process_count() > 1:
                # Multi-host: every leaf becomes a global replicated array.
                state = replicate_state(state, self.mesh)
            else:
                state = state.replace(
                    params=shard_params(state.params, self.mesh))

        self._write_manifest(state)

        epoch_start, div_start = 0, 0
        if resume == "auto":
            # Crash recovery: resume from the newest checkpoint on disk (the
            # reference only supports manual -resume_epoch/-resume_div).
            resume = self.latest_checkpoint()
            if resume is not None:
                log.info("auto-resume from epoch %d div %d", *resume)
        if resume is not None:
            state, host = self.ckpt.restore(*resume, state)
            self.scheduler.load_state_dict(host["scheduler"])
            self.best_loss_valid = host["best_loss_valid"]
            self.best_epoch, self.best_div = host["best_epoch"], host["best_div"]
            self.performance = host["performance"]
            rng.bit_generator.state = host["np_rng"]
            epoch_start, div_start = resume
            if not host.get("preempted", False):
                # A completed (epoch, div): continue after it. A preempted
                # checkpoint re-runs its interrupted shard instead.
                div_start += 1
                if div_start >= t.n_div_train:
                    epoch_start += 1
                    div_start = 0

        valid_shards = [self._wrap_ds(provider("valid", d))
                        for d in range(t.n_div_valid)]
        test_shards = ([self._wrap_ds(provider("test", d))
                        for d in range(t.n_div_test)]
                       if valid_test else None)

        with self._preemption_guard():
            state = self._fit_loop(provider, state, rng, dropout_rng,
                                   valid_shards, epoch_start, div_start,
                                   test_shards)

        if metrics_fn is not None and not self._preempt_requested:
            test_shards = [self._wrap_ds(provider("test", d))
                           for d in range(t.n_div_test)]
            results = metrics_fn(state, test_shards)
            if is_coordinator():
                with open(os.path.join(self.out_dir,
                                       "test_performance.json"), "w",
                          encoding="utf-8") as f:
                    json.dump(results, f, indent=4)
        return state

    def _fit_loop(self, provider, state, rng, dropout_rng, valid_shards,
                  epoch_start, div_start, test_shards=None):
        t = self.config.train
        for epoch in range(epoch_start, t.epochs):
            for div in range(div_start, t.n_div_train):
                tic = time.time()
                # Snapshot pre-shard state + shuffle RNG: a preemption saves
                # THESE, so resume replays the interrupted shard exactly once
                # with the same shuffle order — bit-identical to an
                # uninterrupted run (no double-applied batches). Copies are
                # required because the jitted step donates the live buffers.
                pre_state = jax.tree_util.tree_map(lambda x: x.copy(), state)
                pre_rng = rng_state_to_json(rng)
                ds_train = self._wrap_ds(provider("train", div))
                state, loss_train = self.train_epoch(state, ds_train, rng,
                                                     dropout_rng)

                if self._preempt_requested:
                    host = {"scheduler": self.scheduler.state_dict(),
                            "best_loss_valid": self.best_loss_valid,
                            "best_epoch": self.best_epoch,
                            "best_div": self.best_div,
                            "performance": self.performance,
                            "np_rng": pre_rng,
                            "preempted": True}
                    self.ckpt.save(epoch, div, pre_state, host, is_best=False)
                    log.warning("preempted: pre-shard checkpoint saved at "
                                "epoch %d div %d; resume with resume='auto'",
                                epoch, div)
                    return state

                loss_valid, n_valid = 0.0, 0
                for vs in valid_shards:
                    lv, nv = self.valid_epoch(state, vs)
                    loss_valid += lv
                    n_valid += nv
                loss_valid /= max(n_valid, 1)

                is_best = loss_valid < self.best_loss_valid
                if is_best:
                    self.best_loss_valid = loss_valid
                    self.best_epoch, self.best_div = epoch, div

                if test_shards is not None:
                    loss_test, n_test = 0.0, 0
                    for ts in test_shards:
                        lt, nt = self.valid_epoch(state, ts)
                        loss_test += lt
                        n_test += nt
                    loss_test /= max(n_test, 1)
                    self.performance.setdefault("loss_test", []).append(
                        loss_test)

                self.performance["loss_train"].append(loss_train)
                self.performance["loss_valid"].append(loss_valid)
                self.performance["datetime"].append(
                    datetime.datetime.now().isoformat())
                self.performance["lr"].append(self.scheduler.lr)
                self.performance.update(
                    current_epoch=epoch, current_div=div,
                    best_epoch=self.best_epoch, best_div=self.best_div,
                    best_loss_valid=self.best_loss_valid)
                if is_coordinator():
                    with open(os.path.join(self.out_dir, "performance.json"),
                              "w", encoding="utf-8") as f:
                        json.dump(self.performance, f, indent=4,
                                  sort_keys=True)

                host = {"scheduler": self.scheduler.state_dict(),
                        "best_loss_valid": self.best_loss_valid,
                        "best_epoch": self.best_epoch,
                        "best_div": self.best_div,
                        "performance": self.performance,
                        "np_rng": rng_state_to_json(rng),
                        "loss_train": loss_train, "loss_valid": loss_valid}
                self.ckpt.save(epoch, div, state, host, is_best=is_best)
                self._apply_retention()

                if self.scheduler.step(loss_valid):
                    state = state.replace(opt_state=set_learning_rate(
                        state.opt_state, self.scheduler.lr))
                    log.info("plateau: lr reduced to %g", self.scheduler.lr)

                # Tunnel hygiene: the journaling tunnel client retains every
                # H2D payload (~3 MB/step — utils/tunnel.py), so a full run
                # would be OOM-killed around 27k steps. The (epoch, div)
                # boundary is the one point where state + dropout_rng are the
                # ONLY live device arrays (prefetch drained, losses fetched,
                # checkpoint saved), so they can be carried across a journal
                # reset. No-op off-tunnel.
                jr = t.journal_reset_divs
                if jr and (epoch * t.n_div_train + div + 1) % jr == 0 \
                        and journal_reset_supported():
                    state, dropout_rng = reset_transfer_journal(
                        (state, dropout_rng))
                    # device-resident splits died with the journal's
                    # buffers; re-upload from the host arrays
                    for dev_ds in self._dev_cache.values():
                        dev_ds.refresh()
                    log.info("transfer journal reset at epoch %d div %d",
                             epoch, div)

                log.info("[epoch %03d div %03d] train %.5f valid %.5f "
                         "(%.1fs, lr %g)", epoch, div, loss_train, loss_valid,
                         time.time() - tic, self.scheduler.lr)
            div_start = 0
        return state

    def _apply_retention(self) -> None:
        """Prune to {best} + the newest ``keep_checkpoints`` when configured
        (a 20-epoch x 4-shard run otherwise keeps all 80 orbax dirs)."""
        k = self.config.train.keep_checkpoints
        if k is None or not is_coordinator():
            return
        tags = self.ckpt.valid_tags()
        keep = set(tags[-k:]) if k > 0 else set()
        best = self.ckpt.best_tag()
        if best is not None:
            keep.add(tuple(best))
        self.ckpt.prune(sorted(keep))

    def latest_checkpoint(self) -> tuple[int, int] | None:
        """Newest fully committed (epoch, div) checkpoint on disk, if any.

        Torn checkpoints from a hard kill mid-save (orbax state without
        ``host.json``, or an uncommitted tmp dir) are skipped, so auto-resume
        falls back to the newest checkpoint that can actually restore.
        """
        tags = self.ckpt.valid_tags()
        return tags[-1] if tags else None

    def _write_manifest(self, state: TrainState) -> None:
        """Run manifest (reference ``parameter.json`` — m_training.py:162-208)."""
        if not is_coordinator():
            return
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
        manifest = {"config": self.config.to_dict(), "parameters": n_params,
                    "d_output": self.out_dir,
                    "devices": [str(d) for d in jax.devices()],
                    "processes": jax.process_count(),
                    "mesh": str(self.mesh) if self.mesh else None}
        with open(os.path.join(self.out_dir, "parameter.json"), "w",
                  encoding="utf-8") as f:
            json.dump(manifest, f, indent=4)
