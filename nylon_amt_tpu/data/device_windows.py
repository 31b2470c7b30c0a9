"""Device-resident window sampler: corpus arrays live in HBM, gathers run
on-device.

The host input path (``WindowDataset.gather`` + ``device_put``) ships
~3 MB of spec+labels per batch-8 step. On a locally-attached chip that
overlaps compute; through this environment's journaled tunnel it is the
training bottleneck for small models (measured: the hid-64 proof recipe
spends ~80% of its step wall-time on input transfer — 3750-step epochs ran
~5-10 min against ~75 s of device compute). The reference has no
counterpart (its ``DataLoader`` feeds a local GPU — ``dataset.py:17-64``);
this is the TPU-native answer: upload each split ONCE (a 96-piece
synthetic split is ~260 MB; a full-MAESTRO-scale shard does not fit and
stays on the host path), then per step upload only the ``int32[B]`` window
starts and gather spec/label windows in one jitted device computation.

Semantics are IDENTICAL to :class:`WindowDataset` (same idx table, same
margins/transpose/dtypes, same batches() iteration contract) — pinned by
``tests/test_device_dataset.py``. ``Trainer`` auto-wraps host datasets
with :func:`as_device_dataset` when residency is worthwhile
(:func:`host_input_is_hidden` — paper-class models keep the measured-free
host path) and safe (single-process, non-CPU, split under
``NYLON_DEVICE_DATASET_MAX_BYTES``); ``NYLON_DEVICE_DATASET=1/0``
force-overrides the heuristic.
"""

from __future__ import annotations

import os

import numpy as np

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.data.corpus import SplitArrays
from nylon_amt_tpu.data.windows import WindowDataset

# Per-split HBM budget for device residency (v5e has 16 GB; the paper
# model + optimizer + activations need well under 1 GB).
_MAX_BYTES = float(os.environ.get("NYLON_DEVICE_DATASET_MAX_BYTES", 4e9))
# Aggregate budget across ALL cached splits (Trainer LRU-evicts to stay
# under it — a multi-div corpus would otherwise pin n_div x 4 GB).
_TOTAL_BYTES = float(os.environ.get("NYLON_DEVICE_DATASET_TOTAL_BYTES", 8e9))
# Force the promotion decision: "1" promotes whenever the split fits,
# "0" never promotes, unset -> the measured model-scale heuristic below.
_FORCE = os.environ.get("NYLON_DEVICE_DATASET", "")


def host_input_is_hidden(config: Config) -> bool:
    """Measured gate: is the host input path (gather + prefetch thread +
    ``device_put``) already fully hidden behind device compute, so device
    residency buys nothing and its blocking per-(re)load upload is pure
    overhead?

    Two measured regimes (PERF.md, `docs/scale_run_r5.log`):

    * paper scale (hid 256, ~85 ms/step at batch 8): host path is free —
      ``e2e_vs_compute_only`` 1.003 (plain) / 1.006 (DP-mesh path) — while
      resident splits at MAESTRO n_div=4 geometry LRU-thrash and pay a
      blocking ~1.4 GB upload per div, ~25-30% extra wall;
    * reduced recipe (hid 64, ~20 ms/step): host path is ~8x device
      compute and residency wins 169 -> 27 ms/step.

    The boundary is where step compute stops covering the ~2 tunnel RTTs
    + ~3 MB H2D per step (~70-85 ms); step time scales ~hid_dim^2, so the
    cut sits between the two measured points, biased toward promotion
    (the loss from wrongly promoting is bounded by the upload; the loss
    from wrongly not promoting is ~8x the step).
    """
    return config.model.hid_dim >= 192


def device_dataset_budget() -> float:
    """Aggregate HBM budget for resident splits (env-overridable)."""
    return _TOTAL_BYTES


def split_nbytes(arrays: SplitArrays) -> int:
    n = arrays.feature.nbytes + arrays.onset.nbytes + arrays.offset.nbytes \
        + arrays.mpe.nbytes + arrays.velocity.nbytes
    if arrays.string is not None:
        n += arrays.string.nbytes
    return n


class DeviceWindowDataset(WindowDataset):
    """Drop-in :class:`WindowDataset` whose ``gather`` runs on-device."""

    def __init__(self, arrays: SplitArrays, config: Config, n_slice: int = 1):
        super().__init__(arrays, config, n_slice)
        import jax
        import jax.numpy as jnp

        self.cached_nbytes = split_nbytes(arrays)

        # One upload per split; memmaps materialize here by design.
        self.refresh()
        inp = config.input

        @jax.jit
        def _gather(dev, starts):
            f_idx = starts[:, None] + jnp.arange(-inp.margin_b,
                                                 inp.num_frame + inp.margin_f)
            l_idx = starts[:, None] + jnp.arange(inp.num_frame)
            batch = {
                "spec": jnp.transpose(dev["feature"][f_idx], (0, 2, 1)),
                "onset": dev["onset"][l_idx],
                "offset": dev["offset"][l_idx],
                "mpe": dev["mpe"][l_idx].astype(jnp.float32),
                "velocity": dev["velocity"][l_idx].astype(jnp.int32),
            }
            if "string" in dev:
                batch["string"] = dev["string"][l_idx].astype(jnp.int32)
            return batch

        self._gather_dev = _gather
        self._jnp = jnp

    def gather(self, positions: np.ndarray) -> dict:
        starts = self.idx[np.asarray(positions)].astype(np.int32)
        self.ensure_resident()
        return self._gather_dev(self._dev, self._jnp.asarray(starts))

    def ensure_resident(self) -> None:
        """Re-upload if the buffers were freed (LRU eviction can delete a
        split a caller still holds, e.g. fit()'s valid-shard list)."""
        if not self._dev:
            self.refresh()

    def refresh(self) -> None:
        """Re-upload the split after an event that killed device buffers
        (the tunnel journal fence — ``utils/tunnel.py`` — invalidates every
        live device array it wasn't asked to carry)."""
        import jax

        arrays = self.arrays
        dev = {
            "feature": jax.device_put(np.ascontiguousarray(arrays.feature)),
            "onset": jax.device_put(np.ascontiguousarray(arrays.onset)),
            "offset": jax.device_put(np.ascontiguousarray(arrays.offset)),
            "mpe": jax.device_put(np.ascontiguousarray(arrays.mpe)),
            "velocity": jax.device_put(np.ascontiguousarray(arrays.velocity)),
        }
        if arrays.string is not None:
            dev["string"] = jax.device_put(
                np.ascontiguousarray(arrays.string))
        self._dev = dev

    def delete(self) -> None:
        """Free the split's device buffers (shard reload hygiene)."""
        for v in self._dev.values():
            try:
                v.delete()
            except Exception:
                pass
        self._dev = {}


def as_device_dataset(ds, config: Config):
    """Wrap a host :class:`WindowDataset` in its device-resident twin when
    that is safe and worthwhile; otherwise return ``ds`` unchanged."""
    import jax

    if not isinstance(ds, WindowDataset) \
            or isinstance(ds, DeviceWindowDataset):
        return ds
    if jax.process_count() > 1 or jax.default_backend() == "cpu":
        return ds
    if _FORCE == "0" or (_FORCE != "1" and host_input_is_hidden(config)):
        return ds
    if split_nbytes(ds.arrays) > _MAX_BYTES:
        return ds
    dev = DeviceWindowDataset(ds.arrays, ds.config, n_slice=1)
    dev.idx = ds.idx          # preserve the caller's n_slice-applied table
    return dev
