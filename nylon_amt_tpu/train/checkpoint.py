"""Orbax checkpointing with the reference's (epoch, div) cadence.

The reference writes ``model_{epoch:03d}_{div:03d}.dat`` with model/optimizer/
scheduler state plus RNG, and tracks ``best_model`` separately
(``m_training.py:371-420``). Here: one Orbax directory per (epoch, div)
containing the jax pytrees, a JSON sidecar for host state (scheduler, best
tracking, numpy shuffle RNG), and a ``best`` pointer file.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


# Checkpoint format version, stored in host.json. Bumped whenever the
# saved pytree layout changes incompatibly, so a cross-version resume
# fails with a clear message instead of an orbax shape mismatch.
#   1: per-leaf Adam mu/nu (optax.adam)
#   2: flattened Adam state (optax.flatten — one flat f32 mu/nu vector)
CKPT_FORMAT_VERSION = 2


def _tag(epoch: int, div: int) -> str:
    return f"model_{epoch:03d}_{div:03d}"


class CheckpointManager:
    def __init__(self, directory: str):
        import atexit

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        # Flush orbax's background threads before interpreter teardown;
        # otherwise a save racing shutdown raises "cannot schedule new
        # futures after interpreter shutdown".
        atexit.register(self.close)

    def close(self) -> None:
        try:
            self._ckptr.close()
        except Exception:
            pass

    # -- save ---------------------------------------------------------------

    def save(self, epoch: int, div: int, state, host_state: dict,
             is_best: bool = False) -> str:
        """Persist device state (params/opt_state/step) + host-side JSON.

        Multi-host: every process must call this (the orbax save is a
        collective over the shared checkpoint directory); host-side JSON
        artifacts are written by process 0 only.
        """
        path = os.path.join(self.directory, _tag(epoch, div))
        host_state = {**host_state, "format_version": CKPT_FORMAT_VERSION}
        tree = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
        if getattr(state, "batch_stats", None) is not None:
            tree["batch_stats"] = state.batch_stats
        self._ckptr.save(os.path.join(path, "state"), tree, force=True)
        # StandardCheckpointer saves asynchronously; block so the checkpoint
        # is durable when save() returns (the reference's torch.save is sync).
        self._ckptr.wait_until_finished()
        if jax.process_index() != 0:
            return path
        with open(os.path.join(path, "host.json"), "w", encoding="utf-8") as f:
            json.dump(host_state, f, indent=2)
        if is_best:
            with open(os.path.join(self.directory, "best_epoch.txt"), "w") as f:
                f.write(f"epoch: {epoch}, div: {div}\n")
            with open(os.path.join(self.directory, "best.json"), "w") as f:
                json.dump({"epoch": epoch, "div": div}, f)
        return path

    # -- restore --------------------------------------------------------------

    def restore(self, epoch: int, div: int, state) -> tuple[Any, dict]:
        """Restore into the structure of ``state``; returns (state, host)."""
        path = os.path.join(self.directory, _tag(epoch, div))
        with open(os.path.join(path, "host.json"), "r", encoding="utf-8") as f:
            host = json.load(f)
        found = host.get("format_version", 1)
        if found != CKPT_FORMAT_VERSION:
            raise RuntimeError(
                f"checkpoint {path} has format version {found}, this build "
                f"expects {CKPT_FORMAT_VERSION} (v1->v2: the Adam state "
                f"layout changed with optax.flatten). Re-train, or resume "
                f"with the matching framework revision.")
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}
        if getattr(state, "batch_stats", None) is not None:
            template["batch_stats"] = state.batch_stats
        # Host (numpy) template leaves carry no sharding and some orbax
        # versions refuse to deserialize without one (seen on the CPU
        # backend); fall back to a local single-device sharding — or, in a
        # multi-process run, a replicated NamedSharding over all devices
        # (a per-process SingleDeviceSharding names a different device on
        # each process, which orbax treats as an inconsistent global
        # sharding).
        if jax.process_count() > 1:
            mesh = jax.sharding.Mesh(np.array(jax.devices()), ("r",))
            default = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
        else:
            default = jax.sharding.SingleDeviceSharding(
                jax.local_devices()[0])

        def to_abstract(x):
            s = getattr(x, "sharding", None)
            if not isinstance(s, jax.sharding.Sharding):
                s = default
            return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                        if not hasattr(x, "dtype") else x.dtype,
                                        sharding=s)

        abstract = jax.tree_util.tree_map(to_abstract, template)
        tree = self._ckptr.restore(os.path.join(path, "state"), abstract)
        new_state = state.replace(params=tree["params"],
                                  opt_state=tree["opt_state"],
                                  step=tree["step"],
                                  batch_stats=tree.get("batch_stats"))
        return new_state, host

    def best_tag(self) -> tuple[int, int] | None:
        p = os.path.join(self.directory, "best.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return d["epoch"], d["div"]

    def exists(self, epoch: int, div: int) -> bool:
        return os.path.isdir(os.path.join(self.directory, _tag(epoch, div)))

    def is_valid(self, epoch: int, div: int) -> bool:
        """True only for a fully committed checkpoint.

        A hard kill mid-save (real preemption without the SIGTERM grace
        period) can leave a torn directory: the orbax state written but
        ``host.json`` missing, or only an uncommitted orbax tmp dir.
        ``save()`` writes the orbax state first and ``host.json`` last, so a
        present ``host.json`` implies the state committed before it.
        """
        path = os.path.join(self.directory, _tag(epoch, div))
        state = os.path.join(path, "state")
        if not (os.path.isdir(state) and os.listdir(state)):
            return False
        return os.path.isfile(os.path.join(path, "host.json"))

    def valid_tags(self) -> list[tuple[int, int]]:
        """All fully committed (epoch, div) checkpoints, sorted ascending."""
        tags = []
        for name in os.listdir(self.directory):
            parts = name.split("_")
            if name.startswith("model_") and len(parts) == 3:
                try:
                    e, d = int(parts[1]), int(parts[2])
                except ValueError:
                    continue
                if self.is_valid(e, d):
                    tags.append((e, d))
        return sorted(tags)

    def prune(self, keep: list[tuple[int, int]]) -> None:
        """Delete checkpoints not in ``keep`` (disk hygiene for long runs)."""
        tags = {_tag(e, d) for e, d in keep}
        for name in os.listdir(self.directory):
            if name.startswith("model_") and name not in tags:
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)


def merge_params(fresh: Any, loaded: Any) -> Any:
    """Overlay ``loaded`` onto ``fresh``, keeping fresh leaves for subtrees
    ``loaded`` lacks.

    The warm-start merge for architectures that EXTEND a pretrained one —
    e.g. fine-tuning a tab-head guitar model (``ModelConfig.tab_head``) from
    a piano checkpoint: every shared parameter comes from the checkpoint,
    the new head keeps its fresh initialization. Raises ``KeyError`` on
    loaded keys absent from ``fresh`` and ``ValueError`` on leaf shape
    mismatches (a genuinely different architecture should fail loudly).
    """
    from collections.abc import Mapping

    if not isinstance(loaded, Mapping) or not isinstance(fresh, Mapping):
        # Compare shapes WITHOUT materializing the leaves: np.asarray would
        # force a device-to-host copy of every fresh param and raises on
        # non-fully-addressable (multi-host sharded) arrays.
        f_shape = getattr(fresh, "shape", None)
        l_shape = getattr(loaded, "shape", None)
        if f_shape is None:
            f_shape = np.shape(fresh)
        if l_shape is None:
            l_shape = np.shape(loaded)
        if tuple(f_shape) != tuple(l_shape):
            raise ValueError(f"shape mismatch: checkpoint {tuple(l_shape)} "
                             f"vs model {tuple(f_shape)}")
        return loaded
    extra = set(loaded) - set(fresh)
    if extra:
        raise KeyError(f"checkpoint has parameters the model lacks: "
                       f"{sorted(extra)[:5]}")
    return {k: merge_params(fresh[k], loaded[k]) if k in loaded else fresh[k]
            for k in fresh}


def load_params(directory: str, epoch: int | None = None,
                div: int | None = None) -> Any:
    """Load just the params tree for inference.

    Without (epoch, div), follows the ``best.json`` pointer (the reference's
    ``best_model.pkl`` analog — ``m_training.py:394-420``).

    Device-portable: a template-less orbax restore replays the shardings
    recorded at save time, so a TPU-trained checkpoint raises "Device TPU …
    was not found" when loaded for CPU inference. The abstract tree is built
    from checkpoint *metadata* with an explicit local-device sharding
    instead (orbax requires a concrete sharding per leaf).
    """
    mgr = CheckpointManager(directory)
    if epoch is None or div is None:
        tag = mgr.best_tag()
        if tag is None:
            raise FileNotFoundError(f"no best checkpoint recorded in {directory}")
        epoch, div = tag
    path = os.path.abspath(os.path.join(directory, _tag(epoch, div), "state"))
    meta = mgr._ckptr.metadata(path).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                       sharding=sharding),
        meta, is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"))
    tree = mgr._ckptr.restore(path, abstract)
    # Host-resident on purpose: loaded params survive tunnel journal resets
    # (utils/tunnel.py invalidates every pre-reset device buffer, so params
    # loaded before a Trainer.fit would otherwise come back deleted).
    # Consumers that run repeated forwards (Transcriber) device_put once.
    return jax.tree_util.tree_map(np.asarray, tree["params"])


def rng_state_to_json(rng: np.random.Generator) -> dict:
    return rng.bit_generator.state


def rng_state_from_json(state: dict) -> np.random.Generator:
    gen = np.random.default_rng()
    gen.bit_generator.state = state
    return gen
