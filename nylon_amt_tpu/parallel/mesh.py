"""Mesh + sharding rules.

The reference is single-GPU (``m_training.py:113``, no torch.distributed
anywhere); scaling here is TPU-native instead: a 2-D
``jax.sharding.Mesh`` with axes

* ``data`` — batch (DP). Gradients are reduced by XLA-inserted psums over
  ICI when the loss is computed from a batch sharded on this axis.
* ``model`` — tensor parallelism (TP), Megatron-style: attention QKV and FFN
  up-projections are sharded column-wise, output projections row-wise, and
  the (large) velocity heads column-wise. At hFT's size TP is rarely needed
  (the reference model is <10 M params); the axis defaults to 1 but the
  shardings are real and tested so the mesh generalizes.

Everything is plain ``jax.jit`` + ``NamedSharding`` — XLA chooses the
collectives; no hand-written NCCL-style communication.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    return P(DATA_AXIS)


# ---- TP parameter partitioning ---------------------------------------------
# Path patterns (joined flax param path) -> PartitionSpec. First match wins;
# unmatched params are replicated.
_TP_RULES: list[tuple[str, P]] = [
    # attention input projections: column-parallel (shard heads)
    (r"(fc_q|fc_k|fc_v)_kernel$", P(None, MODEL_AXIS)),
    (r"(fc_q|fc_k|fc_v)_bias$", P(MODEL_AXIS)),
    # attention output projection: row-parallel
    (r"fc_o_kernel$", P(MODEL_AXIS, None)),
    # FFN up / down
    (r"positionwise_feedforward/fc_1/kernel$", P(None, MODEL_AXIS)),
    (r"positionwise_feedforward/fc_1/bias$", P(MODEL_AXIS)),
    (r"positionwise_feedforward/fc_2/kernel$", P(MODEL_AXIS, None)),
    # velocity heads project hid -> 128 classes: column-parallel
    (r"fc_velocity_(freq|time)/kernel$", P(None, MODEL_AXIS)),
    (r"fc_velocity_(freq|time)/bias$", P(MODEL_AXIS)),
]


def param_partition_specs(params: Any) -> Any:
    """Map a param pytree to PartitionSpecs per the TP rules above."""

    def spec_for(path: tuple, leaf) -> P:
        joined = "/".join(str(getattr(k, "key", k)) for k in path)
        for pattern, spec in _TP_RULES:
            if re.search(pattern, joined):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh per the TP rules (replicated over ``data``)."""
    specs = param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Fully replicate a train state's arrays over the (multi-host) mesh.

    Multi-host runs are DP-only (the hFT model is <10 M params — TP across
    hosts is never worth the DCN hops): every leaf (params, optimizer
    moments, step) becomes a global array replicated on all devices of all
    processes. Each process supplies its host-local copy (identical by
    construction: same init key / same restore).
    """
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard each batch array along its leading (batch) dimension.

    Single process: a plain async ``device_put`` onto the data axis.
    Multi-process (multi-host): ``batch`` holds only this process's rows of
    the global batch; the global array is assembled from the per-process
    local data — each host transfers only what it loaded
    (``jax.make_array_from_process_local_data``), no cross-host gather of
    raw input.
    """
    sharding = NamedSharding(mesh, batch_spec())
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
