"""Multi-host (multi-process) execution.

The reference trains on exactly one GPU in one process (``m_training.py:113``
— no torch.distributed anywhere). The TPU north-star config ("full-MAESTRO
data-parallel training on v5e-16", BASELINE.json) is a 4-host x 4-chip
slice, so multi-host is new capability, built the JAX way:

* every process calls :func:`initialize` once — on a real TPU pod slice all
  coordinates are auto-detected from the TPU metadata; on a CPU test rig
  (or any manual cluster) pass ``coordinator_address`` / ``num_processes``
  / ``process_id`` explicitly;
* the mesh spans *global* devices (``jax.devices()`` after initialization
  lists every chip on every host); gradients reduce over ICI within a host
  and DCN across hosts, inserted by XLA — no NCCL/MPI-style code;
* each process loads only its slice of every global batch
  (``WindowDataset.batches(process_index=..., process_count=...)``) and
  :func:`shard_batch` assembles the global device array from the
  process-local rows via ``jax.make_array_from_process_local_data`` — the
  input pipeline is the only place DCN-style data movement happens
  (SURVEY.md §5 "DCN only for multi-host input pipelines").
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no arguments on a TPU pod slice, everything is auto-detected.
    Explicit arguments support CPU test rigs and manual clusters. Calling
    again (or in a single-process run that never needs a coordinator) is a
    no-op.
    """
    if num_processes == 1 and coordinator_address is None:
        return  # single process: no coordination service needed
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that owns host-side artifacts (JSON logs, best
    pointers, retention pruning)."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Rows this process contributes to each global batch."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} must divide evenly "
            f"across {n} processes")
    return global_batch_size // n
