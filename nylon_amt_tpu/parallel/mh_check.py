"""Multi-host training parity check (CPU rig).

Real multi-host TPU slices are not available in CI, so multi-host
correctness is validated the same way the multi-chip path is: virtual CPU
devices — here split across REAL separate processes wired through
``jax.distributed`` (gloo collectives), exactly the code path a v5e-16 run
takes (4 processes x 4 chips).

``run_comparison`` spawns a single-process N-device reference run and an
``n_processes``-way run over the same N global devices (same synthetic
corpus, same seeds, same global batch), each through the FULL ``Trainer``
(fit -> shard-sliced input -> global batch assembly -> orbax multi-process
checkpointing), then asserts identical loss histories and final parameters.

Worker entry: ``python -m nylon_amt_tpu.parallel.mh_check --process-id I
--num-processes N --local-devices D --port P --workdir DIR``.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys


def _worker_main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.num_processes > 1:
        from nylon_amt_tpu.parallel.distributed import initialize

        initialize(f"localhost:{args.port}",
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import numpy as np

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.parallel.mesh import make_mesh
    from nylon_amt_tpu.train.loop import Trainer

    n_global = args.num_processes * args.local_devices
    cfg = Config(
        model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1,
                          enc_head=2, dec_head=2, dropout=0.0),
        train=TrainConfig(batch_size=n_global, epochs=args.epochs,
                          n_slice=2, seed=7),
    )
    # Deterministic synthetic corpus: identical on every process and in the
    # single-process reference run.
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((120, 256)).astype(np.float32)
    lab = {"onset": (rng.random((120, 88)) > 0.95).astype(np.float32),
           "offset": (rng.random((120, 88)) > 0.95).astype(np.float32),
           "mpe": rng.random((120, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (120, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])

    def provider(split, div):
        return WindowDataset(arrays, cfg, n_slice=cfg.train.n_slice)

    mesh = make_mesh(n_data=n_global, n_model=1)
    run_dir = os.path.join(args.workdir, f"run_p{args.num_processes}")
    trainer = Trainer(cfg, run_dir, mesh=mesh)
    state = trainer.fit(provider)

    if jax.process_index() == 0:
        checksum = float(sum(
            np.abs(np.asarray(p)).sum()
            for p in jax.tree_util.tree_leaves(state.params)))
        out = {"loss_train": trainer.performance["loss_train"],
               "loss_valid": trainer.performance["loss_valid"],
               "param_checksum": checksum,
               "n_processes": args.num_processes,
               "n_global_devices": jax.device_count()}
        with open(os.path.join(args.workdir,
                               f"result_p{args.num_processes}.json"),
                  "w") as f:
            json.dump(out, f)
    # Give the coordination service a clean shutdown.
    if args.num_processes > 1:
        jax.distributed.shutdown()


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_comparison(workdir: str, n_processes: int = 2,
                   local_devices: int = 4, epochs: int = 2,
                   timeout: int = 900) -> dict:
    """Spawn the reference + multi-process runs; return comparison info.

    Raises AssertionError when the multi-process run diverges from the
    single-process run on the same global device count.
    """
    os.makedirs(workdir, exist_ok=True)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base = [sys.executable, "-m", "nylon_amt_tpu.parallel.mh_check",
            "--local-devices", str(local_devices), "--workdir", workdir,
            "--epochs", str(epochs)]

    # 1) single-process reference over the same number of global devices
    subprocess.run(base + ["--process-id", "0", "--num-processes", "1",
                           "--port", "0",
                           "--local-devices",
                           str(n_processes * local_devices)],
                   check=True, env=env, timeout=timeout)

    # 2) n-process run, one subprocess per "host"
    port = free_port()
    procs = [subprocess.Popen(
        base + ["--process-id", str(pid), "--num-processes",
                str(n_processes), "--port", str(port)], env=env)
        for pid in range(n_processes)]
    for p in procs:
        rc = p.wait(timeout=timeout)
        if rc != 0:
            raise RuntimeError(f"multi-process worker exited rc={rc}")

    with open(os.path.join(workdir, "result_p1.json")) as f:
        ref = json.load(f)
    with open(os.path.join(workdir, f"result_p{n_processes}.json")) as f:
        got = json.load(f)

    import numpy as np

    np.testing.assert_allclose(got["loss_train"], ref["loss_train"],
                               rtol=1e-5)
    np.testing.assert_allclose(got["loss_valid"], ref["loss_valid"],
                               rtol=1e-5)
    np.testing.assert_allclose(got["param_checksum"], ref["param_checksum"],
                               rtol=1e-5)
    return {"ref": ref, "multi": got}


if __name__ == "__main__":
    _worker_main()
