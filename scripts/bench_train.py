"""Training-step throughput benchmark (one chip, paper-scale model).

Times a device-side ``lax.scan`` of full train steps (fwd + bwd + Adam) and
reports trained audio-seconds per wall second per chip. Prints one JSON line
(this is the training companion of the inference ``bench.py``; the driver's
headline metric stays inference throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_e2e(config, args, mesh=None) -> dict:
    """End-to-end epoch loop: real WindowDataset gathers feeding the jitted
    step through the background prefetch thread (the production input path),
    vs the compute-only scan number. Per-step losses stay on device; one
    fetch at the end closes the pipeline. With ``mesh``, batches go through
    ``shard_batch`` and the shard_map step — the host input path the
    device-resident dataset gate falls back to under meshes.
    """
    import jax

    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.prefetch import prefetch
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    B = args.batch
    n_steps = args.iters * 3
    rng = np.random.default_rng(0)
    frames = n_steps * B + 256
    feat = rng.standard_normal((frames, 256)).astype(np.float32)
    lab = {"onset": (rng.random((frames, 88)) > 0.97).astype(np.float32),
           "offset": (rng.random((frames, 88)) > 0.97).astype(np.float32),
           "mpe": rng.random((frames, 88)) > 0.9,
           "velocity": rng.integers(0, 127, (frames, 88)).astype(np.int8)}
    arrays = assemble_split(config, [feat], [lab])
    ds = WindowDataset(arrays, config, n_slice=1)

    state = create_train_state(config, jax.random.key(0), batch_size=B)
    transfer = jax.device_put
    if mesh is not None:
        from nylon_amt_tpu.parallel.mesh import shard_batch, shard_params

        state = state.replace(params=shard_params(state.params, mesh))
        transfer = lambda b: shard_batch(b, mesh)   # noqa: E731
    step = make_train_step(config, mesh=mesh)
    key = jax.random.key(1)
    shuffle_rng = np.random.default_rng(1)

    def epoch(state, max_steps):
        losses, n = [], 0
        for batch in prefetch(ds.batches(B, shuffle=True, rng=shuffle_rng,
                                         pad_to_batch=True, drop_last=True),
                              transfer=transfer):
            state, metrics = step(state, batch, key)
            losses.append(metrics["loss"])
            n += 1
            if n >= max_steps:
                break
        float(jax.device_get(losses[-1]))  # close the pipeline
        return state, n

    t0 = time.time()
    state, _ = epoch(state, 3)  # compile + warmup
    print(f"# e2e compile+warmup: {time.time() - t0:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, n = epoch(state, n_steps)
    dt = (time.perf_counter() - t0) / n

    sec_per_window = (config.input.num_frame * config.feature.hop_sample
                      / config.feature.sr)
    return {"e2e_step_ms": round(dt * 1e3, 1),
            "e2e_audio_sec_per_sec": round(B * sec_per_window / dt, 2),
            "e2e_steps": n}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--e2e", action="store_true",
                    help="also time the real input pipeline (WindowDataset "
                         "gather + prefetch thread + device_put per step)")
    ap.add_argument("--mesh", action="store_true",
                    help="run the step through the DP mesh code path "
                         "(shard_map + psum over all local devices; on the "
                         "single-chip environment this is a 1-device mesh "
                         "— it measures the MESH PATH's input overlap, the "
                         "configuration where device-resident datasets "
                         "auto-gate off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.train.step import create_train_state, make_train_step
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = Config(
        model=ModelConfig(hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3,
                          enc_head=4, dec_head=4, dropout=args.dropout,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=args.batch),
    )
    B = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.standard_normal((B, 256, 192)), jnp.float32),
        "onset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "offset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, 128, 88)) > 0.9, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, 128, (B, 128, 88)), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    mesh = None
    if args.mesh:
        from nylon_amt_tpu.parallel.mesh import make_mesh, shard_batch, \
            shard_params

        mesh = make_mesh(n_data=jax.device_count(), n_model=1)
        batch = shard_batch(batch, mesh)
    state = create_train_state(config, jax.random.key(0), batch_size=B)
    if mesh is not None:
        state = state.replace(params=shard_params(state.params, mesh))
    # The PRODUCTION step (fused-layer custom-VJP path on TPU).
    step = make_train_step(config, mesh=mesh)

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.key(1))
    float(metrics["loss"])
    print(f"# compile+first: {time.time() - t0:.0f}s", file=sys.stderr)
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.key(2))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, jax.random.key(3))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    sec_per_window = (config.input.num_frame * config.feature.hop_sample
                      / config.feature.sr)
    audio_per_sec = B * sec_per_window / dt
    out = {
        "metric": "train_audio_sec_per_sec_per_chip",
        "value": round(audio_per_sec, 2),
        "unit": "audio_sec/sec/chip",
        "step_ms": round(dt * 1e3, 1),
        "batch": B,
        "dropout": args.dropout,
    }
    if args.mesh:
        out["mesh"] = f"dp={jax.device_count()}"
    if args.e2e:
        out.update(run_e2e(config, args, mesh=mesh))
        out["e2e_vs_compute_only"] = round(
            out["e2e_audio_sec_per_sec"] / audio_per_sec, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
