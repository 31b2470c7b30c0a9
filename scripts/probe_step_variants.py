"""A/B the full production train step against surgically-stubbed variants.

Isolated jitted micro-probes of the residual pieces are swamped by ~1 ms of
per-dispatch overhead each (measured: a pure 46 MB transpose and a 4-matmul
head stack both "cost" ~1.1 ms — the floor). The honest way to cost a piece
is to remove ONLY that piece from the production step and diff the full-step
time, identical methodology on both sides. Variants (cumulative):

  full      the production loss (BCE x6 + CE x2, valid-masked)
  no_ce     velocity CE terms replaced by mean(logits) (keeps grads flowing)
  no_bce    ... and the six BCE terms replaced the same way
  min_loss  loss = sum of means of every output (minimal loss graph)

Run on a real TPU: python scripts/probe_step_variants.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    import nylon_amt_tpu.train.step as step_mod
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    print("backend:", jax.default_backend(), flush=True)
    cfg = Config(model=ModelConfig.paper_scale(),
                 train=TrainConfig(batch_size=8))
    B = 8
    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.standard_normal((B, 256, 192)), jnp.float32),
        "onset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "offset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, 128, 88)) > 0.9, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, 128, (B, 128, 88)), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }

    orig_loss_fn = step_mod.loss_fn

    def make_variant_loss(mode):
        def loss_fn(config, apply_fn, params, batch, dropout_rng=None,
                    batch_stats=None, denom=None):
            if mode == "full":
                return orig_loss_fn(config, apply_fn, params, batch,
                                    dropout_rng, batch_stats, denom)
            rngs = None if dropout_rng is None else {"dropout": dropout_rng}
            out = apply_fn({"params": params}, batch["spec"],
                           deterministic=dropout_rng is None, rngs=rngs)
            valid = batch["valid"]
            denom = jnp.maximum(valid.sum(), 1.0)

            def bce(lg, tg):
                per = optax.sigmoid_binary_cross_entropy(lg, tg)
                per = per.mean(axis=tuple(range(1, per.ndim)))
                return (per * valid).sum() / denom

            def ce(lg, lab):
                per = optax.softmax_cross_entropy_with_integer_labels(lg, lab)
                per = per.mean(axis=tuple(range(1, per.ndim)))
                return (per * valid).sum() / denom

            def cheap(lg):
                return jnp.mean(lg.astype(jnp.float32))

            tot = 0.0
            for fam in ("A", "B"):
                if mode in ("no_ce",):
                    tot += bce(out[f"onset_{fam}"], batch["onset"])
                    tot += bce(out[f"offset_{fam}"], batch["offset"])
                    tot += bce(out[f"mpe_{fam}"], batch["mpe"])
                else:
                    tot += cheap(out[f"onset_{fam}"])
                    tot += cheap(out[f"offset_{fam}"])
                    tot += cheap(out[f"mpe_{fam}"])
                tot += cheap(out[f"velocity_{fam}"])
            return tot, {"loss": tot}

        return loss_fn

    def time_step(step, state):
        key = jax.random.key(1)
        for _ in range(3):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                state, metrics = step(state, batch, key)
            float(metrics["loss"])
            best.append((time.perf_counter() - t0) / 20 * 1e3)
        return float(np.median(best)), state

    results = {}
    for mode in ("full", "no_ce", "min_loss", "full2"):
        step_mod.loss_fn = make_variant_loss(
            "full" if mode == "full2" else mode)
        try:
            state = create_train_state(cfg, jax.random.key(0), batch_size=B)
            step = make_train_step(cfg)
            ms, state = time_step(step, state)
        finally:
            step_mod.loss_fn = orig_loss_fn
        results[mode] = round(ms, 2)
        print(f"{mode:>9}: {ms:7.2f} ms/step", flush=True)

    results["ce_cost"] = round(results["full"] - results["no_ce"], 2)
    results["bce_cost"] = round(results["no_ce"] - results["min_loss"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
