"""Second A/B round on the production step: dropout and head costs.

Same methodology as probe_step_variants.py (surgical stubs, full-step
diffs):

  full       production step (dropout 0.1, real heads)
  dropout0   identical but model.dropout = 0 — the diff is the TOTAL cost
             of the in-kernel hash-mask dropout (fwd + bwd regeneration at
             ~6 sites/layer) plus the dropout-seed derivations
  no_heads   head projections replaced by broadcasts of one channel (no
             head matmuls / 46 MB velocity logits; grads still flow to the
             trunk) — the diff is the full cost of the 8+8 output heads

Run on a real TPU: python scripts/probe_step_variants2.py
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

    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.models import fused_train
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    print("backend:", jax.default_backend(), flush=True)
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

    def time_step(cfg):
        state = create_train_state(cfg, jax.random.key(0), batch_size=B)
        step = make_train_step(cfg)
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
        return float(np.median(best))

    def cfg_with(dropout):
        return Config(model=ModelConfig.paper_scale(dropout=dropout)
                      if hasattr(ModelConfig, "paper_scale")
                      else ModelConfig(hid_dim=256, pf_dim=512, enc_layer=3,
                                       dec_layer=3, enc_head=4, dec_head=4,
                                       dropout=dropout,
                                       compute_dtype="bfloat16"),
                      train=TrainConfig(batch_size=B))

    def paper(dropout=0.1):
        return Config(model=ModelConfig(hid_dim=256, pf_dim=512, enc_layer=3,
                                        dec_layer=3, enc_head=4, dec_head=4,
                                        dropout=dropout,
                                        compute_dtype="bfloat16"),
                      train=TrainConfig(batch_size=B))

    results = {}
    results["full"] = round(time_step(paper(0.1)), 2)
    print(f"     full: {results['full']:7.2f} ms/step", flush=True)
    results["dropout0"] = round(time_step(paper(0.0)), 2)
    print(f" dropout0: {results['dropout0']:7.2f} ms/step", flush=True)

    orig_dense = fused_train._dense

    def fake_dense(x, p, dt):
        n = p["kernel"].shape[1]
        return jnp.broadcast_to(x[..., :1], x.shape[:-1] + (n,))

    fused_train._dense = fake_dense
    try:
        results["no_heads"] = round(time_step(paper(0.1)), 2)
    finally:
        fused_train._dense = orig_dense
    print(f" no_heads: {results['no_heads']:7.2f} ms/step", flush=True)

    results["dropout_cost"] = round(results["full"] - results["dropout0"], 2)
    results["heads_cost"] = round(results["full"] - results["no_heads"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
