"""Compile + quality check of the int8 engine on real TPU hardware.

Runs the paper-scale model through the bf16 and int8 fused-layer engines on
the same input and reports posterior agreement (the decode-relevant
quantity). Not a timing benchmark — see bench.py for that.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer import engine
from nylon_amt_tpu.models.hft import build_model, init_params
from nylon_amt_tpu.utils.cache import enable_compilation_cache


def main() -> None:
    enable_compilation_cache()
    config = Config(model=ModelConfig(
        hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3, enc_head=4,
        dec_head=4, dropout=0.0, compute_dtype="bfloat16"))
    params = init_params(config, jax.random.key(0))
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal(
        (8, config.feature.n_bins, config.window_frames)) * 2.0 - 8.0,
        jnp.float32)

    f_bf16 = jax.jit(lambda s: engine.forward(params, s, config))
    f_q8 = jax.jit(lambda s: engine.forward(params, s, config,
                                            precision="int8"))

    t0 = time.perf_counter()
    ref = jax.device_get(f_bf16(spec))
    print(f"bf16 engine: ran in {time.perf_counter() - t0:.1f}s "
          "(incl. compile)", flush=True)
    t0 = time.perf_counter()
    got = jax.device_get(f_q8(spec))
    print(f"int8 engine: ran in {time.perf_counter() - t0:.1f}s "
          "(incl. compile)", flush=True)

    worst_logit, worst_post = 0.0, 0.0
    for k in sorted(ref):
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        dl = float(np.max(np.abs(r - g) / np.maximum(np.abs(r), 1.0)))
        pr = 1 / (1 + np.exp(-r))
        pg = 1 / (1 + np.exp(-g))
        dp = float(np.max(np.abs(pr - pg)))
        worst_logit = max(worst_logit, dl)
        worst_post = max(worst_post, dp)
        print(f"  {k:12s} rel-logit {dl:.4f}  post {dp:.4f}", flush=True)
    print(f"worst: rel-logit {worst_logit:.4f}, posterior {worst_post:.4f}")
    assert np.isfinite(worst_logit) and worst_post < 0.15
    print("OK")


if __name__ == "__main__":
    main()
