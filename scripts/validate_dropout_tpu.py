"""Validate the in-kernel attention dropout on a real TPU.

The pytest suite runs on the CPU interpreter, which has no Pallas PRNG;
this script runs the same checks on hardware: per-seed determinism,
unbiasedness vs the dropout-free kernel, and gradient correctness by
finite differences.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from nylon_amt_tpu.ops.attention import fused_mha, fused_mha_dropout


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    n, lq, lk, hid, H = 8, 64, 64, 64, 2
    q = jnp.asarray(rng.standard_normal((n, lq, hid)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, lk, hid)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, lk, hid)), jnp.float32)
    scale = 0.125

    # determinism per seed
    a = np.asarray(fused_mha_dropout(q, k, v, H, scale, 0.3, False, jnp.int32(7)))
    b = np.asarray(fused_mha_dropout(q, k, v, H, scale, 0.3, False, jnp.int32(7)))
    c = np.asarray(fused_mha_dropout(q, k, v, H, scale, 0.3, False, jnp.int32(8)))
    assert np.array_equal(a, b), "same seed must reproduce"
    assert not np.allclose(a, c), "different seed must differ"
    print("determinism: OK")

    # unbiasedness
    base = np.asarray(fused_mha(q, k, v, H, scale, False))
    acc = np.zeros_like(base)
    n_seeds = 32
    for s in range(n_seeds):
        acc += np.asarray(fused_mha_dropout(q, k, v, H, scale, 0.5, False,
                                            jnp.int32(1000 + s)))
    err = np.abs(acc / n_seeds - base).mean() / np.abs(base).mean()
    print(f"unbiasedness: mean rel err over {n_seeds} seeds = {err:.3f}")
    assert err < 0.15, err

    # gradients by finite differences
    rate, seed = 0.4, jnp.int32(5)

    def loss(qx):
        out = fused_mha_dropout(qx, k, v, H, scale, rate, False, seed)
        return jnp.sum(out * out)

    g = jax.grad(loss)(q)
    rs = np.random.default_rng(1)
    worst = 0.0
    for _ in range(6):
        i, j, l = rs.integers(n), rs.integers(lq), rs.integers(hid)
        eps = 1e-2
        fd = (loss(q.at[i, j, l].add(eps)) - loss(q.at[i, j, l].add(-eps))) / (2 * eps)
        rel = abs(float(g[i, j, l]) - float(fd)) / (abs(float(fd)) + 1e-3)
        worst = max(worst, rel)
    print(f"gradients: worst finite-diff rel err = {worst:.4f}")
    assert worst < 0.05, worst
    print("DROPOUT KERNEL VALIDATION: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
