"""Probe: does Mosaic lower int8 matmuls on this TPU, and how fast?

Three questions, answered in order:
  1. Does ``jax.lax.dot_general`` with s8 x s8 -> s32 compile inside a
     Pallas kernel on this chip (v5e)?
  2. Is it numerically exact (integer matmul must be)?
  3. What's the measured speedup vs the bf16 kernel at the fused-layer
     engine's shapes ([bn*L, 256] x [256, 256] projections)?

Run modes:
  python scripts/probe_int8.py compile   # questions 1+2 (safe while pytest runs)
  python scripts/probe_int8.py bench     # question 3 (needs an idle host)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, o_ref, *, n_iter, out_dtype):
    x = x_ref[...]
    w = w_ref[...]
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=out_dtype)
    # chain a few dependent matmuls to amortize DMA and measure MXU rate
    for _ in range(n_iter - 1):
        y = acc.astype(x.dtype) if acc.dtype != x.dtype else acc
        if x.dtype == jnp.int8:
            y = jnp.clip(acc, -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=out_dtype)
    o_ref[...] = acc


def run(dtype, out_dtype, m=4096, k=256, n=256, n_iter=8, interpret=False):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-4, 5, (k, n)), jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((m, k)), dtype)
        w = jnp.asarray(rng.standard_normal((k, n)), dtype)
    bm = 512
    f = pl.pallas_call(
        functools.partial(_mm_kernel, n_iter=n_iter, out_dtype=out_dtype),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )
    y = jax.jit(f)(x, w)
    return x, w, np.asarray(jax.device_get(y))


def check_exact():
    x, w, y = run(jnp.int8, jnp.int32, n_iter=1)
    ref = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
    assert (y == ref).all(), f"int8 matmul mismatch: {np.abs(y - ref).max()}"
    print("int8 s8xs8->s32 pallas matmul: compiles and exact", flush=True)


def check_attention_style():
    """int8 QK^T-style batched dot + int8 PV shapes (3-D batch dims)."""
    def kern(q_ref, k_ref, o_ref):
        s = jax.lax.dot_general(q_ref[...], k_ref[...],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        o_ref[...] = s

    bn, lq, lk, d = 8, 128, 256, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(-8, 9, (bn, lq, d)), jnp.int8)
    k = jnp.asarray(rng.integers(-8, 9, (bn, lk, d)), jnp.int8)
    y = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, lq, lk), jnp.int32),
    ))(q, k)
    ref = np.einsum("bqd,bkd->bqk", np.asarray(q, np.int32),
                    np.asarray(k, np.int32))
    assert (np.asarray(jax.device_get(y)) == ref).all()
    print("int8 batched QK^T pallas: compiles and exact", flush=True)


def bench():
    n_iter, reps = 32, 20
    for dtype, out_dtype, name in [(jnp.bfloat16, jnp.float32, "bf16"),
                                   (jnp.int8, jnp.int32, "int8")]:
        rng = np.random.default_rng(0)
        m, k, n = 4096, 256, 256
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
            w = jnp.asarray(rng.integers(-4, 5, (k, n)), jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((m, k)), dtype)
            w = jnp.asarray(rng.standard_normal((k, n)), dtype)
        bm = 512
        f = jax.jit(pl.pallas_call(
            functools.partial(_mm_kernel, n_iter=n_iter, out_dtype=out_dtype),
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        ))
        y = f(x, w)
        float(jnp.sum(y.astype(jnp.float32)))  # warm + fence
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(x, w)
        float(jnp.sum(y.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        flops = 2 * m * k * n * n_iter
        print(f"{name}: {dt*1e3:.3f} ms, {flops/dt/1e12:.1f} TOP/s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "compile"
    print("backend:", jax.default_backend(), flush=True)
    if mode == "compile":
        check_exact()
        check_attention_style()
    else:
        check_exact()
        bench()
