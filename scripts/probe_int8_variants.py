"""int8 recipe variants probe: the decision experiment for PERF.md.

PERF.md r2 measured the shipped W8A8 engine (dynamic per-row activation
quant, int8 score/PV attention) 43% SLOWER than bf16 and named two recipe
variants worth trying before demoting the path. This script measures both
against the bf16 fused layer at the inference engine's production shape
(batch 32 -> 4096 rows x L256 x hid256):

* **static** — W8A8 with STATIC activation scales (no per-row absmax, no
  per-row rounding reduction: quantization is one multiply+round per
  element). This upper-bounds any calibration-based recipe: if even free
  scale computation loses to bf16, no static calibration can win.
* **ffn-only** — bf16 attention, int8 only for the two FFN matmuls (the
  largest, squarest matmuls; quantization cost amortized over pf=2*hid
  columns).

Each variant is a self-contained Pallas kernel here (NOT shipped): the
decision is measure-then-delete-or-promote.

Usage: python scripts/probe_int8_variants.py [--rows 4096]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nylon_amt_tpu.ops.layer_fused import (EncoderLayerParams, _act_blk,
                                           _compiler_params, _enc_kernel,
                                           _enc_bytes_per_row, _layer_norm,
                                           _mha_block, _row_block, _w_blk,
                                           encoder_layer)
from nylon_amt_tpu.ops.layer_fused_q8 import (Q8EncoderLayerParams, _qdot,
                                              _mha_block_q8,
                                              encoder_layer_q8,
                                              quantize_encoder_params)

_STATIC_A = 4.0          # static activation absmax (probe: perf only)


def _quant_static(x):
    """Static-scale int8: one mul+round per element, no reductions."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / _STATIC_A)),
                 -127, 127).astype(jnp.int8)
    return q, _STATIC_A / 127.0


def _qlinear_static(x, wq, sw, b, dt):
    xq, sx = _quant_static(x)
    y = _qdot(xq, wq).astype(jnp.float32) * (sx * sw)
    return y.astype(dt) + b.astype(dt)


def _self_block_q8_static(x, wqkv, sqkv, bqkv, wo, so, bo, g, b, w1, s1, b1,
                          w2, s2, b2, n_heads, scale):
    dt = x.dtype
    hid = x.shape[-1]
    qkv = _qlinear_static(x, wqkv, sqkv, bqkv, dt)
    q, k, v = qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:]
    heads = _mha_block_q8(q, k, v, n_heads, scale)
    attn = _qlinear_static(heads, wo, so, bo, dt)
    y = _layer_norm(x + attn, g, b)
    mid = jnp.maximum(_qlinear_static(y, w1, s1, b1, dt), 0)
    ff = _qlinear_static(mid, w2, s2, b2, dt)
    return _layer_norm(y + ff, g, b)


def _self_block_ffn_q8(x, wqkv, bqkv, wo, bo, g, b, w1q, s1, b1, w2q, s2,
                       b2, n_heads, scale):
    """bf16 attention + int8 FFN (dynamic per-row activation quant on the
    two FFN inputs only)."""
    from nylon_amt_tpu.ops.layer_fused import _matmul
    from nylon_amt_tpu.ops.layer_fused_q8 import _qlinear

    dt = x.dtype
    hid = x.shape[-1]
    qkv = _matmul(x, wqkv, bqkv)
    q, k, v = qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:]
    attn = _matmul(_mha_block(q, k, v, n_heads, scale), wo, bo)
    y = _layer_norm(x + attn, g, b)
    mid = jnp.maximum(_qlinear(y, w1q, s1, b1, dt), 0)
    ff = _qlinear(mid, w2q, s2, b2, dt)
    return _layer_norm(y + ff, g, b)


def _kernel_static(x_ref, *refs, n_heads, scale):
    o_ref = refs[-1]
    ws = [r[...] for r in refs[:-1]]
    o_ref[...] = _self_block_q8_static(x_ref[...], *ws, n_heads=n_heads,
                                       scale=scale)


def _kernel_ffn(x_ref, *refs, n_heads, scale):
    o_ref = refs[-1]
    ws = [r[...] for r in refs[:-1]]
    o_ref[...] = _self_block_ffn_q8(x_ref[...], *ws, n_heads=n_heads,
                                    scale=scale)


def _call(kernel, x, weights, n_heads, scale, interpret=False):
    n, l, hid = x.shape
    bn = _row_block(n, _enc_bytes_per_row(l, hid, 512, x.dtype.itemsize))
    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, l, hid)] + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, l, hid),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *weights)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, l, hid, pf, heads = args.rows, 256, 256, 512, 4
    scale = 1.0 / (hid // heads) ** 0.5

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    p = EncoderLayerParams(
        wqkv=arr(hid, 3 * hid), bqkv=arr(3 * hid), wo=arr(hid, hid),
        bo=arr(hid), g=jnp.ones(hid), b=jnp.zeros(hid),
        w1=arr(hid, pf), b1=arr(pf), w2=arr(pf, hid), b2=arr(hid))
    q = quantize_encoder_params(p)
    x = jnp.asarray(rng.standard_normal((n, l, hid)) * 0.3, jnp.bfloat16)
    pb = EncoderLayerParams(*[w.astype(jnp.bfloat16) for w in p])

    # x is a jit ARGUMENT (537 MB at rows=4096 — closed over, it becomes
    # an embedded constant and the remote-compile request 413s)
    variants = {
        "bf16": lambda x: encoder_layer(x, pb, heads,
                                        interpret=args.interpret),
        "q8_dynamic": lambda x: encoder_layer_q8(x, q, heads,
                                                 interpret=args.interpret),
        "q8_static": lambda x: _call(_kernel_static, x, list(q), heads,
                                     scale, args.interpret),
        "q8_ffn_only": lambda x: _call(
            _kernel_ffn, x,
            [pb.wqkv, pb.bqkv, pb.wo, pb.bo, pb.g, pb.b,
             q.w1, q.s1, q.b1, q.w2, q.s2, q.b2],
            heads, scale, args.interpret),
    }

    results = {}
    for name, fn in variants.items():
        try:
            jf = jax.jit(fn)
            y = jf(x); y = jf(x)
            float(jnp.sum(y.reshape(-1)[:1].astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = jf(x)
            float(jnp.sum(y.reshape(-1)[:1].astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[name] = round(ms, 3)
            print(f"{name:<14}{ms:8.3f} ms", flush=True)
        except Exception as e:
            results[name] = f"FAIL: {str(e)[:80]}"
            print(f"{name:<14}FAIL {str(e)[:80]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
