"""int8 (W8A8) variants of the whole-layer fused inference kernels.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), and the model's
matmuls dominate the fused-layer step (PERF.md per-stage table), so an int8
compute path buys real wall-clock even though weights are already
VMEM-resident. Everything non-matmul keeps the bf16 path's numerics:
LayerNorm statistics in f32, softmax in f32, residuals in the compute dtype.

Quantization scheme (symmetric, zero-point-free everywhere):

* **Weights**: per-output-channel int8, scales precomputed at pack time
  (:func:`quantize_weight`) — the standard W8 recipe; the channel scale
  factors out of the contraction exactly.
* **Activations**: dynamic per-row int8 (one scale per [token] row,
  computed in-kernel off the row absmax). Rows are the matmul M axis, so
  the scale factors out exactly; the quantization error is the only
  approximation (~0.4% RMS per matmul at 127 levels).
* **Attention**: Q and K quantized per row (key-row scales need one small
  sublane->lane transpose per block, shared across heads); scores are
  dequantized to f32 BEFORE the softmax (key scales vary within a row, so
  they must be applied pre-softmax); probabilities re-quantize with the
  static scale 127 (exp2(s - max) <= 1 by construction); V quantizes
  per COLUMN (the scale rides the output lane axis, no transpose).

This is inference-only by design: training keeps full bf16/f32 gradients
(quantized training would change the recipe the parity tests pin).
Reference semantics being matched are the same as
:mod:`nylon_amt_tpu.ops.layer_fused` (``model_spec2midi.py:222-378``);
the int8 path is a documented approximation of them, gated behind
``precision="int8"`` and validated against the bf16 engine in
``tests/test_engine_q8.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nylon_amt_tpu.ops.layer_fused import (
    CrossLayerParams,
    EncoderLayerParams,
    _act_blk,
    _compiler_params,
    _enc_bytes_per_row,
    _layer_norm,
    _row_block,
    _stem_embed,
    _w_blk,
    build_stem_kband,
    stem_block_rows,
)

_LOG2E = 1.4426950408889634


class Q8EncoderLayerParams(NamedTuple):
    """int8 weights + f32 per-output-channel scales of one self-attention
    block. Biases/LN stay in higher precision (added after dequant)."""

    wqkv: jax.Array   # int8 [hid, 3*hid]
    sqkv: jax.Array   # f32  [1, 3*hid]
    bqkv: jax.Array
    wo: jax.Array
    so: jax.Array
    bo: jax.Array
    g: jax.Array
    b: jax.Array
    w1: jax.Array
    s1: jax.Array
    b1: jax.Array
    w2: jax.Array
    s2: jax.Array
    b2: jax.Array


class Q8CrossLayerParams(NamedTuple):
    wsqkv: jax.Array
    ssqkv: jax.Array
    bsqkv: jax.Array
    wso: jax.Array
    sso: jax.Array
    bso: jax.Array
    wq: jax.Array
    sq: jax.Array
    bq: jax.Array
    wkv: jax.Array
    skv: jax.Array
    bkv: jax.Array
    wo: jax.Array
    so: jax.Array
    bo: jax.Array
    g: jax.Array
    b: jax.Array
    w1: jax.Array
    s1: jax.Array
    b1: jax.Array
    w2: jax.Array
    s2: jax.Array
    b2: jax.Array


def quantize_weight(w):
    """``w [k, n]`` -> (int8 ``[k, n]``, f32 scales ``[1, n]``) with
    symmetric per-output-channel quantization (``w ~= wq * s``)."""
    wf = jnp.asarray(w, jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.maximum(a, 1e-30) / 127.0
    q = jnp.round(wf / s).astype(jnp.int8)
    return q, s


def quantize_encoder_params(p: EncoderLayerParams) -> Q8EncoderLayerParams:
    wqkv, sqkv = quantize_weight(p.wqkv)
    wo, so = quantize_weight(p.wo)
    w1, s1 = quantize_weight(p.w1)
    w2, s2 = quantize_weight(p.w2)
    return Q8EncoderLayerParams(
        wqkv=wqkv, sqkv=sqkv, bqkv=p.bqkv, wo=wo, so=so, bo=p.bo,
        g=p.g, b=p.b, w1=w1, s1=s1, b1=p.b1, w2=w2, s2=s2, b2=p.b2)


def quantize_cross_params(p: CrossLayerParams) -> Q8CrossLayerParams:
    wsqkv, ssqkv = quantize_weight(p.wsqkv)
    wso, sso = quantize_weight(p.wso)
    wq, sq = quantize_weight(p.wq)
    wkv, skv = quantize_weight(p.wkv)
    wo, so = quantize_weight(p.wo)
    w1, s1 = quantize_weight(p.w1)
    w2, s2 = quantize_weight(p.w2)
    return Q8CrossLayerParams(
        wsqkv=wsqkv, ssqkv=ssqkv, bsqkv=p.bsqkv, wso=wso, sso=sso, bso=p.bso,
        wq=wq, sq=sq, bq=p.bq, wkv=wkv, skv=skv, bkv=p.bkv,
        wo=wo, so=so, bo=p.bo, g=p.g, b=p.b,
        w1=w1, s1=s1, b1=p.b1, w2=w2, s2=s2, b2=p.b2)


# ---------------------------------------------------------------------------
# in-kernel quantized math
# ---------------------------------------------------------------------------

def _quant_rows(x):
    """Dynamic per-row symmetric int8: ``x [..., L, K]`` ->
    (int8 same shape, f32 dequant scale ``[..., L, 1]``)."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    q = jnp.round(xf * (127.0 / a)).astype(jnp.int32).astype(jnp.int8)
    return q, a * (1.0 / 127.0)


def _qdot(xq, wq):
    """s8 x s8 -> s32 over the last/first axes (the MXU int8 path)."""
    return jax.lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _qlinear_pre(xq, sx, wq, sw, b, dt):
    """int8 activation rows x int8 weight -> compute-dtype output with the
    bf16 path's rounding convention (cast to ``dt`` BEFORE the bias add)."""
    y = _qdot(xq, wq).astype(jnp.float32) * sx * sw
    return y.astype(dt) + b.astype(dt)


def _qlinear(x, wq, sw, b, dt):
    xq, sx = _quant_rows(x)
    return _qlinear_pre(xq, sx, wq, sw, b, dt)


def _mha_block_q8(q, k, v, n_heads, scale):
    """Per-head one-pass attention with int8 score and PV matmuls.

    ``q [bn, Lq, hid]``, ``k/v [bn, Lk, hid]`` in the compute dtype. Row
    scales for Q/K are shared across heads (absmax over the full hid axis);
    V is quantized per column so its scale rides the output lanes.
    """
    dt = q.dtype
    hid = q.shape[-1]
    d = hid // n_heads
    qq, sq = _quant_rows(q)                       # [bn, Lq, hid], [bn, Lq, 1]
    kq, sk = _quant_rows(k)                       # [bn, Lk, hid], [bn, Lk, 1]
    sk_t = jnp.swapaxes(sk, 1, 2)                 # [bn, 1, Lk] (one relayout)
    vf = v.astype(jnp.float32)
    av = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-12)
    vq = jnp.round(vf * (127.0 / av)).astype(jnp.int32).astype(jnp.int8)
    sv = av * (1.0 / (127.0 * 127.0))             # folds P's static 1/127
    outs = []
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        s_i = jax.lax.dot_general(qq[:, :, sl], kq[:, :, sl],
                                  (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        s = s_i.astype(jnp.float32) * (sq * (scale * _LOG2E)) * sk_t
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)                       # (0, 1] by construction
        l = jnp.sum(p, axis=-1, keepdims=True)
        pq = jnp.round(p * 127.0).astype(jnp.int32).astype(jnp.int8)
        o = jax.lax.dot_general(pq, vq[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        o = o.astype(jnp.float32) * sv[:, :, sl]
        outs.append((o / l).astype(dt))
    return jnp.concatenate(outs, axis=-1)


def _self_block_q8(x, wqkv, sqkv, bqkv, wo, so, bo, g, b, w1, s1, b1,
                   w2, s2, b2, n_heads, scale):
    """Quantized twin of ``layer_fused._self_block`` (same LN/residual
    structure, int8 matmuls)."""
    dt = x.dtype
    hid = x.shape[-1]
    qkv = _qlinear(x, wqkv, sqkv, bqkv, dt)
    q, k, v = (qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:])
    heads = _mha_block_q8(q, k, v, n_heads, scale)
    attn = _qlinear(heads, wo, so, bo, dt)
    y = _layer_norm(x + attn, g, b)
    mid = jnp.maximum(_qlinear(y, w1, s1, b1, dt), 0)
    ff = _qlinear(mid, w2, s2, b2, dt)
    return _layer_norm(y + ff, g, b)


def _cross_tail_q8(trg, enc, wq, sq, bq, wkv, skv, bkv, wo, so, bo, g, b,
                   w1, s1, b1, w2, s2, b2, n_heads, scale):
    dt = trg.dtype
    hid = trg.shape[-1]
    q = _qlinear(trg, wq, sq, bq, dt)
    kv = _qlinear(enc, wkv, skv, bkv, dt)
    k, v = kv[:, :, :hid], kv[:, :, hid:]
    heads = _mha_block_q8(q, k, v, n_heads, scale)
    attn = _qlinear(heads, wo, so, bo, dt)
    y = _layer_norm(trg + attn, g, b)
    mid = jnp.maximum(_qlinear(y, w1, s1, b1, dt), 0)
    ff = _qlinear(mid, w2, s2, b2, dt)
    return _layer_norm(y + ff, g, b)


# ---------------------------------------------------------------------------
# kernels + entry points (same grid/BlockSpec scaffolding as layer_fused)
# ---------------------------------------------------------------------------

def _enc_kernel_q8(x_ref, *refs, n_heads, scale):
    o_ref = refs[-1]
    o_ref[...] = _self_block_q8(
        x_ref[...], *[r[...] for r in refs[:-1]], n_heads=n_heads,
        scale=scale)


def _enc_stem_kernel_q8(spec_ref, kband, beff, pos, *refs, n_heads, scale,
                        bn, n_frame, sqrt_hid, out_dtype):
    o_ref = refs[-1]
    x = _stem_embed(spec_ref, kband, beff, pos, bn=bn, n_frame=n_frame,
                    sqrt_hid=sqrt_hid, out_dtype=out_dtype)
    o_ref[...] = _self_block_q8(
        x, *[r[...] for r in refs[:-1]], n_heads=n_heads, scale=scale)


def _dec_zero_kernel_q8(trg_ref, enc_ref, *refs, n_heads, scale):
    o_ref = refs[-1]
    o_ref[...] = _cross_tail_q8(
        trg_ref[...], enc_ref[...], *[r[...] for r in refs[:-1]],
        n_heads=n_heads, scale=scale)


def _dec_kernel_q8(trg_ref, enc_ref, wsqkv, ssqkv, bsqkv, wso, sso, bso,
                   *refs, n_heads, scale):
    o_ref = refs[-1]
    trg = trg_ref[...]
    hid = trg.shape[-1]
    dt = trg.dtype
    qkv = _qlinear(trg, wsqkv[...], ssqkv[...], bsqkv[...], dt)
    q, k, v = qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:]
    sa = _qlinear(_mha_block_q8(q, k, v, n_heads, scale), wso[...], sso[...],
                  bso[...], dt)
    g, b = refs[9], refs[10]     # refs: wq sq bq wkv skv bkv wo so bo g b ...
    trg = _layer_norm(trg + sa, g[...], b[...])
    o_ref[...] = _cross_tail_q8(
        trg, enc_ref[...], *[r[...] for r in refs[:-1]], n_heads=n_heads,
        scale=scale)


def _q8_extra_bytes(l, hid, pf):
    # int8 copies of activations/qkv/mid + f32 row scales, rough upper bound
    return l * (hid * 5 + pf) + 6 * l * 4


def encoder_layer_q8(x, p: Q8EncoderLayerParams, n_heads: int,
                     interpret: bool = False):
    """int8 fused self-attention layer: ``x [n, L, hid] -> [n, L, hid]``."""
    n, l, hid = x.shape
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    bn = _row_block(n, _enc_bytes_per_row(l, hid, pf, x.dtype.itemsize)
                    + _q8_extra_bytes(l, hid, pf))
    weights = list(p)
    return pl.pallas_call(
        functools.partial(_enc_kernel_q8, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, l, hid)] + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, l, hid),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *weights)


def encoder_layer_with_stem_q8(spec_t, keff, beff, pos,
                               p: Q8EncoderLayerParams, n_heads: int,
                               n_frame: int, out_dtype,
                               interpret: bool = False):
    """Fused f32 banded stem + pos embedding + int8 first encoder layer
    (the stem matmul stays f32 — it is ~3% of the step and sets the
    activation scale for everything downstream)."""
    B, total, n_bin = spec_t.shape
    n_proc, hid = keff.shape
    pf = p.w1.shape[1]
    n = B * n_frame
    scale = 1.0 / float(hid // n_heads) ** 0.5
    bn = stem_block_rows(n, n_frame, n_bin, hid, pf,
                         jnp.dtype(out_dtype).itemsize)
    kband = build_stem_kband(keff, bn, n_frame, total)
    sqrt_hid = float(hid) ** 0.5
    weights = list(p)
    pos_t = pos.T
    spec_spec = pl.BlockSpec((1, total, n_bin),
                             lambda i: ((i * bn) // n_frame, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_enc_stem_kernel_q8, n_heads=n_heads, scale=scale,
                          bn=bn, n_frame=n_frame, sqrt_hid=sqrt_hid,
                          out_dtype=out_dtype),
        grid=(n // bn,),
        in_specs=[spec_spec, _w_blk(kband.shape), _w_blk(beff.shape),
                  _w_blk(pos_t.shape)] + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, n_bin, hid),
        out_shape=jax.ShapeDtypeStruct((n, n_bin, hid), out_dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(spec_t, kband, beff, pos_t, *weights)


def decoder_layer_zero_q8(trg, enc, p: Q8CrossLayerParams, n_heads: int,
                          interpret: bool = False):
    """int8 cross-attention-only decoder layer."""
    n, lq, hid = trg.shape
    lk = enc.shape[1]
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    per_row = ((lq * hid * 6 + lk * hid * 4 + lq * pf) * trg.dtype.itemsize
               + lq * lk * 4 + _q8_extra_bytes(max(lq, lk), hid, pf))
    bn = _row_block(n, per_row)
    weights = list(p)[6:]            # cross weights only (no self prologue)
    return pl.pallas_call(
        functools.partial(_dec_zero_kernel_q8, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, lq, hid), _act_blk(bn, lk, hid)]
        + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, lq, hid),
        out_shape=jax.ShapeDtypeStruct(trg.shape, trg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(trg, enc, *weights)


def decoder_layer_q8(trg, enc, p: Q8CrossLayerParams, n_heads: int,
                     interpret: bool = False):
    """int8 self+cross decoder layer."""
    n, lq, hid = trg.shape
    lk = enc.shape[1]
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    per_row = ((lq * hid * 9 + lk * hid * 4 + lq * pf) * trg.dtype.itemsize
               + max(lq * lk, lq * lq) * 4
               + _q8_extra_bytes(max(lq, lk), hid, pf))
    bn = _row_block(n, per_row)
    weights = list(p)
    return pl.pallas_call(
        functools.partial(_dec_kernel_q8, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, lq, hid), _act_blk(bn, lk, hid)]
        + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, lq, hid),
        out_shape=jax.ShapeDtypeStruct(trg.shape, trg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(trg, enc, *weights)
