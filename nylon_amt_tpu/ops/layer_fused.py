"""Whole-layer fused transformer kernels (Pallas, TPU) — inference path.

At hid_dim 256 the hFT model is **HBM-bandwidth-bound**: a single
``[tokens, 256] x [256, 256]`` projection has arithmetic intensity
~128 FLOP/byte, well under the v5e ridge (~240), so every extra pass over
the activation stream costs real wall-clock. The layer-wise XLA graph
(even with the fused attention kernel of :mod:`nylon_amt_tpu.ops.attention`)
reads/writes the ``[n, L, hid]`` activations ~8x per layer: QKV projections,
attention in/out, O-projection, two residual/LayerNorm passes, and the FFN.

A transformer *layer's weights* at this scale are ~1.3 MB — they fit in VMEM
with room to spare. So the speed-of-light design is one kernel per layer:
stream a block of rows in, run QKV -> per-head attention -> O-projection ->
residual/LN -> FFN -> residual/LN entirely in VMEM, and stream the result
out. HBM traffic per layer drops to one read + one write of the activations
(plus the one-time weight fetch, which Pallas keeps resident across grid
steps because the weight block index never changes).

Three kernels cover the model (reference ``model_spec2midi.py``):

* :func:`encoder_layer` — self-attention block (ref ``EncoderLayer:222-245``),
  used by the frequency encoder (L=256 bins) and the stage-2 time decoder
  (L=128 frames);
* :func:`decoder_layer_zero` — cross-attention-only block
  (ref ``DecoderLayer_Zero:247-272``);
* :func:`decoder_layer` — self+cross block (ref ``DecoderLayer:274-306``).

Semantics preserved exactly as in :mod:`nylon_amt_tpu.models.hft` (post-LN,
ONE LayerNorm instance shared by all residuals of a layer, f32 matmul
accumulation with bf16 storage, f32 LayerNorm statistics). Deterministic
(inference) only — training keeps the per-site fused attention with its
custom VJP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nylon_amt_tpu.ops.attention import _head_attention

_LN_EPS = 1e-6  # flax.linen.LayerNorm default (see models/hft.py)


class EncoderLayerParams(NamedTuple):
    """Weights of one self-attention block, packed for the kernel.

    ``wqkv [hid, 3*hid]`` / ``bqkv [3*hid]`` are the concatenated Q/K/V
    projections (reading the activations once instead of three times),
    ``wo/bo`` the output projection, ``g/b`` the SHARED LayerNorm scale and
    bias (f32), ``w1/b1/w2/b2`` the FFN.
    """

    wqkv: jax.Array
    bqkv: jax.Array
    wo: jax.Array
    bo: jax.Array
    g: jax.Array
    b: jax.Array
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


class CrossLayerParams(NamedTuple):
    """Weights of one cross-attention (decoder) block. ``wsqkv/bsqkv`` are
    the self-attention QKV (absent -> zero-size placeholder for layer_zero),
    ``wso/bso`` its output projection, ``wq/bq`` the cross-attention query,
    ``wkv/bkv`` the packed cross K/V applied to the encoder stream."""

    wsqkv: jax.Array
    bsqkv: jax.Array
    wso: jax.Array
    bso: jax.Array
    wq: jax.Array
    bq: jax.Array
    wkv: jax.Array
    bkv: jax.Array
    wo: jax.Array
    bo: jax.Array
    g: jax.Array
    b: jax.Array
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


def _matmul(x, w, b):
    """bf16-in / f32-accumulate / bf16-out projection with the same rounding
    points as the XLA path (cast to storage dtype BEFORE the bias add)."""
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + b.astype(x.dtype)


def _layer_norm(x, g, b):
    """Post-LN with f32 statistics, output in x.dtype (flax semantics)."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    y = (xf - m) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * g + b).astype(x.dtype)


def _mha_block(q, k, v, n_heads, scale):
    """Per-head fused attention on VMEM blocks ([bn, Lq, hid] layout)."""
    hid = q.shape[-1]
    d = hid // n_heads
    outs = []
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        o, l, _ = _head_attention(q[:, :, sl], k[:, :, sl], v[:, :, sl],
                                  scale)
        outs.append((o / l).astype(q.dtype))
    return jnp.concatenate(outs, axis=-1)


def _self_block(x, wqkv, bqkv, wo, bo, g, b, w1, b1, w2, b2, n_heads, scale):
    """x -> post-LN(x + SelfAttn(x)) -> post-LN(. + FFN(.)), shared LN."""
    hid = x.shape[-1]
    qkv = _matmul(x, wqkv, bqkv)
    q, k, v = (qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:])
    attn = _matmul(_mha_block(q, k, v, n_heads, scale), wo, bo)
    y = _layer_norm(x + attn, g, b)
    ff = _matmul(jnp.maximum(_matmul(y, w1, b1), 0), w2, b2)
    return _layer_norm(y + ff, g, b)


def _cross_tail(trg, enc, wq, bq, wkv, bkv, wo, bo, g, b, w1, b1, w2, b2,
                n_heads, scale):
    """Cross-attention + FFN tail shared by both decoder kernels."""
    hid = trg.shape[-1]
    q = _matmul(trg, wq, bq)
    kv = _matmul(enc, wkv, bkv)
    k, v = kv[:, :, :hid], kv[:, :, hid:]
    attn = _matmul(_mha_block(q, k, v, n_heads, scale), wo, bo)
    y = _layer_norm(trg + attn, g, b)
    ff = _matmul(jnp.maximum(_matmul(y, w1, b1), 0), w2, b2)
    return _layer_norm(y + ff, g, b)


def _enc_kernel(x_ref, wqkv, bqkv, wo, bo, g, b, w1, b1, w2, b2, o_ref, *,
                n_heads, scale):
    o_ref[...] = _self_block(
        x_ref[...], wqkv[...], bqkv[...], wo[...], bo[...], g[...], b[...],
        w1[...], b1[...], w2[...], b2[...], n_heads, scale)


def _dec_zero_kernel(trg_ref, enc_ref, wq, bq, wkv, bkv, wo, bo, g, b,
                     w1, b1, w2, b2, o_ref, *, n_heads, scale):
    o_ref[...] = _cross_tail(
        trg_ref[...], enc_ref[...], wq[...], bq[...], wkv[...], bkv[...],
        wo[...], bo[...], g[...], b[...], w1[...], b1[...], w2[...], b2[...],
        n_heads, scale)


def _dec_kernel(trg_ref, enc_ref, wsqkv, bsqkv, wso, bso, wq, bq, wkv, bkv,
                wo, bo, g, b, w1, b1, w2, b2, o_ref, *, n_heads, scale):
    trg = trg_ref[...]
    hid = trg.shape[-1]
    qkv = _matmul(trg, wsqkv[...], bsqkv[...])
    q, k, v = qkv[:, :, :hid], qkv[:, :, hid:2 * hid], qkv[:, :, 2 * hid:]
    sa = _matmul(_mha_block(q, k, v, n_heads, scale), wso[...], bso[...])
    trg = _layer_norm(trg + sa, g[...], b[...])
    o_ref[...] = _cross_tail(
        trg, enc_ref[...], wq[...], bq[...], wkv[...], bkv[...], wo[...],
        bo[...], g[...], b[...], w1[...], b1[...], w2[...], b2[...],
        n_heads, scale)


def _row_block(n: int, l_bytes_per_row: int, budget_mb: float = 6.0) -> int:
    bn = max(1, int(budget_mb * 1024 * 1024 / l_bytes_per_row))
    while n % bn:
        bn -= 1
    return bn


def _act_blk(bn, *rest):
    return pl.BlockSpec((bn, *rest), lambda i: (i,) + (0,) * len(rest),
                        memory_space=pltpu.VMEM)


def _w_blk(shape):
    """Whole-array weight block pinned at index 0: Pallas skips the re-copy
    between grid steps because the mapped block never changes."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _compiler_params(interpret):
    return None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",))


def _enc_bytes_per_row(l, hid, pf, itemsize):
    # x + qkv + attn-out + ffn-mid (itemsize) + per-head f32 scores, plus
    # in/out double buffering.
    return (l * hid * (2 + 3 + 1 + 2 * 2) * itemsize + l * pf * itemsize
            + l * l * 4)


def encoder_layer(x, p: EncoderLayerParams, n_heads: int,
                  interpret: bool = False):
    """Fused self-attention transformer layer: ``x [n, L, hid] -> [n, L, hid]``.

    Exactly the deterministic forward of ``models.hft.EncoderLayer``
    (ref ``EncoderLayer:222-245``) in one VMEM pass.
    """
    n, l, hid = x.shape
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    bn = _row_block(n, _enc_bytes_per_row(l, hid, pf, x.dtype.itemsize))
    weights = [p.wqkv, p.bqkv, p.wo, p.bo, p.g, p.b, p.w1, p.b1, p.w2, p.b2]
    return pl.pallas_call(
        functools.partial(_enc_kernel, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, l, hid)] + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, l, hid),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x, *weights)


def decoder_layer_zero(trg, enc, p: CrossLayerParams, n_heads: int,
                       interpret: bool = False):
    """Fused cross-attention-only decoder layer
    (ref ``DecoderLayer_Zero:247-272``): ``trg [n, Lq, hid]`` attends to
    ``enc [n, Lk, hid]``."""
    n, lq, hid = trg.shape
    lk = enc.shape[1]
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    per_row = ((lq * hid * 6 + lk * hid * 4 + lq * pf) * trg.dtype.itemsize
               + lq * lk * 4)
    bn = _row_block(n, per_row)
    weights = [p.wq, p.bq, p.wkv, p.bkv, p.wo, p.bo, p.g, p.b,
               p.w1, p.b1, p.w2, p.b2]
    return pl.pallas_call(
        functools.partial(_dec_zero_kernel, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, lq, hid), _act_blk(bn, lk, hid)]
        + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, lq, hid),
        out_shape=jax.ShapeDtypeStruct(trg.shape, trg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(trg, enc, *weights)


def decoder_layer(trg, enc, p: CrossLayerParams, n_heads: int,
                  interpret: bool = False):
    """Fused self+cross decoder layer (ref ``DecoderLayer:274-306``)."""
    n, lq, hid = trg.shape
    lk = enc.shape[1]
    pf = p.w1.shape[1]
    scale = 1.0 / float(hid // n_heads) ** 0.5
    per_row = ((lq * hid * 9 + lk * hid * 4 + lq * pf) * trg.dtype.itemsize
               + max(lq * lk, lq * lq) * 4)
    bn = _row_block(n, per_row)
    weights = [p.wsqkv, p.bsqkv, p.wso, p.bso, p.wq, p.bq, p.wkv, p.bkv,
               p.wo, p.bo, p.g, p.b, p.w1, p.b1, p.w2, p.b2]
    return pl.pallas_call(
        functools.partial(_dec_kernel, n_heads=n_heads, scale=scale),
        grid=(n // bn,),
        in_specs=[_act_blk(bn, lq, hid), _act_blk(bn, lk, hid)]
        + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, lq, hid),
        out_shape=jax.ShapeDtypeStruct(trg.shape, trg.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(trg, enc, *weights)
