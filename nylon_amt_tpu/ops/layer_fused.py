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
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nylon_amt_tpu.ops.attention import _head_attention

_LN_EPS = 1e-5  # torch nn.LayerNorm default — the reference's eps; models/hft.py pins
# flax LayerNorm to the same value (flax's own default 1e-6 breaks trained-net parity)


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
    # two-pass variance (torch layer_norm semantics): E[x^2]-E[x]^2
    # cancels catastrophically when |mean| >> std; x is already in
    # VMEM so the extra pass is free
    var = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
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


def _stem_embed(spec_ref, kband, beff, pos, *, bn, n_frame, sqrt_hid,
                out_dtype):
    """In-kernel stem + position embedding: the block's ``bn`` frames of the
    VMEM-resident spectrogram -> embedded ``[bn, n_bin, hid]`` activations.

    ``spec_ref`` holds one example's FULL frame-major spectrogram
    ``[1, total_frames, n_bin]`` (a window's spec is ~200 KB — it stays
    resident in VMEM across the grid steps of that example). The 65-tap stem
    convolution for the block's ``bn`` frames is ONE matmul against a
    precomputed banded tap matrix ``kband [n_phase, bn*hid, span]``
    (``kband[p, j*hid + h, p*bn + j + m] = k_eff[m, h]``): Mosaic forbids
    per-frame dynamic sublane slices at arbitrary offsets, and the banded
    contraction needs only one 8-aligned dynamic block load. The f32 conv
    output / transpose / scale+pos intermediates of the XLA stem (~6 ms of
    pure HBM bandwidth at batch 32) never exist here.
    """
    hid = beff.shape[-1]
    base = (pl.program_id(0) % (n_frame // bn)) * bn       # multiple of bn
    # Mosaic requires a provably 8-aligned dynamic sublane offset; blocks
    # narrower than 8 frames load from the aligned floor and select the
    # phase-shifted band instead.
    n_phase = kband.shape[0]
    span = kband.shape[2]
    if n_phase == 1:
        aligned, kb = base, kband[0]
    else:
        aligned = (base // 8) * 8
        phase = (base % 8) // bn
        kb = kband[0]
        for p_i in range(1, n_phase):
            kb = jnp.where(phase == p_i, kband[p_i], kb)
    w = spec_ref[0, pl.ds(aligned, span), :]               # [span, n_bin] f32
    # kb is [bn*hid, span]: the matmul lands frames/hid on the SUBLANE axis
    # so the per-frame fixup is a cheap last-two-dims tile transpose (a
    # leading-axis transpose would be a full cross-sublane relayout).
    e = jax.lax.dot_general(kb, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = e.reshape(bn, hid, w.shape[1])                     # [bn, hid, n_bin]
    # (minor-dim insertion must happen on the 32-bit array — Mosaic
    # restriction on 16-bit relayouts)
    beff_col = beff[...][None, :, None].astype(out_dtype)  # [1, hid, 1]
    xt = e.astype(out_dtype) + beff_col
    xt = xt * jnp.float32(sqrt_hid).astype(out_dtype) + pos[...][None]
    return jnp.swapaxes(xt, 1, 2)                          # [bn, n_bin, hid]


def _enc_stem_kernel(spec_ref, kband, beff, pos, wqkv, bqkv, wo, bo, g, b,
                     w1, b1, w2, b2, o_ref, *, n_heads, scale, bn, n_frame,
                     sqrt_hid, out_dtype):
    """Stem + position embedding + first encoder layer in one kernel
    (see :func:`_stem_embed` for the banded-stem mechanics)."""
    x = _stem_embed(spec_ref, kband, beff, pos, bn=bn, n_frame=n_frame,
                    sqrt_hid=sqrt_hid, out_dtype=out_dtype)
    o_ref[...] = _self_block(
        x, wqkv[...], bqkv[...], wo[...], bo[...], g[...], b[...],
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


_BLOCK_BUDGET_MB = 8.0  # VMEM scratch target per grid program (of ~16 MB)


def _row_block(n: int, l_bytes_per_row: int,
               budget_mb: float | None = None) -> int:
    """Rows per grid program: the largest power-of-two divisor of ``n``
    within the VMEM budget (power-of-two blocks keep the matmul M-dims
    MXU-aligned; odd divisors of 4096 would otherwise fall through to
    degenerate bn=2/3 blocks).

    ``NYLON_BLOCK_BUDGET_MB`` overrides the default budget — the knob the
    block-tuning ladder (``scripts/bench_train_stages.py``) sweeps.
    """
    if budget_mb is None:
        budget_mb = float(os.environ.get("NYLON_BLOCK_BUDGET_MB", 0)) \
            or _BLOCK_BUDGET_MB
    budget = budget_mb * 1024 * 1024
    cap = max(1, int(budget / l_bytes_per_row))
    bn = 1
    while bn * 2 <= cap and n % (bn * 2) == 0:
        bn *= 2
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


def stem_block_rows(n: int, n_frame: int, n_bin: int, hid: int, pf: int,
                    itemsize: int) -> int:
    """Block size for :func:`encoder_layer_with_stem`; the Mosaic-provable
    aligned dynamic load needs ``bn`` to be a multiple of 8 and to divide
    ``n_frame`` (callers fall back to the XLA stem when impossible)."""
    bn = _row_block(n, _enc_bytes_per_row(n_bin, hid, pf, itemsize))
    bn = min(bn, n_frame)
    while n_frame % bn:
        bn -= 1
    return bn


def build_stem_kband(keff, bn: int, n_frame: int, total: int):
    """Banded tap matrices for the in-kernel stem, one per 8-alignment
    phase: with the block's frames starting ``phase*bn`` rows into the
    aligned load, ``kband[p, j*hid + h, phase*bn + j + m] = keff[m, h]`` —
    the stem contraction is one matmul against the selected band (transposed
    so frames/hid land on the matmul's M axis; see the kernel docstring).
    Raises ValueError for geometries the aligned loads cannot cover."""
    n_proc, hid = keff.shape
    if bn % 8 and 8 % bn:
        raise ValueError(f"stem block rows {bn} incompatible with 8-aligned "
                         "loads; use the XLA stem path")
    n_phase = 1 if bn % 8 == 0 else 8 // bn
    span = (8 - bn if bn < 8 else 0) + bn + n_proc - 1
    span += (-span) % 8
    aligned_max = ((n_frame - bn) // 8) * 8 if n_phase > 1 else n_frame - bn
    if aligned_max + span > total:
        raise ValueError("spec too short for aligned stem loads; "
                         "use the XLA stem path")
    t = jnp.arange(span)[:, None, None]                   # [span, 1, 1]
    j = jnp.arange(bn)[None, :, None]                     # [1, bn, 1]
    ph = jnp.arange(n_phase)[None, None, :]               # [1, 1, n_phase]
    m = t - j - ph * bn                                   # [span, bn, n_phase]
    band = jnp.where(((m >= 0) & (m < n_proc))[..., None],
                     keff[jnp.clip(m, 0, n_proc - 1)], 0.0)
    return band.transpose(2, 1, 3, 0).reshape(n_phase, bn * hid, span)


def encoder_layer_with_stem(spec_t, keff, beff, pos, p: EncoderLayerParams,
                            n_heads: int, n_frame: int, out_dtype,
                            interpret: bool = False):
    """Fused stem + pos-embedding + first encoder layer.

    ``spec_t [B, total_frames, n_bin]`` (frame-major f32 log-mel),
    ``keff [n_proc, hid]`` / ``beff [hid]`` the collapsed 65-tap stem kernel
    (see ``models.hft.fused_stem``), ``pos [n_bin, hid]`` the frequency
    position embedding. Returns ``[B*n_frame, n_bin, hid]`` — the output of
    ``encoder_layer`` applied to the embedded spectrogram.
    """
    B, total, n_bin = spec_t.shape
    n_proc, hid = keff.shape
    pf = p.w1.shape[1]
    n = B * n_frame
    scale = 1.0 / float(hid // n_heads) ** 0.5
    bn = stem_block_rows(n, n_frame, n_bin, hid, pf,
                         jnp.dtype(out_dtype).itemsize)
    kband = build_stem_kband(keff, bn, n_frame, total)
    sqrt_hid = float(hid) ** 0.5         # static: rounded in-kernel
    weights = [p.wqkv, p.bqkv, p.wo, p.bo, p.g, p.b, p.w1, p.b1, p.w2, p.b2]
    pos_t = pos.T                                         # [hid, n_bin]
    spec_spec = pl.BlockSpec((1, total, n_bin),
                             lambda i: ((i * bn) // n_frame, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_enc_stem_kernel, n_heads=n_heads, scale=scale,
                          bn=bn, n_frame=n_frame, sqrt_hid=sqrt_hid,
                          out_dtype=out_dtype),
        grid=(n // bn,),
        in_specs=[spec_spec, _w_blk(kband.shape), _w_blk(beff.shape),
                  _w_blk(pos_t.shape)]
        + [_w_blk(w.shape) for w in weights],
        out_specs=_act_blk(bn, n_bin, hid),
        out_shape=jax.ShapeDtypeStruct((n, n_bin, hid), out_dtype),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(spec_t, kband, beff, pos_t, *weights)


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
