"""Fused multi-head attention kernels (Pallas, TPU).

The hFT model's three attention sites have short sequences (frequency axis
256, note queries 88, time axis 128) but huge batch axes (windows x frames or
windows x notes). The XLA path materializes the ``[batch, heads, Lq, Lk]``
score/probability tensors in HBM — at paper scale that is ~39 GB of traffic
per 32-window forward and dominates the runtime (HBM-bound).

Because every K/V sequence fits in VMEM whole, the optimal TPU kernel is a
**one-pass fused attention** (no online-softmax streaming needed). Layout is
the key design decision: the kernel consumes Q/K/V in the **flat
``[N, L, n_heads * head_dim]`` layout that the projection matmuls naturally
produce**, and splits heads by lane-slicing inside the kernel. Folding heads
into the batch dimension outside the kernel (the classic flash-attention
layout) costs four HBM-round-trip transposes per attention call — measured
to cost more than the fused kernel saves at these shapes. Per grid program:
a block of N-rows is DMA'd once; for each head, ``S = QK^T * scale`` (MXU,
bf16 in / f32 accumulate), a stable base-2 softmax with **deferred
normalization** (the 1/l divide is applied to the ``[Lq, D]`` output instead
of the ``[Lq, Lk]`` probabilities — the softmax is VPU-bound at D=64), and
``O = P V``. Scores never touch HBM.

A custom VJP recomputes ``P`` in-kernel (cheap at these sizes) and produces
``dQ, dK, dV`` in one backward kernel, so training takes the same fused path.
Dropout-on-probabilities (used by the reference during training) is fused
too (``fused_mha_dropout``): masks are pure hashes of the global element
index (:func:`hash_keep_mask`), so the backward regenerates them exactly
regardless of compiled layout or grid — the stateful Pallas PRNG cannot
guarantee that across two kernel binaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _pick_block_rows(n: int, lq: int, lk: int, hid: int,
                     itemsize: int = 2, budget_mb: float = 4.0) -> int:
    """N-rows per grid program, sized to a VMEM budget (with double
    buffering and f32 score scratch in mind)."""
    bytes_per_row = itemsize * (2 * lq * hid + 2 * lk * hid) + 2 * 4 * lq * lk
    bn = max(1, int(budget_mb * 1024 * 1024 / bytes_per_row))
    while n % bn:
        bn -= 1
    return bn


def hash_keep_mask(seed, tag, row0, shape, rate, dtype=jnp.float32):
    """Layout-independent dropout keep-mask (scaled by 1/(1-rate)).

    ``pltpu.prng_random_bits`` output depends on the compiled vector layout,
    which can differ between the forward and backward kernel binaries even
    for identical seeds and shapes — regenerated masks then silently
    disagree and gradients are wrong. Instead the mask is a pure function
    of the GLOBAL element index ``(row0+r)*d1*d2 + c1*d2 + c2``, mixed with
    the caller's seed and a per-site tag. Identical in any kernel, any
    grid, any layout (and available in interpret mode on CPU).

    VPU cost is the point (the mask streams are regenerated in both the
    forward and backward kernels at ~6 sites/layer): the linear index is
    built from TWO iotas on the collapsed ``(n*d1, d2)`` view, and the
    finalizer is xorshift-mult-xorshift-mult (lowbias32 without the final
    low-bit xorshift — the ``>= threshold`` compare weighs high bits, which
    the last multiply already avalanches). ~11 VPU ops/element vs ~17 for
    the r2-r4 murmur3 finalizer; keep-rate, site decorrelation, and
    unbiasedness are pinned by the same tests.

    ``dtype`` selects the mask dtype — activation sites pass bf16 so the
    scale lands directly in compute dtype (one select instead of
    bool->f32->mul->bf16).

    Matches inverted-dropout semantics on the attention weights (the
    reference's ``dropout(attention)`` — ``model_spec2midi.py:348``).
    """
    n, d1, d2 = shape
    # pack only when the halves land on full 128-lane tiles: the final
    # concat is then a free tile-aligned placement (a misaligned lane
    # concat would cost the shuffle the packing saves)
    pack = d2 % 256 == 0
    w = d2 // 2 if pack else d2
    flat = (n * d1, w)
    r = jax.lax.broadcasted_iota(jnp.int32, flat, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, flat, 1)
    base = (row0 * d1 * w).astype(jnp.uint32) if hasattr(row0, "astype") \
        else jnp.uint32((row0 * d1 * w) & 0xFFFFFFFF)
    lin = (r * w + c).astype(jnp.uint32) + base
    x = lin ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)) \
        ^ jnp.uint32((tag * 0x85EBCA6B) & 0xFFFFFFFF)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)

    def select(v, threshold, inv):
        # select in f32 (the i1 compare result lives in 32-bit lane layout;
        # Mosaic cannot relayout it for a 16-bit select), then cast
        keep = jnp.where(v >= threshold, jnp.float32(inv), jnp.float32(0.0))
        return keep if dtype == jnp.float32 else keep.astype(dtype)

    if not pack:
        threshold = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
        return select(x, threshold, 1.0 / (1.0 - rate)).reshape(shape)
    # packed: each 32-bit hash yields TWO 16-bit draws; element (r, c) of a
    # row takes half c // (d2/2) of hash (r, c % (d2/2)) — the two halves
    # fill concatenated lane blocks (no lane interleave, which Mosaic would
    # have to shuffle). Rate is quantized to 1/65536 (0.1 -> 0.1000061);
    # the keep scale inverts the QUANTIZED rate, so the mask stays exactly
    # unbiased.
    t16 = min(max(int(round(rate * 65536)), 1), 65535)
    inv = 65536.0 / (65536.0 - t16)
    threshold = jnp.uint32(t16)
    lo = x & jnp.uint32(0xFFFF)
    hi = jax.lax.shift_right_logical(x, jnp.uint32(16))
    keep = jnp.concatenate([select(lo, threshold, inv),
                            select(hi, threshold, inv)], axis=-1)
    return keep.reshape(shape)


def _head_attention(qh, kh, vh, scale):
    """One head's fused attention on VMEM blocks; returns (o_f32, l, p)."""
    s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (scale * _LOG2E)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(qh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return o, l, p


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads, p_ref=None):
    head_dim = q_ref.shape[-1] // n_heads
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o, l, p = _head_attention(q_ref[:, :, sl], k_ref[:, :, sl],
                                  v_ref[:, :, sl], scale)
        o_ref[:, :, sl] = (o / l).astype(o_ref.dtype)
        if p_ref is not None:
            p_ref[:, h, :, :] = (p / l).astype(p_ref.dtype)


def _fwd_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                        n_heads, rate):
    """Forward with dropout applied to the normalized attention weights.

    Normalization (l) is computed BEFORE dropout, as torch does; the
    backward kernel regenerates the identical masks by construction (pure
    global-index hashes — see :func:`hash_keep_mask`).
    """
    head_dim = q_ref.shape[-1] // n_heads
    dt = q_ref.dtype
    seed = seed_ref[0, 0]
    row0 = pl.program_id(0) * q_ref.shape[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (scale * _LOG2E)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pd = p * hash_keep_mask(seed, h, row0, p.shape, rate)
        o = jax.lax.dot_general(pd.astype(dt), vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = (o / l).astype(o_ref.dtype)


def _bwd_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, dq_ref,
                        dk_ref, dv_ref, *, scale, n_heads, rate):
    head_dim = q_ref.shape[-1] // n_heads
    seed = seed_ref[0, 0]
    row0 = pl.program_id(0) * q_ref.shape[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q, k, v = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        do = do_ref[:, :, sl]
        dt = q.dtype
        _, l, p = _head_attention(q, k, v, scale)
        a = p / l                                   # normalized weights
        d = hash_keep_mask(seed, h, row0, a.shape, rate)  # same as forward
        ad = a * d
        dv = jax.lax.dot_general(ad.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * d
        row = jnp.sum(da * a, axis=-1, keepdims=True)
        ds = (a * (da - row)).astype(dt)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, n_heads):
    head_dim = q_ref.shape[-1] // n_heads
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q, k, v = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        do = do_ref[:, :, sl]
        dt = q.dtype
        _, l, p = _head_attention(q, k, v, scale)
        p = p / l
        # dP = dO @ V^T ; dS = P * (dP - rowsum(dP * P))
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(dt)
        pt = p.astype(dt)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(pt, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _blk(bn, *rest):
    return pl.BlockSpec((bn, *rest), lambda i: (i,) + (0,) * len(rest),
                        memory_space=pltpu.VMEM)


def _params(interpret):
    return None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel",))


def _fused_fwd(q, k, v, scale, n_heads, return_probs, interpret):
    n, lq, hid = q.shape
    lk = k.shape[1]
    bn = _pick_block_rows(n, lq, lk, hid, q.dtype.itemsize)
    out_shape = [jax.ShapeDtypeStruct((n, lq, hid), q.dtype)]
    out_specs = [_blk(bn, lq, hid)]
    if return_probs:
        out_shape.append(jax.ShapeDtypeStruct((n, n_heads, lq, lk),
                                              jnp.float32))
        out_specs.append(_blk(bn, n_heads, lq, lk))

    def kernel(qr, kr, vr, orf, *rest):
        _fwd_kernel(qr, kr, vr, orf, scale=scale, n_heads=n_heads,
                    p_ref=rest[0] if rest else None)

    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[_blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid)],
        out_specs=out_specs if return_probs else out_specs[0],
        out_shape=out_shape if return_probs else out_shape[0],
        interpret=interpret,
        compiler_params=_params(interpret),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha(q, k, v, n_heads: int, scale: float, interpret: bool = False):
    """Fused MHA on flat layouts: ``q [N, Lq, H*D]``, ``k/v [N, Lk, H*D]``
    -> ``[N, Lq, H*D]``."""
    return _fused_fwd(q, k, v, scale, n_heads, False, interpret)


def _mha_fwd(q, k, v, n_heads, scale, interpret):
    return _fused_fwd(q, k, v, scale, n_heads, False, interpret), (q, k, v)


def _mha_bwd(n_heads, scale, interpret, res, do):
    q, k, v = res
    n, lq, hid = q.shape
    lk = k.shape[1]
    # the backward body keeps p/dp/ds/da alive simultaneously: smaller blocks
    bn = _pick_block_rows(n, lq, lk, hid, q.dtype.itemsize, budget_mb=1.5)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_heads=n_heads),
        grid=(n // bn,),
        in_specs=[_blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid),
                  _blk(bn, lq, hid)],
        out_specs=[_blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid)],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        interpret=interpret,
        compiler_params=_params(interpret),
    )(q, k, v, do)
    return dq, dk, dv


fused_mha.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha_with_probs(q, k, v, n_heads: int, scale: float,
                         interpret: bool = False):
    """Variant that also returns the probabilities ``[N, H, Lq, Lk]``
    (the model returns the last cross-attention map — reference
    ``model_spec2midi.py:164-165``).

    Fully differentiable: the output's cotangent takes the same fused
    backward kernel as :func:`fused_mha`; the probabilities' cotangent is
    usually a symbolic zero (losses don't touch the returned maps) and then
    costs nothing — when it is non-zero, its softmax-backward contribution
    is added via plain XLA ops on the recomputed scores.
    """
    return _fused_fwd(q, k, v, scale, n_heads, True, interpret)


def _mha_probs_fwd(q, k, v, n_heads, scale, interpret):
    q, k, v = q.value, k.value, v.value  # symbolic_zeros wraps primals
    out, p = _fused_fwd(q, k, v, scale, n_heads, True, interpret)
    return (out, p), (q, k, v)


def _probs_cotangent_contribution(q, k, dp, n_heads, scale):
    """Gradient of ``A = softmax(QK^T * scale)`` wrt q/k given ``dA`` —
    XLA ops on the recomputed scores (only paid when a loss actually
    differentiates through the returned attention maps)."""
    n, lq, hid = q.shape
    lk = k.shape[1]
    d = hid // n_heads
    qh = q.reshape(n, lq, n_heads, d)
    kh = k.reshape(n, lk, n_heads, d)
    s = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    a = jax.nn.softmax(s, axis=-1)
    dp = dp.astype(jnp.float32)
    row = jnp.sum(dp * a, axis=-1, keepdims=True)
    ds = (a * (dp - row)) * scale
    dq = jnp.einsum("nhqk,nkhd->nqhd", ds, kh.astype(jnp.float32))
    dk = jnp.einsum("nhqk,nqhd->nkhd", ds, qh.astype(jnp.float32))
    return (dq.reshape(n, lq, hid).astype(q.dtype),
            dk.reshape(n, lk, hid).astype(k.dtype))


def _mha_probs_bwd(n_heads, scale, interpret, res, cts):
    q, k, v = res
    do, dp = cts
    if isinstance(do, jax.custom_derivatives.SymbolicZero):
        dq, dk, dv = jnp.zeros_like(q), jnp.zeros_like(k), jnp.zeros_like(v)
    else:
        dq, dk, dv = _mha_bwd(n_heads, scale, interpret, (q, k, v), do)
    if not isinstance(dp, jax.custom_derivatives.SymbolicZero):
        dq2, dk2 = _probs_cotangent_contribution(q, k, dp, n_heads, scale)
        dq, dk = dq + dq2, dk + dk2
    return dq, dk, dv


fused_mha_with_probs.defvjp(_mha_probs_fwd, _mha_probs_bwd,
                            symbolic_zeros=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mha_dropout(q, k, v, n_heads: int, scale: float, rate: float,
                      interpret: bool, seed):
    """Fused MHA with in-kernel dropout on the attention weights.

    ``seed`` is an int32 scalar array; forward and backward regenerate the
    identical per-(program, head) PRNG streams, so no mask is materialized.
    RNG differs from the torch path (different generator) — dropout
    realizations are random either way.
    """
    return _dropout_call(q, k, v, n_heads, scale, rate, interpret, seed)


def _dropout_specs(bn, lq, lk, hid):
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    return seed_spec


def _dropout_call(q, k, v, n_heads, scale, rate, interpret, seed):
    n, lq, hid = q.shape
    lk = k.shape[1]
    bn = _pick_block_rows(n, lq, lk, hid, q.dtype.itemsize)
    seed2d = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_fwd_dropout_kernel, scale=scale, n_heads=n_heads,
                          rate=rate),
        grid=(n // bn,),
        in_specs=[_dropout_specs(bn, lq, lk, hid),
                  _blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid)],
        out_specs=_blk(bn, lq, hid),
        out_shape=jax.ShapeDtypeStruct((n, lq, hid), q.dtype),
        interpret=interpret,
        compiler_params=_params(interpret),
    )(seed2d, q, k, v)


def _mha_drop_fwd(q, k, v, n_heads, scale, rate, interpret, seed):
    return _dropout_call(q, k, v, n_heads, scale, rate, interpret, seed), \
        (q, k, v, seed)


def _mha_drop_bwd(n_heads, scale, rate, interpret, res, do):
    q, k, v, seed = res
    n, lq, hid = q.shape
    lk = k.shape[1]
    bn = _pick_block_rows(n, lq, lk, hid, q.dtype.itemsize, budget_mb=1.5)
    seed2d = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_dropout_kernel, scale=scale, n_heads=n_heads,
                          rate=rate),
        grid=(n // bn,),
        in_specs=[_dropout_specs(bn, lq, lk, hid),
                  _blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid),
                  _blk(bn, lq, hid)],
        out_specs=[_blk(bn, lq, hid), _blk(bn, lk, hid), _blk(bn, lk, hid)],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        interpret=interpret,
        compiler_params=_params(interpret),
    )(seed2d, q, k, v, do)
    return dq, dk, dv, None


fused_mha_dropout.defvjp(_mha_drop_fwd, _mha_drop_bwd)


# Backwards-compatible single-head-folded API (used by tests/microbenches).
def fused_attention(q, k, v, scale: float, interpret: bool = False):
    return fused_mha(q, k, v, 1, scale, interpret)


def fused_attention_with_probs(q, k, v, scale: float, interpret: bool = False):
    out, p = fused_mha_with_probs(q, k, v, 1, scale, interpret)
    return out, p[:, 0]


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"
