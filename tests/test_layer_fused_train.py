"""Gradient parity of the fused training layer kernel vs jax autodiff.

``encoder_layer_train`` (ops/layer_fused_train.py) implements the forward
and the analytic backward of one post-LN shared-LayerNorm block in single
Pallas kernels. At dropout 0 (the CPU interpreter has no PRNG) both the
forward and every gradient must match autodiff through the pure-jnp
composition to float32 tolerance. The dropout path is validated on hardware
by ``scripts/validate_dropout_tpu.py``-style checks.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nylon_amt_tpu.ops.layer_fused import (_LN_EPS, EncoderLayerParams,
                                           encoder_layer)
from nylon_amt_tpu.ops.layer_fused_train import encoder_layer_train

N, L, HID, PF, HEADS = 16, 32, 16, 32, 2


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    p = EncoderLayerParams(
        wqkv=arr(HID, 3 * HID), bqkv=arr(3 * HID), wo=arr(HID, HID),
        bo=arr(HID), g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID),
        w1=arr(HID, PF), b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    x = arr(N, L, HID)
    return x, p


def reference_layer(x, p, n_heads):
    """Pure-jnp post-LN block, identical math to models.hft.EncoderLayer
    (deterministic)."""
    hid = x.shape[-1]
    d = hid // n_heads
    scale = 1.0 / d ** 0.5

    def matmul(t, w, b):
        return (jnp.einsum("nlh,hk->nlk", t, w)).astype(t.dtype) + b

    def ln(t):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t), axis=-1, keepdims=True) - mu ** 2
        return (t - mu) * jax.lax.rsqrt(var + _LN_EPS) * p.g + p.b

    qkv = matmul(x, p.wqkv, p.bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    outs = []
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.einsum("nqd,nkd->nqk", q[..., sl], k[..., sl]) * scale
        a = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("nqk,nkd->nqd", a, v[..., sl]))
    attn = matmul(jnp.concatenate(outs, -1), p.wo, p.bo)
    y = ln(x + attn)
    ff = matmul(jnp.maximum(matmul(y, p.w1, p.b1), 0), p.w2, p.b2)
    return ln(y + ff)


def test_forward_matches_reference_and_inference_kernel():
    x, p = make_inputs()
    seed = jnp.int32(0)
    got = encoder_layer_train(x, p, seed, HEADS, 0.0, True)
    ref = reference_layer(x, p, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    inf = encoder_layer(x, p, HEADS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(inf),
                               atol=1e-6, rtol=1e-6)


def test_gradients_match_autodiff():
    x, p = make_inputs(1)
    seed = jnp.int32(0)
    co = jnp.asarray(
        np.random.default_rng(2).standard_normal((N, L, HID)), jnp.float32)

    def loss_fused(x, p):
        return jnp.sum(encoder_layer_train(x, p, seed, HEADS, 0.0, True) * co)

    def loss_ref(x, p):
        return jnp.sum(reference_layer(x, p, HEADS) * co)

    (dx_f, dp_f) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    (dx_r, dp_r) = jax.grad(loss_ref, argnums=(0, 1))(x, p)

    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               atol=5e-4, rtol=5e-4, err_msg="dx")
    for name, a, b in zip(EncoderLayerParams._fields, dp_f, dp_r):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
            err_msg=f"d{name}")


def _dec_inputs(seed=0, with_self=True):
    from nylon_amt_tpu.ops.layer_fused_train import (DecLayerParams,
                                                     DecZeroParams)

    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    common = dict(wq=arr(HID, HID), bq=arr(HID), wkv=arr(HID, 2 * HID),
                  bkv=arr(2 * HID), wo=arr(HID, HID), bo=arr(HID),
                  g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID), w1=arr(HID, PF),
                  b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    if with_self:
        p = DecLayerParams(wsqkv=arr(HID, 3 * HID), bsqkv=arr(3 * HID),
                           wso=arr(HID, HID), bso=arr(HID), **common)
    else:
        p = DecZeroParams(**common)
    LQ = 8
    trg = arr(N, LQ, HID)
    enc = arr(N, L, HID)
    return trg, enc, p


def _ref_cross_tail(trg, enc, p, n_heads):
    hid = trg.shape[-1]
    d = hid // n_heads
    scale = 1.0 / d ** 0.5

    def matmul(t, w, b):
        return jnp.einsum("nlh,hk->nlk", t, w) + b

    def ln(t):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t), axis=-1, keepdims=True) - mu ** 2
        return (t - mu) * jax.lax.rsqrt(var + _LN_EPS) * p.g + p.b

    q = matmul(trg, p.wq, p.bq)
    kv = matmul(enc, p.wkv, p.bkv)
    k, v = kv[..., :hid], kv[..., hid:]
    outs = []
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.einsum("nqd,nkd->nqk", q[..., sl], k[..., sl]) * scale
        a = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("nqk,nkd->nqd", a, v[..., sl]))
    attn = matmul(jnp.concatenate(outs, -1), p.wo, p.bo)
    y = ln(trg + attn)
    ff = matmul(jnp.maximum(matmul(y, p.w1, p.b1), 0), p.w2, p.b2)
    return ln(y + ff)


def _ref_dec_layer(trg, enc, p, n_heads):
    hid = trg.shape[-1]
    d = hid // n_heads
    scale = 1.0 / d ** 0.5

    def matmul(t, w, b):
        return jnp.einsum("nlh,hk->nlk", t, w) + b

    def ln(t):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t), axis=-1, keepdims=True) - mu ** 2
        return (t - mu) * jax.lax.rsqrt(var + _LN_EPS) * p.g + p.b

    qkv = matmul(trg, p.wsqkv, p.bsqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    outs = []
    for h in range(n_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jnp.einsum("nqd,nkd->nqk", q[..., sl], k[..., sl]) * scale
        a = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("nqk,nkd->nqd", a, v[..., sl]))
    sa = matmul(jnp.concatenate(outs, -1), p.wso, p.bso)
    t1 = ln(trg + sa)
    return _ref_cross_tail(t1, enc, p, n_heads)


def test_decoder_zero_forward_and_grads():
    from nylon_amt_tpu.ops.layer_fused_train import decoder_layer_zero_train

    trg, enc, p = _dec_inputs(4, with_self=False)
    seed = jnp.int32(0)
    got = decoder_layer_zero_train(trg, enc, p, seed, HEADS, 0.0, True)
    ref = _ref_cross_tail(trg, enc, p, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    co = jnp.asarray(np.random.default_rng(5).standard_normal(got.shape),
                     jnp.float32)
    d_f = jax.grad(lambda t, e, p: jnp.sum(
        decoder_layer_zero_train(t, e, p, seed, HEADS, 0.0, True) * co),
        argnums=(0, 1, 2))(trg, enc, p)
    d_r = jax.grad(lambda t, e, p: jnp.sum(
        _ref_cross_tail(t, e, p, HEADS) * co), argnums=(0, 1, 2))(trg, enc, p)
    np.testing.assert_allclose(np.asarray(d_f[0]), np.asarray(d_r[0]),
                               atol=5e-4, rtol=5e-4, err_msg="dtrg")
    np.testing.assert_allclose(np.asarray(d_f[1]), np.asarray(d_r[1]),
                               atol=5e-4, rtol=5e-4, err_msg="denc")
    for name, a, b in zip(type(p)._fields, d_f[2], d_r[2]):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-4,
                                   err_msg=f"d{name}")


def test_decoder_full_forward_and_grads():
    from nylon_amt_tpu.ops.layer_fused_train import decoder_layer_train

    trg, enc, p = _dec_inputs(6, with_self=True)
    seed = jnp.int32(0)
    got = decoder_layer_train(trg, enc, p, seed, HEADS, 0.0, True)
    ref = _ref_dec_layer(trg, enc, p, HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    co = jnp.asarray(np.random.default_rng(7).standard_normal(got.shape),
                     jnp.float32)
    d_f = jax.grad(lambda t, e, p: jnp.sum(
        decoder_layer_train(t, e, p, seed, HEADS, 0.0, True) * co),
        argnums=(0, 1, 2))(trg, enc, p)
    d_r = jax.grad(lambda t, e, p: jnp.sum(
        _ref_dec_layer(t, e, p, HEADS) * co), argnums=(0, 1, 2))(trg, enc, p)
    np.testing.assert_allclose(np.asarray(d_f[0]), np.asarray(d_r[0]),
                               atol=5e-4, rtol=5e-4, err_msg="dtrg")
    np.testing.assert_allclose(np.asarray(d_f[1]), np.asarray(d_r[1]),
                               atol=5e-4, rtol=5e-4, err_msg="denc")
    for name, a, b in zip(type(p)._fields, d_f[2], d_r[2]):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-4,
                                   err_msg=f"d{name}")


def test_dropout_grad_finite_difference():
    """With a FIXED seed the dropped forward is deterministic, so the
    custom-VJP gradient must satisfy the finite-difference identity. This
    is the check that catches fwd/bwd mask misalignment (the masks are
    index hashes precisely so this holds for any grid/block size)."""
    x, p = make_inputs(9)
    seed = jnp.int32(42)
    co = jnp.asarray(np.random.default_rng(10).standard_normal((N, L, HID)),
                     jnp.float32)

    def f(x):
        return jnp.sum(encoder_layer_train(x, p, seed, HEADS, 0.3, True)
                       * co)

    assert float(f(x)) == float(f(x))          # deterministic under the seed
    g = jax.grad(f)(x)
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    # eps small enough that softmax curvature along v is negligible (at
    # eps=1e-3 the O(eps^2) term reaches ~10% of the derivative for some
    # mask draws; 3e-4 converges while staying above f32 noise)
    eps = 3e-4
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    directional = float(jnp.vdot(g, v))
    assert abs(fd - directional) / max(1.0, abs(fd)) < 2e-2, (fd, directional)


def test_dropout_masks_differ_between_sites_and_seeds():
    x, p = make_inputs(12)
    out_a = encoder_layer_train(x, p, jnp.int32(1), HEADS, 0.3, True)
    out_b = encoder_layer_train(x, p, jnp.int32(2), HEADS, 0.3, True)
    out_det = encoder_layer_train(x, p, jnp.int32(1), HEADS, 0.0, True)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_det))


def test_emb_drop_site():
    """``emb_drop=True`` applies the _SITE_EMB hash mask to the layer INPUT
    (the fused home of the reference's dropout-on-embeddings). Checks:
    (a) it equals the explicit mask applied outside the kernel at
    emb_drop=False; (b) the custom-VJP gradient satisfies the
    finite-difference identity (fwd/bwd mask alignment incl. the dx mask)."""
    from nylon_amt_tpu.ops.layer_fused_train import _SITE_EMB, _keep_mask

    x, p = make_inputs(21)
    seed = jnp.int32(7)
    rate = 0.3
    got = encoder_layer_train(x, p, seed, HEADS, rate, True, True)
    m0 = _keep_mask(seed, _SITE_EMB, jnp.int32(0), x.shape, rate)
    want = encoder_layer_train((x * m0).astype(x.dtype), p, seed, HEADS,
                               rate, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    co = jnp.asarray(np.random.default_rng(22).standard_normal((N, L, HID)),
                     jnp.float32)

    def f_emb(x):
        return jnp.sum(
            encoder_layer_train(x, p, seed, HEADS, rate, True, True) * co)

    def f_chain(x):
        # identical function, but the emb mask is an EXPLICIT outer
        # multiply autodiffed by JAX — the inner kernel's bwd is pinned by
        # the other tests, so any in-kernel emb bwd error (missing dx*m0,
        # mask mismatch) shows as a gradient difference here
        return jnp.sum(encoder_layer_train(
            (x * m0).astype(x.dtype), p, seed, HEADS, rate, True, False)
            * co)

    assert float(f_emb(x)) == float(f_emb(x))       # deterministic
    dx_emb = jax.grad(f_emb)(x)
    dx_chain = jax.grad(f_chain)(x)
    np.testing.assert_allclose(np.asarray(dx_emb), np.asarray(dx_chain),
                               atol=1e-4, rtol=1e-4, err_msg="dx")

    dp_demb = jax.grad(lambda q: jnp.sum(encoder_layer_train(
        x, q, seed, HEADS, rate, True, True) * co))(p)
    dp_pre = jax.grad(lambda q: jnp.sum(encoder_layer_train(
        (x * m0).astype(x.dtype), q, seed, HEADS, rate, True, False)
        * co))(p)
    for name, a, b in zip(EncoderLayerParams._fields, dp_demb, dp_pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg=f"d{name}")


def test_grad_accumulates_across_blocks():
    """Weight grads must sum over all grid programs (multiple row blocks)."""
    x, p = make_inputs(3)
    seed = jnp.int32(0)

    def loss_n(n_rows):
        def f(p):
            out = encoder_layer_train(x[:n_rows], p, seed, HEADS, 0.0, True)
            return jnp.sum(out ** 2)
        return jax.grad(f)(p)

    # doubled input (x tiled) -> doubled weight grads
    x2 = jnp.concatenate([x[:4], x[:4]])

    def f2(p):
        out = encoder_layer_train(x2, p, seed, HEADS, 0.0, True)
        return jnp.sum(out ** 2)

    def f1(p):
        out = encoder_layer_train(x[:4], p, seed, HEADS, 0.0, True)
        return jnp.sum(out ** 2)

    d2 = jax.grad(f2)(p)
    d1 = jax.grad(f1)(p)
    for name, a, b in zip(EncoderLayerParams._fields, d2, d1):
        np.testing.assert_allclose(np.asarray(a), 2 * np.asarray(b),
                                   atol=1e-3, rtol=1e-4, err_msg=name)
