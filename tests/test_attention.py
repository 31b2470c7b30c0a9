"""Fused Pallas attention: numerics + gradients vs the einsum reference."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import HFT
from nylon_amt_tpu.ops.attention import (
    fused_attention,
    fused_attention_with_probs,
)


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("nqd,nkd->nqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v), p


@pytest.mark.parametrize("shape", [(8, 88, 256, 64), (4, 128, 128, 64),
                                   (6, 256, 256, 32)])
def test_fused_forward_matches_reference(rng, shape):
    n, lq, lk, d = shape
    q = rng.standard_normal((n, lq, d)).astype(np.float32)
    k = rng.standard_normal((n, lk, d)).astype(np.float32)
    v = rng.standard_normal((n, lk, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    out = fused_attention(q, k, v, scale, True)  # interpret mode on CPU
    ref, _ = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_with_probs(rng):
    n, lq, lk, d = 4, 88, 256, 64
    q = rng.standard_normal((n, lq, d)).astype(np.float32)
    k = rng.standard_normal((n, lk, d)).astype(np.float32)
    v = rng.standard_normal((n, lk, d)).astype(np.float32)
    scale = 0.125
    out, probs = fused_attention_with_probs(q, k, v, scale, True)
    ref_out, ref_p = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_p), atol=2e-6)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_fused_gradients_match_reference(rng):
    n, lq, lk, d = 2, 64, 128, 32
    q = rng.standard_normal((n, lq, d)).astype(np.float32)
    k = rng.standard_normal((n, lk, d)).astype(np.float32)
    v = rng.standard_normal((n, lk, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    w = rng.standard_normal((d,)).astype(np.float32)  # mixes output channels

    def loss_fused(q, k, v):
        return jnp.sum(jnp.tanh(fused_attention(q, k, v, scale, True)) * w)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(_ref_attention(q, k, v, scale)[0]) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=f"d{name}")


def test_model_pallas_matches_xla(rng):
    """Full model forward: pallas (interpret) == xla attention path."""
    base = Config(model=ModelConfig(hid_dim=32, pf_dim=64, enc_layer=1,
                                    dec_layer=2, enc_head=2, dec_head=2,
                                    dropout=0.0, attention_impl="xla"))
    spec = rng.standard_normal((1, 256, 192)).astype(np.float32)
    params = HFT(config=base).init({"params": jax.random.key(0)}, spec)["params"]

    out_x = HFT(config=base).apply({"params": params}, spec)
    cfg_p = dataclasses.replace(
        base, model=dataclasses.replace(base.model, attention_impl="pallas",
                                        return_attention=True))
    out_p = HFT(config=cfg_p).apply({"params": params}, spec)

    for key in out_x:
        np.testing.assert_allclose(np.asarray(out_p[key]),
                                   np.asarray(out_x[key]), atol=3e-5,
                                   err_msg=key)


def test_model_pallas_grads_match_xla(rng):
    base = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                    dec_layer=1, enc_head=2, dec_head=2,
                                    dropout=0.0, attention_impl="xla"))
    spec = rng.standard_normal((1, 256, 192)).astype(np.float32)
    params = HFT(config=base).init({"params": jax.random.key(0)}, spec)["params"]
    cfg_p = dataclasses.replace(
        base, model=dataclasses.replace(base.model, attention_impl="pallas"))

    def loss(cfg):
        def f(p):
            out = HFT(config=cfg).apply({"params": p}, spec)
            return (jnp.mean(out["onset_B"] ** 2)
                    + jnp.mean(out["velocity_A"] ** 2))
        return f

    g_x = jax.grad(loss(base))(params)
    g_p = jax.grad(loss(cfg_p))(params)
    # Tolerance derivation: the reference quirk scales embeddings by
    # sqrt(hid) with NO LayerNorm before the first self-attention, so with
    # unit-normal spec input at init the freq-encoder scores span ~±450 —
    # a saturated softmax. At those activations BOTH paths sit ~2e-3 abs
    # from an f64 oracle on |dq|max≈244 (≈8e-6 relative; measured, see
    # docs/pallas_grad_tolerance.md), i.e. neither is less accurate — but
    # their FORMULATIONS differ (base-2 deferred-normalization kernel vs
    # exp softmax), so their mutual delta does not cancel: measured
    # 1.27e-4 on param grads with |g|max≈2.75 (4.6e-5 relative). Gate at
    # 4x the measured delta; a real regression (wrong formula, dropped
    # term) shows up orders of magnitude above this.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-4),
        g_x, g_p)


def test_model_pallas_grads_with_attention_maps(rng):
    """Grads must flow through the need_weights site (the returned stage-1
    cross-attention map): the fused with-probs kernel is differentiable
    (custom VJP; a stop_gradient here once silently dropped this site)."""
    base = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                    dec_layer=1, enc_head=2, dec_head=2,
                                    dropout=0.0, attention_impl="xla",
                                    return_attention=True))
    spec = 0.1 * rng.standard_normal((1, 256, 192)).astype(np.float32)
    params = HFT(config=base).init({"params": jax.random.key(0)}, spec)["params"]
    cfg_p = dataclasses.replace(
        base, model=dataclasses.replace(base.model, attention_impl="pallas"))

    def loss(cfg, on_probs):
        def f(p):
            out = HFT(config=cfg).apply({"params": p}, spec)
            if on_probs:  # differentiates the returned attention map itself
                return jnp.mean(out["attention"] ** 2)
            return jnp.mean(out["onset_B"] ** 2)
        return f

    for on_probs in (False, True):
        g_x = jax.grad(loss(base, on_probs))(params)
        g_p = jax.grad(loss(cfg_p, on_probs))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5,
                err_msg=f"on_probs={on_probs}"),
            g_x, g_p)
