"""Fused-layer inference engine parity vs the flax module.

The engine (``infer/engine.py``) reruns the deterministic hFT forward
through whole-layer Pallas kernels (``ops/layer_fused.py``); on the CPU test
platform the kernels run in interpret mode. Parity target: the flax
``model.apply`` output (which itself is parity-tested against the torch
reference in ``test_model_parity.py``).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer import engine
from nylon_amt_tpu.models.hft import build_model, init_params


def small_config(**model_kw):
    kw = dict(hid_dim=16, pf_dim=32, enc_layer=2, dec_layer=2,
              enc_head=2, dec_head=2, dropout=0.0)
    kw.update(model_kw)
    return Config(model=ModelConfig(**kw))


def _forward_pair(cfg, B=2, seed=0):
    rng = np.random.default_rng(seed)
    params = init_params(cfg, jax.random.key(1))
    spec = jnp.asarray(
        rng.standard_normal((B, cfg.feature.n_bins, cfg.window_frames)),
        jnp.float32)
    model = build_model(cfg)
    ref = model.apply({"params": params}, spec, deterministic=True)
    got = engine.forward(params, spec, cfg, interpret=True)
    return ref, got


def test_engine_matches_module_f32():
    cfg = small_config()
    ref, got = _forward_pair(cfg)
    assert engine.supports(cfg)
    keys = {k for k in ref if k != "attention"}
    assert set(got) == keys
    for k in sorted(keys):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_engine_matches_module_bf16():
    """In bf16 both paths are rounded truths with different reduction
    orders, so a fixed delta gate is init-scale-dependent (the
    reference-parity init's xavier heads/FFN pushed a 0.1 rel gate over).
    The scale-invariant gate: the engine's error from the f32 module truth
    must be comparable to the flax bf16 path's OWN error from that truth —
    i.e. the kernel adds reordering noise, not extra rounding stages."""
    cfg = small_config(compute_dtype="bfloat16")
    ref16, got16 = _forward_pair(cfg)
    ref32, _ = _forward_pair(small_config())      # f32 truth, same seed/init
    for k in (k for k in ref16 if k != "attention"):
        t = np.asarray(ref32[k], np.float32)
        scale = np.maximum(np.abs(t), 1.0)
        e_module = np.max(np.abs(np.asarray(ref16[k], np.float32) - t) / scale)
        e_engine = np.max(np.abs(np.asarray(got16[k], np.float32) - t) / scale)
        assert e_engine <= 2.0 * e_module + 1e-3, (
            f"{k}: engine bf16 err {e_engine:.4f} vs module bf16 err "
            f"{e_module:.4f}")


def test_engine_single_stage_cafreq():
    cfg = small_config(dec_alg="cafreq")
    ref, got = _forward_pair(cfg)
    assert set(got) == {"onset_A", "offset_A", "mpe_A", "velocity_A"}
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_engine_supports_gating():
    assert not engine.supports(small_config(enc_alg="cnnblock_safreq"))
    assert not engine.supports(small_config(dec_alg="linear_satime"))
    assert not engine.supports(small_config(return_attention=True))


def test_stem_layer_multiphase_matches_composition(monkeypatch):
    """encoder_layer_with_stem at a block size below 8 (multi-phase banded
    loads — the paper-scale geometry's path) equals fused_stem +
    encoder_layer."""
    from nylon_amt_tpu.models.hft import fused_stem
    from nylon_amt_tpu.ops import layer_fused
    from nylon_amt_tpu.ops.layer_fused import (
        EncoderLayerParams, encoder_layer, encoder_layer_with_stem)

    rng = np.random.default_rng(7)
    B, n_frame, n_bin, hid, pf, heads = 2, 16, 8, 16, 32, 2
    n_margin, ck, cc = 4, 3, 2
    n_proc = 2 * n_margin + 1
    total = n_frame + n_proc - 1

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    conv_w, conv_b = arr(cc, ck), arr(cc)
    emb_w, emb_b = arr(cc * (n_proc - ck + 1), hid), arr(hid)
    pos = arr(n_bin, hid)
    p = EncoderLayerParams(
        wqkv=arr(hid, 3 * hid), bqkv=arr(3 * hid), wo=arr(hid, hid),
        bo=arr(hid), g=jnp.ones(hid), b=jnp.zeros(hid),
        w1=arr(hid, pf), b1=arr(pf), w2=arr(pf, hid), b2=arr(hid))
    spec = arr(B, n_bin, total)

    kw = dict(cnn_channel=cc, cnn_kernel=ck, hid_dim=hid, n_margin=n_margin)
    emb = fused_stem(spec, conv_w, conv_b, emb_w, emb_b, dtype=jnp.float32,
                     **kw)
    h = emb.reshape(B * n_frame, n_bin, hid)
    h = h * jnp.sqrt(jnp.float32(hid)) + pos[None]
    ref = encoder_layer(h, p, heads, interpret=True)

    from nylon_amt_tpu.models.hft import stem_effective_kernel

    keff, beff = stem_effective_kernel(conv_w, conv_b, emb_w, emb_b, **kw)
    # Force bn=2 -> 4 alignment phases (per_row ~5.4 KB).
    monkeypatch.setattr(layer_fused, "_BLOCK_BUDGET_MB", 2 * 5376 / 2**20)
    got = encoder_layer_with_stem(
        spec.transpose(0, 2, 1), keff, beff, pos, p, heads, n_frame,
        jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_transcriber_engine_path_matches_module(tmp_path):
    """Transcriber(use_engine=True) produces the same posteriors as the
    module path on a synthetic feature."""
    from nylon_amt_tpu.infer.transcribe import Transcriber

    cfg = small_config()
    params = init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(3)
    feature = rng.standard_normal((300, cfg.feature.n_bins)).astype(np.float32)

    t_mod = Transcriber(cfg, params, use_engine=False)
    t_eng = Transcriber(cfg, params, use_engine=True)
    post_mod = t_mod.transcript(feature)
    post_eng = t_eng.transcript(feature)
    assert set(post_mod) == set(post_eng)
    for k in post_mod:
        np.testing.assert_allclose(post_eng[k], post_mod[k], atol=2e-4,
                                   rtol=2e-4, err_msg=k)
