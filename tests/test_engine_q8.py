"""int8 (W8A8) engine path: closeness to the exact engine + decode-level
equivalence.

The q8 kernels are a documented approximation (PARITY.md) — per-channel
int8 weights, dynamic per-row int8 activations — so these tests assert
(a) logit closeness to the f32 engine within the quantization error
budget, and (b) that the approximation does not move *decisions*: note
events decoded from q8 posteriors match the f32 decode on a model with
confident (saturated) posteriors.
"""

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


def test_quantize_weight_roundtrip():
    from nylon_amt_tpu.ops.layer_fused_q8 import quantize_weight

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.3, jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 48)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # per-channel symmetric: error bounded by half a quantization step
    step = np.asarray(s)[0]
    assert np.all(np.abs(deq - np.asarray(w)) <= 0.5 * step + 1e-7)


def test_encoder_layer_q8_close_to_exact():
    """Kernel-level: q8 encoder layer vs the exact bf16-path layer on
    unit-scale activations."""
    from nylon_amt_tpu.ops.layer_fused import (EncoderLayerParams,
                                               encoder_layer)
    from nylon_amt_tpu.ops.layer_fused_q8 import (encoder_layer_q8,
                                                  quantize_encoder_params)

    rng = np.random.default_rng(1)
    n, l, hid, pf, heads = 8, 16, 16, 32, 2

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    p = EncoderLayerParams(
        wqkv=arr(hid, 3 * hid), bqkv=arr(3 * hid), wo=arr(hid, hid),
        bo=arr(hid), g=jnp.ones(hid), b=jnp.zeros(hid),
        w1=arr(hid, pf), b1=arr(pf), w2=arr(pf, hid), b2=arr(hid))
    x = arr(n, l, hid)
    ref = encoder_layer(x, p, heads, interpret=True)
    got = encoder_layer_q8(x, quantize_encoder_params(p), heads,
                           interpret=True)
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    # post-LN output is O(1); W8A8 per-matmul RMS error ~0.4%
    assert err < 0.08, err


def test_engine_q8_close_to_f32():
    cfg = small_config()
    rng = np.random.default_rng(2)
    params = init_params(cfg, jax.random.key(1))
    spec = jnp.asarray(
        rng.standard_normal((2, cfg.feature.n_bins, cfg.window_frames)),
        jnp.float32)
    ref = engine.forward(params, spec, cfg, interpret=True)
    got = engine.forward(params, spec, cfg, interpret=True,
                         precision="int8")
    assert set(got) == set(ref)
    for k in sorted(ref):
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        # logits at random init are O(1); the quantization error compounds
        # across 2 enc + 2 dec + 2 time layers
        scale = np.maximum(np.abs(r), 1.0)
        assert np.max(np.abs(r - g) / scale) < 0.25, k
        # posteriors (what decoding consumes) stay close
        pr = 1 / (1 + np.exp(-r))
        pg = 1 / (1 + np.exp(-g))
        assert np.max(np.abs(pr - pg)) < 0.06, k


def test_engine_q8_decode_equivalence():
    """Confident posteriors -> identical note events through mpe2note.

    Builds a model whose B-head biases are pushed to produce saturated
    on/off posteriors (the regime a trained transcriber operates in), then
    checks the q8 and f32 engines decode to the same notes.
    """
    from nylon_amt_tpu.infer.decode import mpe2note

    cfg = small_config(compute_dtype="bfloat16")
    # reference_init=False on purpose: this fixture's "saturate the B
    # heads x8" trick was designed around the flax default init (head
    # features keep enough spread that x8 head gain saturates the
    # posteriors).  Under reference_initialize the dim-1 heads project
    # the strongly non-centered features to one side of the threshold
    # and BOTH engines decode zero notes (the round-3 regression); the
    # decode-equivalence property being tested is init-independent.
    params = init_params(cfg, jax.random.key(3), reference_init=False)
    # saturate the B heads (x8 gain): logits move away from 0, as in a
    # trained model, so threshold decisions are robust to ~1% logit error
    dec = dict(params["decoder"])
    for head in ("fc_onset_time", "fc_offset_time", "fc_mpe_time"):
        dec[head] = {"kernel": dec[head]["kernel"] * 8.0,
                     "bias": dec[head]["bias"] * 8.0}
    params = dict(params, decoder=dec)
    rng = np.random.default_rng(4)
    spec = jnp.asarray(
        rng.standard_normal((2, cfg.feature.n_bins, cfg.window_frames)),
        jnp.float32)

    ref = engine.forward(params, spec, cfg, interpret=True)
    got = engine.forward(params, spec, cfg, interpret=True,
                         precision="int8")

    def decode(out):
        onset = np.asarray(jax.nn.sigmoid(out["onset_B"][0]), np.float64)
        offset = np.asarray(jax.nn.sigmoid(out["offset_B"][0]), np.float64)
        mpe = np.asarray(jax.nn.sigmoid(out["mpe_B"][0]), np.float64)
        vel = np.asarray(jnp.argmax(out["velocity_B"][0], -1), np.int64)
        return mpe2note(cfg, onset, offset, mpe, vel, thred_onset=0.5,
                        thred_offset=0.5, thred_mpe=0.5)

    notes_ref = decode(ref)
    notes_q8 = decode(got)
    # guard against vacuous equivalence (round 3 regression: an init
    # change made both engines decode zero notes and the test passed)
    assert len(notes_ref) > 0, "fixture no longer produces notes"
    # Sub-frame onset interpolation shifts continuously with posterior
    # deltas, so match with the standard 50 ms note-onset tolerance (the
    # mir_eval criterion) instead of exact equality; greedy one-to-one.
    n = max(len(notes_ref), len(notes_q8), 1)
    avail: dict[int, list[float]] = {}
    for a in notes_ref:
        avail.setdefault(a["pitch"], []).append(a["onset"])
    same = 0
    for b in notes_q8:
        cands = avail.get(b["pitch"], [])
        hit = next((i for i, t in enumerate(cands)
                    if abs(t - b["onset"]) < 0.05), None)
        if hit is not None:
            cands.pop(hit)
            same += 1
    assert same / n > 0.9, (len(notes_ref), len(notes_q8), same)


def test_engine_q8_stage1_only():
    cfg = small_config(dec_alg="cafreq")
    rng = np.random.default_rng(5)
    params = init_params(cfg, jax.random.key(6))
    spec = jnp.asarray(
        rng.standard_normal((1, cfg.feature.n_bins, cfg.window_frames)),
        jnp.float32)
    got = engine.forward(params, spec, cfg, interpret=True,
                         precision="int8")
    assert set(got) == {"onset_A", "offset_A", "mpe_A", "velocity_A"}
    for k, v in got.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k
