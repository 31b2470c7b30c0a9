"""Flax-free fused inference engine for the hFT model.

``forward(params, spec, config)`` reproduces the deterministic
``HFT.apply`` output dict (minus the attention map) using the whole-layer
fused Pallas kernels of :mod:`nylon_amt_tpu.ops.layer_fused`: each
transformer layer is one kernel that keeps its weights resident in VMEM and
streams the activations through exactly once, instead of the ~8 HBM passes
per layer the layer-wise graph costs. At hid_dim 256 the model is
HBM-bandwidth-bound, so this is the transcription-throughput path
(the reference's hot loop, ``amt.py:88-96``).

Weight packing happens at trace time from the ordinary flax param pytree —
checkpoints, the torch importer, and training are unaffected. Parity with
``model.apply`` is covered by tests in both f32 (tight) and bf16.

Training and the attention-map path (``return_attention``) keep the flax
module; this engine is deterministic-forward only.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.models.hft import stem_effective_kernel
from nylon_amt_tpu.ops.layer_fused import (
    CrossLayerParams,
    EncoderLayerParams,
    decoder_layer,
    decoder_layer_zero,
    encoder_layer,
    encoder_layer_with_stem,
)


def _dt(config: Config):
    return {"float32": jnp.float32,
            "bfloat16": jnp.bfloat16}[config.model.compute_dtype]


def _mha_weights(p, dt, names):
    ws = [p[f"fc_{n}_kernel"].astype(dt) for n in names]
    bs = [p[f"fc_{n}_bias"].astype(dt) for n in names]
    if len(ws) == 1:
        return ws[0], bs[0]
    return jnp.concatenate(ws, axis=1), jnp.concatenate(bs)


def _pack_encoder(layer, dt) -> EncoderLayerParams:
    sa = layer["self_attention"]
    ln = layer["layer_norm"]
    ff = layer["positionwise_feedforward"]
    wqkv, bqkv = _mha_weights(sa, dt, ["q", "k", "v"])
    wo, bo = _mha_weights(sa, dt, ["o"])
    return EncoderLayerParams(
        wqkv=wqkv, bqkv=bqkv, wo=wo, bo=bo,
        g=ln["scale"].astype(jnp.float32), b=ln["bias"].astype(jnp.float32),
        w1=ff["fc_1"]["kernel"].astype(dt), b1=ff["fc_1"]["bias"].astype(dt),
        w2=ff["fc_2"]["kernel"].astype(dt), b2=ff["fc_2"]["bias"].astype(dt))


def _pack_cross(layer, dt, with_self: bool) -> CrossLayerParams:
    ca = layer["encoder_attention"]
    ln = layer["layer_norm"]
    ff = layer["positionwise_feedforward"]
    wq, bq = _mha_weights(ca, dt, ["q"])
    wkv, bkv = _mha_weights(ca, dt, ["k", "v"])
    wo, bo = _mha_weights(ca, dt, ["o"])
    if with_self:
        sa = layer["self_attention"]
        wsqkv, bsqkv = _mha_weights(sa, dt, ["q", "k", "v"])
        wso, bso = _mha_weights(sa, dt, ["o"])
    else:
        hid = wq.shape[0]
        wsqkv = jnp.zeros((hid, 0), dt)
        bsqkv = jnp.zeros((0,), dt)
        wso = jnp.zeros((hid, hid), dt)
        bso = jnp.zeros((hid,), dt)
    return CrossLayerParams(
        wsqkv=wsqkv, bsqkv=bsqkv, wso=wso, bso=bso, wq=wq, bq=bq,
        wkv=wkv, bkv=bkv, wo=wo, bo=bo,
        g=ln["scale"].astype(jnp.float32), b=ln["bias"].astype(jnp.float32),
        w1=ff["fc_1"]["kernel"].astype(dt), b1=ff["fc_1"]["bias"].astype(dt),
        w2=ff["fc_2"]["kernel"].astype(dt), b2=ff["fc_2"]["bias"].astype(dt))


def _dense(x, p, dt):
    y = jnp.dot(x, p["kernel"].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
    return y + p["bias"].astype(dt)


def forward(params: Any, spec: jax.Array, config: Config, *,
            interpret: bool = False, precision: str | None = None) -> dict:
    """Deterministic hFT forward on the fused-layer path.

    ``spec [B, n_bin, margin_b + n_frame + margin_f]`` -> dict of logits
    with the same keys/shapes as ``HFT.apply`` (no ``attention``).

    ``precision="int8"`` routes the transformer layers through the W8A8
    kernels (:mod:`nylon_amt_tpu.ops.layer_fused_q8`): per-channel int8
    weights, dynamic per-row int8 activations, int8 MXU matmuls (2x the
    bf16 rate on v5e). Output heads, LayerNorm, softmax, and the stem stay
    in the bf16 path's numerics. Default (None/"bf16"/"float32") is the
    exact-parity path.
    """
    cfg = config
    m = cfg.model
    dt = _dt(cfg)
    q8 = precision == "int8"
    if q8:
        from nylon_amt_tpu.ops import layer_fused_q8 as lq
    enc_p = params["encoder"]
    dec_p = params["decoder"]
    B = spec.shape[0]
    n_frame, n_bin = cfg.input.num_frame, cfg.feature.n_bins
    n_note, n_vel = cfg.midi.num_note, cfg.midi.num_velocity
    hid = m.hid_dim
    sqrt_hid = jnp.sqrt(jnp.float32(hid)).astype(dt)

    def enc_params(layer):
        p = _pack_encoder(layer, dt)
        return lq.quantize_encoder_params(p) if q8 else p

    def cross_params(layer, with_self):
        p = _pack_cross(layer, dt, with_self)
        return lq.quantize_cross_params(p) if q8 else p

    enc_layer_fn = (lambda h, p, nh, it: lq.encoder_layer_q8(h, p, nh, it)) \
        if q8 else encoder_layer
    dec_zero_fn = (lambda t, e, p, nh, it:
                   lq.decoder_layer_zero_q8(t, e, p, nh, it)) \
        if q8 else decoder_layer_zero
    dec_layer_fn = (lambda t, e, p, nh, it: lq.decoder_layer_q8(t, e, p, nh,
                                                                it)) \
        if q8 else decoder_layer
    stem_layer_fn = lq.encoder_layer_with_stem_q8 if q8 \
        else encoder_layer_with_stem

    # ---- frequency encoder -------------------------------------------------
    # Stem + pos embedding fused into the first layer's kernel: the spec is
    # small enough to sit whole in VMEM, so the 65-tap convolution happens
    # on already-resident data and no stem intermediate ever reaches HBM.
    pos = enc_p["pos_embedding_freq"]["embedding"].astype(dt)
    first_layer = 0
    try:
        keff, beff = stem_effective_kernel(
            enc_p["conv_kernel"], enc_p["conv_bias"],
            enc_p["tok_embedding_kernel"], enc_p["tok_embedding_bias"],
            cnn_channel=m.cnn_channel, cnn_kernel=m.cnn_kernel, hid_dim=hid,
            n_margin=cfg.input.margin_b)
        spec_t = spec.astype(jnp.float32).transpose(0, 2, 1)  # frame-major
        h = stem_layer_fn(
            spec_t, keff, beff, pos,
            enc_params(enc_p["layers_freq_0"]), m.enc_head, n_frame,
            dt, interpret)
        first_layer = 1
    except ValueError:          # geometry the banded kernel can't block
        from nylon_amt_tpu.models.hft import fused_stem

        emb = fused_stem(spec, enc_p["conv_kernel"], enc_p["conv_bias"],
                         enc_p["tok_embedding_kernel"],
                         enc_p["tok_embedding_bias"],
                         cnn_channel=m.cnn_channel, cnn_kernel=m.cnn_kernel,
                         hid_dim=hid, n_margin=cfg.input.margin_b, dtype=dt)
        h = emb.reshape(B * n_frame, n_bin, hid)
        h = h * sqrt_hid + pos[None]
    for i in range(first_layer, m.enc_layer):
        h = enc_layer_fn(h, enc_params(enc_p[f"layers_freq_{i}"]),
                         m.enc_head, interpret)
    enc = h                                           # [B*n_frame, n_bin, hid]

    # ---- stage 1: CAfreq ----------------------------------------------------
    note_q = dec_p["pos_embedding_freq"]["embedding"].astype(dt)
    trg = jnp.broadcast_to(note_q[None], (B * n_frame, n_note, hid))
    trg = dec_zero_fn(
        trg, enc, cross_params(dec_p["layer_zero_freq"], False),
        m.dec_head, interpret)
    for i in range(m.dec_layer - 1):
        trg = dec_layer_fn(
            trg, enc, cross_params(dec_p[f"layers_freq_{i}"], True),
            m.dec_head, interpret)

    out = {
        "onset_A": _dense(trg, dec_p["fc_onset_freq"], dt)
        .reshape(B, n_frame, n_note),
        "offset_A": _dense(trg, dec_p["fc_offset_freq"], dt)
        .reshape(B, n_frame, n_note),
        "mpe_A": _dense(trg, dec_p["fc_mpe_freq"], dt)
        .reshape(B, n_frame, n_note),
        "velocity_A": _dense(trg, dec_p["fc_velocity_freq"], dt)
        .reshape(B, n_frame, n_note, n_vel),
    }
    if m.dec_alg == "cafreq":                        # stage-1-only ablation
        return out

    # ---- stage 2: SAtime ----------------------------------------------------
    t = trg.reshape(B, n_frame, n_note, hid)
    t = t.transpose(0, 2, 1, 3).reshape(B * n_note, n_frame, hid)
    time_pos = dec_p["pos_embedding_time"]["embedding"].astype(dt)
    t = t * sqrt_hid + time_pos[None]
    for i in range(m.dec_layer):
        t = enc_layer_fn(t, enc_params(dec_p[f"layers_time_{i}"]),
                         m.dec_head, interpret)

    def head_t(name):
        return _dense(t, dec_p[name], dt)

    out.update({
        "onset_B": head_t("fc_onset_time").reshape(B, n_note, n_frame)
        .transpose(0, 2, 1),
        "offset_B": head_t("fc_offset_time").reshape(B, n_note, n_frame)
        .transpose(0, 2, 1),
        "mpe_B": head_t("fc_mpe_time").reshape(B, n_note, n_frame)
        .transpose(0, 2, 1),
        "velocity_B": head_t("fc_velocity_time")
        .reshape(B, n_note, n_frame, n_vel).transpose(0, 2, 1, 3),
    })
    if "fc_string_time" in dec_p:        # ModelConfig.tab_head
        out["string_B"] = (head_t("fc_string_time")
                           .reshape(B, n_note, n_frame, -1)
                           .transpose(0, 2, 1, 3))
    return out


def supports(config: Config) -> bool:
    """The engine covers the main architecture (both decoders' depths >= 1)
    without the attention map; other ablation encoders/decoders fall back to
    the flax module."""
    m = config.model
    return (m.enc_alg == "cnntime_safreq"
            and m.dec_alg in ("cafreq_satime", "cafreq")
            and not m.return_attention)
