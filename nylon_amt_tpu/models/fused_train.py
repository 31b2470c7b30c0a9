"""Fused-kernel training forward for the hFT model.

The training twin of :mod:`nylon_amt_tpu.infer.engine`: the same flax param
pytree runs through the whole-layer Pallas kernels of
:mod:`nylon_amt_tpu.ops.layer_fused_train`, each with an analytic in-kernel
backward (custom VJP) and in-kernel hash-mask dropout (pure functions of
the global element index — see ``layer_fused_train._keep_mask``). The XLA
autodiff graph — which re-materializes every intermediate in HBM and pays
threefry mask generation for each dropout site — is replaced by one fwd and
one bwd kernel per layer.

``make_fused_apply(config)`` returns a drop-in for ``model.apply`` with the
signature ``(variables, spec, deterministic=..., rngs=...) -> logits dict``
so :func:`nylon_amt_tpu.train.step.loss_fn` can consume it unchanged.

Differences from the flax path (documented, training-equivalent):

* dropout realizations come from per-layer/site index-hash streams seeded
  from the ``dropout`` rng, not ``nn.Dropout``'s threefry — a different but
  equally random stream;
* gradients at each custom-VJP boundary are f32 (weight grads accumulate
  in f32 inside the kernels).

Gradient parity vs the flax/autodiff path at dropout 0 is covered by
``tests/test_fused_train_model.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.models.hft import fused_stem
from nylon_amt_tpu.ops.layer_fused_train import (
    DecLayerParams,
    DecZeroParams,
    EncoderLayerParams,
    decoder_layer_train,
    decoder_layer_zero_train,
    encoder_layer_train,
)


def supports(config: Config) -> bool:
    m = config.model
    return (m.enc_alg == "cnntime_safreq"
            and m.dec_alg in ("cafreq_satime", "cafreq")
            and not m.return_attention and not m.remat)


def _dt(config: Config):
    return {"float32": jnp.float32,
            "bfloat16": jnp.bfloat16}[config.model.compute_dtype]


def _mha_w(p, names):
    ws = [p[f"fc_{n}_kernel"] for n in names]
    bs = [p[f"fc_{n}_bias"] for n in names]
    if len(ws) == 1:
        return ws[0], bs[0]
    return jnp.concatenate(ws, axis=1), jnp.concatenate(bs)


def _pack_enc(layer) -> EncoderLayerParams:
    sa, ln, ff = (layer["self_attention"], layer["layer_norm"],
                  layer["positionwise_feedforward"])
    wqkv, bqkv = _mha_w(sa, ["q", "k", "v"])
    wo, bo = _mha_w(sa, ["o"])
    return EncoderLayerParams(
        wqkv=wqkv, bqkv=bqkv, wo=wo, bo=bo, g=ln["scale"], b=ln["bias"],
        w1=ff["fc_1"]["kernel"], b1=ff["fc_1"]["bias"],
        w2=ff["fc_2"]["kernel"], b2=ff["fc_2"]["bias"])


def _pack_dec(layer, with_self):
    ca, ln, ff = (layer["encoder_attention"], layer["layer_norm"],
                  layer["positionwise_feedforward"])
    wq, bq = _mha_w(ca, ["q"])
    wkv, bkv = _mha_w(ca, ["k", "v"])
    wo, bo = _mha_w(ca, ["o"])
    common = dict(wq=wq, bq=bq, wkv=wkv, bkv=bkv, wo=wo, bo=bo,
                  g=ln["scale"], b=ln["bias"],
                  w1=ff["fc_1"]["kernel"], b1=ff["fc_1"]["bias"],
                  w2=ff["fc_2"]["kernel"], b2=ff["fc_2"]["bias"])
    if not with_self:
        return DecZeroParams(**common)
    sa = layer["self_attention"]
    wsqkv, bsqkv = _mha_w(sa, ["q", "k", "v"])
    wso, bso = _mha_w(sa, ["o"])
    return DecLayerParams(wsqkv=wsqkv, bsqkv=bsqkv, wso=wso, bso=bso,
                          **common)


def _dense(x, p, dt):
    y = jnp.dot(x, p["kernel"].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
    return y + p["bias"].astype(dt)


def train_forward(params, spec, config: Config, dropout_rng,
                  *, interpret: bool = False, rate: float | None = None
                  ) -> dict:
    """Training forward: logits dict matching ``HFT.apply`` (no attention
    map). ``dropout_rng`` derives the per-layer in-kernel hash-stream seeds
    (embedding dropout included — it rides in the first layer of each stage
    via ``emb_drop``)."""
    cfg = config
    m = cfg.model
    dt = _dt(cfg)
    rate = m.dropout if rate is None else rate
    enc_p, dec_p = params["encoder"], params["decoder"]
    B = spec.shape[0]
    n_frame, n_bin = cfg.input.num_frame, cfg.feature.n_bins
    n_note, n_vel = cfg.midi.num_note, cfg.midi.num_velocity
    hid = m.hid_dim
    sqrt_hid = jnp.sqrt(jnp.float32(hid)).astype(dt)

    def seed_for(i):
        return jax.random.randint(jax.random.fold_in(dropout_rng, 1000 + i),
                                  (), 0, 2 ** 31 - 1, dtype=jnp.int32)

    # ---- frequency encoder --------------------------------------------------
    emb = fused_stem(spec, enc_p["conv_kernel"], enc_p["conv_bias"],
                     enc_p["tok_embedding_kernel"],
                     enc_p["tok_embedding_bias"],
                     cnn_channel=m.cnn_channel, cnn_kernel=m.cnn_kernel,
                     hid_dim=hid, n_margin=cfg.input.margin_b, dtype=dt)
    h = emb.reshape(B * n_frame, n_bin, hid)
    pos = enc_p["pos_embedding_freq"]["embedding"].astype(dt)
    h = h * sqrt_hid + pos[None]
    # The reference's dropout-on-embeddings rides inside the first layer's
    # kernels (emb_drop — an in-VMEM hash-mask site; the former XLA
    # bernoulli site generated ~270 MB of rbg bits + mask traffic per step).
    for i in range(m.enc_layer):
        h = encoder_layer_train(h, _pack_enc(enc_p[f"layers_freq_{i}"]),
                                seed_for(i), m.enc_head, rate, interpret,
                                i == 0)

    # ---- stage 1: CAfreq ----------------------------------------------------
    note_q = dec_p["pos_embedding_freq"]["embedding"].astype(dt)
    trg = jnp.broadcast_to(note_q[None], (B * n_frame, n_note, hid))
    trg = decoder_layer_zero_train(
        trg, h, _pack_dec(dec_p["layer_zero_freq"], False), seed_for(10),
        m.dec_head, rate, interpret)
    for i in range(m.dec_layer - 1):
        trg = decoder_layer_train(
            trg, h, _pack_dec(dec_p[f"layers_freq_{i}"], True),
            seed_for(11 + i), m.dec_head, rate, interpret)

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
    if m.dec_alg == "cafreq":
        return out

    # ---- stage 2: SAtime ----------------------------------------------------
    t = trg.reshape(B, n_frame, n_note, hid)
    t = t.transpose(0, 2, 1, 3).reshape(B * n_note, n_frame, hid)
    time_pos = dec_p["pos_embedding_time"]["embedding"].astype(dt)
    t = t * sqrt_hid + time_pos[None]
    for i in range(m.dec_layer):
        t = encoder_layer_train(t, _pack_enc(dec_p[f"layers_time_{i}"]),
                                seed_for(20 + i), m.dec_head, rate, interpret,
                                i == 0)

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


def make_fused_apply(config: Config, interpret: bool | None = None):
    """Drop-in for ``model.apply`` over the fused training kernels.

    Signature: ``apply(variables, spec, deterministic=False, rngs=None)``.
    ``deterministic=True`` runs with rate 0 (all PRNG work compiled out);
    ``deterministic=False`` requires ``rngs={'dropout': key}`` and raises
    otherwise (the flax contract — silently training at rate 0 is a
    model-quality bug with no symptom).
    """
    if interpret is None:
        from nylon_amt_tpu.ops.attention import on_tpu

        interpret = not on_tpu()

    def apply(variables, spec, deterministic: bool = False, rngs=None):
        params = variables["params"]
        if deterministic:
            rng = jax.random.key(0)
            rate = 0.0
        else:
            if not rngs or "dropout" not in rngs:
                # Match the flax contract: training without a dropout rng
                # must be an error, not silent rate-0 regularization.
                raise ValueError("make_fused_apply: deterministic=False "
                                 "requires rngs={'dropout': key}")
            rng = rngs["dropout"]
            rate = None
        return train_forward(params, spec, config, rng,
                             interpret=interpret, rate=rate)

    return apply
