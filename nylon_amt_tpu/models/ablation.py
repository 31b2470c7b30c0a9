"""Ablation model variants (reference ``model/model_spec2midi_ablation.py``).

The paper's ablation grid (selected by ``-enc_alg``/``-dec_alg`` in the
reference's ``m_training_ablation.py:58-59,127-198``) crosses two encoders
with three decoders:

* ``cnntime_safreq`` — conv over the whole frame strip, then per-frame
  windows (ref ``Encoder_CNNtime_SAfreq:72-128``). Mathematically identical
  to the main encoder's unfold->conv->linear stem (conv and windowing
  commute), which is exactly the algebraic identity our fused main-encoder
  stem exploits — so this maps to :class:`~nylon_amt_tpu.models.hft.HFT`'s
  encoder.
* ``cnnblock_safreq`` — deep CNN stem: 4 conv blocks (48/64/96/128 channels,
  two 3x3 convs + BatchNorm + ReLU each, frequency-halving AvgPool), then
  65-frame windows reshaped to 256 pseudo-bins x 520 features feeding the
  same frequency transformer (ref ``Encoder_CNNblock_SAfreq:134-266``).
* ``cafreq_satime`` — the main two-stage decoder (8 outputs, no attention
  map — ref ``Decoder_CAfreq_SAtime:347-451``).
* ``cafreq`` — stage-1 only, 4 outputs (ref ``Decoder_CAfreq:278-341``).
* ``linear_satime`` — cross-attention replaced by a Linear(n_bin -> n_note)
  projection over the bin axis, keeping SAtime (ref
  ``Decoder_linear_SAtime:457-545``).

Paper names: 1FDN = cnntime+cafreq, 1FDT = cnntime+cafreq_satime,
1FLT = cnntime+linear_satime, 2FDT = cnnblock+cafreq_satime
(``EXE-TRAINING-MAPS.sh:8-24``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.models.hft import (
    Decoder,
    EncoderLayer,
    FreqEncoder,
    _dtype,
    resolve_attention_impl,
)


class ConvBlock(nn.Module):
    """Two 3x3 convs + BatchNorm + ReLU, then frequency-halving AvgPool
    (ref ``:145-192``). Input/output layout [B, time, freq, ch] (NHWC)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=1, name=f"conv_{i}",
                        dtype=self.dtype)(x)
            # torch BatchNorm2d defaults: momentum 0.1 (flax: 0.9), eps 1e-5.
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{i}",
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        return nn.avg_pool(x, (1, 2), strides=(1, 2))


class CNNBlockEncoder(nn.Module):
    """``Encoder_CNNblock_SAfreq`` (ref ``:134-266``)."""

    n_margin: int
    n_frame: int
    n_bin: int
    hid_dim: int
    n_layers: int
    n_heads: int
    pf_dim: int
    dropout: float
    dropout_convblock: float = 0.1
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, spec_in, deterministic: bool = True):
        B = spec_in.shape[0]
        n_proc = 2 * self.n_margin + 1                        # 65
        cnn_dim = self.n_bin // 16                            # 16
        ch_a, ch_b = 16, 8
        cnn_out_dim = n_proc * ch_b                           # 520

        # [B, n_bin, total] -> NHWC [B, time, freq, 1] (ref permutes to
        # [B, 1, time, freq] NCHW — same spatial semantics).
        x = spec_in.astype(self.dtype).transpose(0, 2, 1)[..., None]
        for bi, ch in enumerate((48, 64, 96, 128)):
            x = ConvBlock(ch, self.dtype, name=f"conv_block_{bi + 1}")(
                x, deterministic)
            x = nn.Dropout(self.dropout_convblock)(x, deterministic=deterministic)
        # x: [B, total, n_bin/16, 128ch]

        # 65-frame windows over time -> [B, n_frame, n_proc, cnn_dim, ch4]
        idx = jnp.arange(self.n_frame)[:, None] + jnp.arange(n_proc)[None, :]
        win = x[:, idx]                       # [B, n_frame, n_proc, 16, 128]
        # ref layout: [B, nf, cnn_dim, ch4, n_proc] -> split ch4 into (A, B)
        # -> [B, nf, cnn_dim * ch_a, ch_b * n_proc]
        win = win.transpose(0, 1, 3, 4, 2)    # [B, nf, 16, 128, 65]
        win = win.reshape(B, self.n_frame, cnn_dim, ch_a, ch_b, n_proc)
        win = win.reshape(B, self.n_frame, self.n_bin, cnn_out_dim)

        emb = nn.Dense(self.hid_dim, name="tok_embedding_freq",
                       dtype=self.dtype)(win)
        emb = emb.reshape(B * self.n_frame, self.n_bin, self.hid_dim)
        pos = nn.Embed(self.n_bin, self.hid_dim, name="pos_embedding_freq",
                       dtype=self.dtype)(jnp.arange(self.n_bin))
        h = emb * jnp.sqrt(jnp.float32(self.hid_dim)).astype(self.dtype) \
            + pos[None]
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        for i in range(self.n_layers):
            h = EncoderLayer(self.hid_dim, self.n_heads, self.pf_dim,
                             self.dropout, self.dtype, self.impl,
                             name=f"layers_freq_{i}")(h, deterministic)
        return h.reshape(B, self.n_frame, self.n_bin, self.hid_dim)


class LinearSAtimeDecoder(nn.Module):
    """Cross-attention replaced by Linear(n_bin -> n_note) over the bin axis
    (ref ``Decoder_linear_SAtime:457-545``)."""

    n_frame: int
    n_bin: int
    n_note: int
    n_velocity: int
    hid_dim: int
    n_layers: int
    n_heads: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, enc_spec, deterministic: bool = True):
        B = enc_spec.shape[0]
        # [B, nf, n_bin, hid] -> convert bins to notes: operates on the bin
        # axis (ref transposes to [.., hid, n_bin] then Linear(n_bin, n_note)).
        x = enc_spec.astype(self.dtype)
        w = self.param("fc_convert_kernel", nn.initializers.xavier_uniform(),
                       (self.n_bin, self.n_note))
        b = self.param("fc_convert_bias", nn.initializers.zeros,
                       (self.n_note,))
        trg = jnp.einsum("bfnh,nm->bfmh", x, w.astype(self.dtype),
                         preferred_element_type=jnp.float32).astype(self.dtype)
        trg = trg + b.astype(self.dtype)[None, None, :, None]
        trg = trg.reshape(B * self.n_frame, self.n_note, self.hid_dim)

        def head(name, n_out=1):
            return nn.Dense(n_out, name=name, dtype=self.dtype)

        out = {
            "onset_A": head("fc_onset_freq")(trg).reshape(
                B, self.n_frame, self.n_note),
            "offset_A": head("fc_offset_freq")(trg).reshape(
                B, self.n_frame, self.n_note),
            "mpe_A": head("fc_mpe_freq")(trg).reshape(
                B, self.n_frame, self.n_note),
            "velocity_A": head("fc_velocity_freq", self.n_velocity)(trg)
                .reshape(B, self.n_frame, self.n_note, self.n_velocity),
        }

        t = trg.reshape(B, self.n_frame, self.n_note, self.hid_dim)
        t = t.transpose(0, 2, 1, 3).reshape(B * self.n_note, self.n_frame,
                                            self.hid_dim)
        time_pos = nn.Embed(self.n_frame, self.hid_dim,
                            name="pos_embedding_time", dtype=self.dtype)
        t = t * jnp.sqrt(jnp.float32(self.hid_dim)).astype(self.dtype) \
            + time_pos(jnp.arange(self.n_frame))[None]
        t = nn.Dropout(self.dropout)(t, deterministic=deterministic)
        for i in range(self.n_layers):
            t = EncoderLayer(self.hid_dim, self.n_heads, self.pf_dim,
                             self.dropout, self.dtype, self.impl,
                             name=f"layers_time_{i}")(t, deterministic)

        def head_t(name):
            x = head(name)(t).reshape(B, self.n_note, self.n_frame)
            return x.transpose(0, 2, 1)

        out.update({
            "onset_B": head_t("fc_onset_time"),
            "offset_B": head_t("fc_offset_time"),
            "mpe_B": head_t("fc_mpe_time"),
            "velocity_B": head("fc_velocity_time", self.n_velocity)(t)
                .reshape(B, self.n_note, self.n_frame, self.n_velocity)
                .transpose(0, 2, 1, 3),
        })
        return out


class AblationModel(nn.Module):
    """Encoder x decoder composition for the ablation grid."""

    config: Config

    @nn.compact
    def __call__(self, input_spec, deterministic: bool = True):
        cfg = self.config
        m = cfg.model
        dt = _dtype(m.compute_dtype)
        impl = resolve_attention_impl(m.attention_impl)

        if m.enc_alg == "cnnblock_safreq":
            enc = CNNBlockEncoder(
                n_margin=cfg.input.margin_b, n_frame=cfg.input.num_frame,
                n_bin=cfg.feature.n_bins, hid_dim=m.hid_dim,
                n_layers=m.enc_layer, n_heads=m.enc_head, pf_dim=m.pf_dim,
                dropout=m.dropout, dtype=dt, impl=impl, name="encoder")
        elif m.enc_alg == "cnntime_safreq":
            enc = FreqEncoder(
                n_margin=cfg.input.margin_b, n_frame=cfg.input.num_frame,
                n_bin=cfg.feature.n_bins, cnn_channel=m.cnn_channel,
                cnn_kernel=m.cnn_kernel, hid_dim=m.hid_dim,
                n_layers=m.enc_layer, n_heads=m.enc_head, pf_dim=m.pf_dim,
                dropout=m.dropout, dtype=dt, impl=impl, name="encoder")
        else:
            raise ValueError(f"unknown enc_alg: {m.enc_alg!r}")
        h = enc(input_spec, deterministic)

        dec_kwargs = dict(
            n_frame=cfg.input.num_frame, n_bin=cfg.feature.n_bins,
            n_note=cfg.midi.num_note, n_velocity=cfg.midi.num_velocity,
            hid_dim=m.hid_dim, n_layers=m.dec_layer, n_heads=m.dec_head,
            pf_dim=m.pf_dim, dropout=m.dropout, dtype=dt, impl=impl)
        if m.dec_alg == "cafreq_satime":
            dec = Decoder(**dec_kwargs, return_attention=False, name="decoder")
        elif m.dec_alg == "cafreq":
            # Stage-1 only (ref ``Decoder_CAfreq:278-341``): the main decoder
            # graph with SAtime disabled; param paths stay aligned.
            dec = Decoder(**dec_kwargs, return_attention=False, stage2=False,
                          name="decoder")
        elif m.dec_alg == "linear_satime":
            dec = LinearSAtimeDecoder(**dec_kwargs, name="decoder")
        else:
            raise ValueError(f"unknown dec_alg: {m.dec_alg!r}")
        return dec(h, deterministic)


def build_ablation_model(config: Config) -> AblationModel:
    return AblationModel(config=config)
