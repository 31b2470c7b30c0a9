"""hFT-Transformer in JAX/flax (hierarchical frequency-time transformer).

A from-scratch TPU-first implementation of the architecture in the reference's
``hftt_code/model/model_spec2midi.py`` (hFT-Transformer, ISMIR 2023,
arXiv 2307.04305):

* **FreqEncoder** (ref ``Encoder_SPEC2MIDI:41-106``): per-frame 65-frame
  context windows -> CNN stem -> linear embedding + learned frequency
  position embedding -> transformer encoder attending over the 256 mel bins.
* **NoteDecoder** stage 1 "CAfreq" (ref ``Decoder_SPEC2MIDI:145-183``): 88
  learned note queries cross-attend to the encoded bins; sigmoid heads A.
* **TimeDecoder** stage 2 "SAtime" (ref ``:185-214``): the note tokens are
  transposed to [note, time] and self-attend over the 128-frame axis;
  heads B.

Reference quirks preserved bit-for-bit (they affect parity):

* post-LN residual blocks with ONE LayerNorm instance shared by every
  residual in a layer (ref ``:225,236,242`` — the same ``self.layer_norm``
  is applied after attention and after the FFN);
* token embeddings scaled by sqrt(hid_dim) before adding position embeddings
  (``:95,191``); note queries are NOT scaled (``:154-155``);
* attention scores divided by sqrt(head_dim), dropout applied to the
  attention weights (``:342-348``);
* the decoder's stage-1 cross-attention weights of the LAST layer are
  returned ``[B, n_frame, heads, n_note, n_bin]`` (``:164-165``).

Deliberate divergences (documented; same optimum, better TPU numerics):

* The onset/offset/mpe heads return **logits**; the loss uses
  sigmoid-BCE-with-logits instead of the reference's BCE-after-sigmoid
  (``model_spec2midi.py:172-174`` + ``m_training.py:149-156``). Inference
  applies the sigmoid explicitly.
* The encoder's unfold->Conv2d->Linear stem (``:65-97``) is collapsed into a
  single 65-tap convolution: because conv and linear-embedding compose
  linearly, ``Linear(flatten(Conv(window)))`` equals a conv over time with an
  effective kernel ``K_eff[m,h] = sum_{c,j,k: j+k=m} W_emb[(c,k),h] W_conv[c,j]``
  and bias ``b_emb[h] + sum_{c,k} W_emb[(c,k),h] b_conv[c]``. This avoids
  materializing the 65x-expanded window tensor (HBM-bound on TPU) and does
  ~3.7x fewer FLOPs. Parameters keep the reference factorization, so
  checkpoints map 1:1; equivalence is covered by tests.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig


def _dtype(name: str):
    # float64 exists for oracle/test runs only (requires jax_enable_x64).
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float64": jnp.float64}[name]


def stem_effective_kernel(conv_w, conv_b, emb_w, emb_b, *, cnn_channel,
                          cnn_kernel, hid_dim, n_margin):
    """Collapse the reference's unfold -> Conv2d -> Linear stem into one
    effective 65-tap kernel ``k_eff [n_proc, hid]`` + bias ``b_eff [hid]``
    (see the module docstring for the algebra)."""
    n_proc = 2 * n_margin + 1
    conv_out = n_proc - (cnn_kernel - 1)
    w = emb_w.reshape(cnn_channel, conv_out, hid_dim)
    k_eff = jnp.zeros((n_proc, hid_dim), dtype=jnp.float32)
    for j in range(cnn_kernel):
        shifted = jnp.pad(w, ((0, 0), (j, cnn_kernel - 1 - j), (0, 0)))
        k_eff = k_eff + jnp.einsum("c,cmh->mh", conv_w[:, j], shifted)
    b_eff = emb_b + jnp.einsum("cph,c->h", w, conv_b)
    return k_eff, b_eff


def fused_stem(spec_in, conv_w, conv_b, emb_w, emb_b, *, cnn_channel,
               cnn_kernel, hid_dim, n_margin, dtype):
    """Encoder stem: unfold -> Conv2d -> Linear collapsed into one 65-tap
    convolution (see the module docstring for the algebra). Shared by the
    flax module and the flax-free inference engine.

    ``spec_in [B, n_bin, n_margin*2 + n_frame]`` -> ``[B, n_frame, n_bin,
    hid]`` embeddings (pre position-embedding, in ``dtype``).
    """
    k_eff, b_eff = stem_effective_kernel(
        conv_w, conv_b, emb_w, emb_b, cnn_channel=cnn_channel,
        cnn_kernel=cnn_kernel, hid_dim=hid_dim, n_margin=n_margin)

    # The stem is ~0.5% of the model FLOPs: keep it f32 end to end
    # (mixed bf16/f32 conv operands break the transposed-conv gradient).
    # f64 compute (oracle runs) keeps the whole stem in f64.
    acc = jnp.float64 if dtype == jnp.float64 else jnp.float32
    # NHWC keeps hid on the lane axis end to end: the final transpose only
    # swaps sublane dims (n_frame <-> n_bin), not a hid-to-lane relayout
    # (the NCHW form measured 4.05 -> 3.45 ms fwd at batch 8, identical
    # bits).
    x = spec_in.astype(acc)[:, :, :, None]              # [B, n_bin, total, 1]
    kernel = k_eff.astype(acc)[None, :, None, :]        # [1, 65, 1, hid] HWIO
    emb = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )                                                    # [B, n_bin, n_frame, hid]
    emb = emb.astype(dtype) + b_eff.astype(dtype)
    return emb.transpose(0, 2, 1, 3)                     # [B, n_frame, n_bin, hid]


class MultiHeadAttention(nn.Module):
    """Scaled-dot-product MHA (ref ``MultiHeadAttentionLayer:308-360``).

    Returns ``(out, attention_weights)``; dropout acts on the weights.

    ``impl`` selects the compute path:

    * ``"xla"`` — einsum QK^T -> softmax -> PV (always returns weights);
    * ``"pallas"`` — the fused one-pass VMEM kernel
      (:mod:`nylon_amt_tpu.ops.attention`); scores never touch HBM. Weights
      are only produced when ``need_weights`` (differentiable). Attention
      dropout (the reference drops out the attention matrix itself —
      ``model_spec2midi.py:348``) runs in-kernel on real TPUs via the Pallas
      PRNG; the CPU interpreter falls back to the XLA path.
    """

    hid_dim: int
    n_heads: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True,
                 need_weights: bool = True):
        B = query.shape[0]
        H = self.n_heads
        head_dim = self.hid_dim // H

        # Module-owned projection params (torch Linear layout transposed).
        # Owning them (vs nn.Dense children) lets the Pallas path project
        # straight into the head-blocked [B, H, L, D] layout with the
        # transpose fused into the matmul — explicit transposes of Q/K/V/O
        # around the kernel would cost more HBM traffic than the fused
        # attention saves.
        def proj_params(name):
            w = self.param(f"{name}_kernel", nn.initializers.xavier_uniform(),
                           (self.hid_dim, self.hid_dim))
            b = self.param(f"{name}_bias", nn.initializers.zeros,
                           (self.hid_dim,))
            return w, b

        wq, bq = proj_params("fc_q")
        wk, bk = proj_params("fc_k")
        wv, bv = proj_params("fc_v")
        wo, bo = proj_params("fc_o")
        dt = self.dtype

        def proj_flat(x, w, b):
            y = jnp.dot(x.astype(dt), w.astype(dt),
                        preferred_element_type=jnp.float32).astype(dt)
            return y + b.astype(dt)

        from nylon_amt_tpu.ops.attention import (
            fused_mha,
            fused_mha_dropout,
            fused_mha_with_probs,
            on_tpu,
        )

        dropout_active = (not deterministic) and self.dropout > 0.0
        # The fused kernel handles dropout in-kernel (regenerated PRNG
        # streams in fwd/bwd) on real TPUs; the Pallas interpreter has no
        # PRNG, so CPU runs and "training while materializing attention
        # maps" fall back to the XLA path.
        use_pallas = self.impl == "pallas" and not (
            dropout_active and (need_weights or not on_tpu()))
        if use_pallas:
            interpret = not on_tpu()
            scale = 1.0 / float(head_dim) ** 0.5

            # The kernel consumes the projections' natural flat [B, L, H*D]
            # layout and splits heads by lane-slicing in VMEM — no transposes.
            qf = proj_flat(query, wq, bq)
            kf = proj_flat(key, wk, bk)
            vf = proj_flat(value, wv, bv)
            attn = None
            if need_weights:
                # Differentiable: the probs cotangent is a symbolic zero
                # unless a loss touches the returned maps (custom VJP in
                # ops/attention.py), so grads through this site match the
                # XLA path at reduction-order precision.
                out_f, attn = fused_mha_with_probs(qf, kf, vf, H, scale,
                                                   interpret)
            elif dropout_active:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, 2**31 - 1, dtype=jnp.int32)
                out_f = fused_mha_dropout(qf, kf, vf, H, scale,
                                          float(self.dropout), interpret, seed)
            else:
                out_f = fused_mha(qf, kf, vf, H, scale, interpret)
            out = jnp.dot(out_f, wo.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
            out = out + bo.astype(dt)
        else:
            def proj(x, w, b):
                return proj_flat(x, w, b).reshape(B, -1, H, head_dim)

            q = proj(query, wq, bq)
            k = proj(key, wk, bk)
            v = proj(value, wv, bv)
            # [B, heads, q_len, k_len]; accumulate in f32.
            energy = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            energy = energy / jnp.sqrt(jnp.float32(head_dim))
            attn = jax.nn.softmax(energy, axis=-1)
            attn_d = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn_d.astype(dt), v,
                           preferred_element_type=jnp.float32)
            o = o.astype(dt).reshape(B, -1, self.hid_dim)
            out = jnp.dot(o, wo.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)
            out = out + bo.astype(dt)
        return out, attn


class FeedForward(nn.Module):
    """Linear-ReLU-dropout-Linear (ref ``PositionwiseFeedforwardLayer:362-378``)."""

    hid_dim: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.pf_dim, name="fc_1", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(nn.relu(x), deterministic=deterministic)
        return nn.Dense(self.hid_dim, name="fc_2", dtype=self.dtype)(x)


class EncoderLayer(nn.Module):
    """Post-LN self-attention block with the shared-LayerNorm quirk
    (ref ``EncoderLayer:222-245``)."""

    hid_dim: int
    n_heads: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, src, deterministic: bool = True):
        # ONE instance, used twice. dtype pins the output to the compute
        # dtype (stats are still f32 inside flax); without it f32 params
        # promote bf16 residual streams to f32, doubling HBM traffic.
        ln = nn.LayerNorm(name="layer_norm", dtype=self.dtype,
                          epsilon=1e-5,  # torch default, not flax 1e-6
                          use_fast_variance=False)  # torch two-pass var

        drop = nn.Dropout(self.dropout)
        attn_out, _ = MultiHeadAttention(
            self.hid_dim, self.n_heads, self.dropout, self.dtype, self.impl,
            name="self_attention")(src, src, src, deterministic,
                                   need_weights=False)
        src = ln(src + drop(attn_out, deterministic=deterministic))
        ff = FeedForward(self.hid_dim, self.pf_dim, self.dropout, self.dtype,
                         name="positionwise_feedforward")(src, deterministic)
        return ln(src + drop(ff, deterministic=deterministic))


class DecoderLayerZero(nn.Module):
    """Cross-attention-only decoder layer (ref ``DecoderLayer_Zero:247-272``)."""

    hid_dim: int
    n_heads: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, enc_src, trg, deterministic: bool = True,
                 need_weights: bool = True):
        ln = nn.LayerNorm(name="layer_norm", dtype=self.dtype,
                          epsilon=1e-5,  # torch default, not flax 1e-6
                          use_fast_variance=False)  # torch two-pass var

        drop = nn.Dropout(self.dropout)
        attn_out, attention = MultiHeadAttention(
            self.hid_dim, self.n_heads, self.dropout, self.dtype, self.impl,
            name="encoder_attention")(trg, enc_src, enc_src, deterministic,
                                      need_weights=need_weights)
        trg = ln(trg + drop(attn_out, deterministic=deterministic))
        ff = FeedForward(self.hid_dim, self.pf_dim, self.dropout, self.dtype,
                         name="positionwise_feedforward")(trg, deterministic)
        return ln(trg + drop(ff, deterministic=deterministic)), attention


class DecoderLayer(nn.Module):
    """Self + cross attention decoder layer (ref ``DecoderLayer:274-306``);
    a single LayerNorm instance is shared by all three residuals."""

    hid_dim: int
    n_heads: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, enc_src, trg, deterministic: bool = True,
                 need_weights: bool = True):
        ln = nn.LayerNorm(name="layer_norm", dtype=self.dtype,
                          epsilon=1e-5,  # torch default, not flax 1e-6
                          use_fast_variance=False)  # torch two-pass var

        drop = nn.Dropout(self.dropout)
        sa_out, _ = MultiHeadAttention(
            self.hid_dim, self.n_heads, self.dropout, self.dtype, self.impl,
            name="self_attention")(trg, trg, trg, deterministic,
                                   need_weights=False)
        trg = ln(trg + drop(sa_out, deterministic=deterministic))
        ca_out, attention = MultiHeadAttention(
            self.hid_dim, self.n_heads, self.dropout, self.dtype, self.impl,
            name="encoder_attention")(trg, enc_src, enc_src, deterministic,
                                      need_weights=need_weights)
        trg = ln(trg + drop(ca_out, deterministic=deterministic))
        ff = FeedForward(self.hid_dim, self.pf_dim, self.dropout, self.dtype,
                         name="positionwise_feedforward")(trg, deterministic)
        return ln(trg + drop(ff, deterministic=deterministic)), attention


class FreqEncoder(nn.Module):
    """Frequency-axis encoder (ref ``Encoder_SPEC2MIDI:41-106``).

    Input ``[B, n_bin, margin_b + n_frame + margin_f]`` log-mel window;
    output ``[B, n_frame, n_bin, hid]``.
    """

    n_margin: int
    n_frame: int
    n_bin: int
    cnn_channel: int
    cnn_kernel: int
    hid_dim: int
    n_layers: int
    n_heads: int
    pf_dim: int
    dropout: float
    dtype: Any = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, spec_in, deterministic: bool = True):
        B = spec_in.shape[0]
        n_proc = 2 * self.n_margin + 1                      # 65
        conv_out = n_proc - (self.cnn_kernel - 1)           # 61
        cnn_dim = self.cnn_channel * conv_out               # 244

        # Reference-factorized parameters (checkpoint-compatible).
        conv_w = self.param(  # torch Conv2d(1, C, (1, k)) weight [C,1,1,k]
            "conv_kernel", nn.initializers.xavier_uniform(),
            (self.cnn_channel, self.cnn_kernel))
        conv_b = self.param("conv_bias", nn.initializers.zeros,
                            (self.cnn_channel,))
        emb_w = self.param(  # torch Linear(cnn_dim, hid).weight^T
            "tok_embedding_kernel", nn.initializers.xavier_uniform(),
            (cnn_dim, self.hid_dim))
        emb_b = self.param("tok_embedding_bias", nn.initializers.zeros,
                           (self.hid_dim,))

        # ---- fused stem: effective 65-tap kernel (see module docstring) ----
        emb = fused_stem(spec_in, conv_w, conv_b, emb_w, emb_b,
                         cnn_channel=self.cnn_channel,
                         cnn_kernel=self.cnn_kernel, hid_dim=self.hid_dim,
                         n_margin=self.n_margin, dtype=self.dtype)
        emb = emb.reshape(B * self.n_frame, self.n_bin, self.hid_dim)

        pos_emb = nn.Embed(self.n_bin, self.hid_dim, name="pos_embedding_freq",
                           dtype=self.dtype)
        pos = pos_emb(jnp.arange(self.n_bin))[None, :, :]
        h = emb * jnp.sqrt(jnp.float32(self.hid_dim)).astype(self.dtype) + pos
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        for i in range(self.n_layers):
            h = EncoderLayer(self.hid_dim, self.n_heads, self.pf_dim,
                             self.dropout, self.dtype, self.impl,
                             name=f"layers_freq_{i}")(h, deterministic)
        return h.reshape(B, self.n_frame, self.n_bin, self.hid_dim)


class Decoder(nn.Module):
    """Two-stage decoder (ref ``Decoder_SPEC2MIDI:112-216``).

    Returns a dict of logits: ``onset_A/offset_A/mpe_A [B, n_frame, n_note]``,
    ``velocity_A [B, n_frame, n_note, n_velocity]``, ``attention
    [B, n_frame, heads, n_note, n_bin]``, and the B-head equivalents.
    """

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
    return_attention: bool = True
    stage2: bool = True  # False = stage-1 only ("cafreq" ablation decoder)
    # >0 adds the string/fret tablature head on the stage-2 features:
    # ``string_B [B, n_frame, n_note, n_strings+1]`` class logits
    # (0 = no string; see ModelConfig.tab_head).
    n_strings: int = 0

    @nn.compact
    def __call__(self, enc_spec, deterministic: bool = True):
        B = enc_spec.shape[0]
        enc = enc_spec.reshape(B * self.n_frame, self.n_bin, self.hid_dim)

        # ---- stage 1: CAfreq ------------------------------------------------
        note_q = nn.Embed(self.n_note, self.hid_dim, name="pos_embedding_freq",
                          dtype=self.dtype)
        trg = jnp.broadcast_to(note_q(jnp.arange(self.n_note))[None],
                               (B * self.n_frame, self.n_note, self.hid_dim)
                               ).astype(self.dtype)
        # Only the LAST stage-1 layer's attention map is returned (ref
        # :164-165); earlier layers never need the weights.
        want = self.return_attention
        trg, attention = DecoderLayerZero(
            self.hid_dim, self.n_heads, self.pf_dim, self.dropout, self.dtype,
            self.impl, name="layer_zero_freq")(
                enc, trg, deterministic,
                need_weights=want and self.n_layers == 1)
        for i in range(self.n_layers - 1):
            trg, attention = DecoderLayer(
                self.hid_dim, self.n_heads, self.pf_dim, self.dropout,
                self.dtype, self.impl, name=f"layers_freq_{i}")(
                    enc, trg, deterministic,
                    need_weights=want and i == self.n_layers - 2)
        if attention is not None:
            attention = attention.reshape(B, self.n_frame, self.n_heads,
                                          self.n_note, self.n_bin)

        def head(name, n_out=1):
            return nn.Dense(n_out, name=name, dtype=self.dtype)

        def scalar_head(name, x):
            return head(name)(x).reshape(B, self.n_frame, self.n_note)

        out = {
            "onset_A": scalar_head("fc_onset_freq", trg),
            "offset_A": scalar_head("fc_offset_freq", trg),
            "mpe_A": scalar_head("fc_mpe_freq", trg),
            "velocity_A": head("fc_velocity_freq", self.n_velocity)(trg)
                .reshape(B, self.n_frame, self.n_note, self.n_velocity),
        }
        if attention is not None:
            out["attention"] = attention
        if not self.stage2:
            return out

        # ---- stage 2: SAtime ------------------------------------------------
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

        def scalar_head_t(name):
            x = head(name)(t).reshape(B, self.n_note, self.n_frame)
            return x.transpose(0, 2, 1)

        out.update({
            "onset_B": scalar_head_t("fc_onset_time"),
            "offset_B": scalar_head_t("fc_offset_time"),
            "mpe_B": scalar_head_t("fc_mpe_time"),
            "velocity_B": head("fc_velocity_time", self.n_velocity)(t)
                .reshape(B, self.n_note, self.n_frame, self.n_velocity)
                .transpose(0, 2, 1, 3),
        })
        if self.n_strings:
            out["string_B"] = (
                head("fc_string_time", self.n_strings + 1)(t)
                .reshape(B, self.n_note, self.n_frame, self.n_strings + 1)
                .transpose(0, 2, 1, 3))
        return out


class HFT(nn.Module):
    """Full hFT model (ref ``Model_SPEC2MIDI:9-35``).

    ``__call__(spec [B, n_bin, margin+n_frame+margin]) -> dict`` of logits
    (apply ``jax.nn.sigmoid`` to onset/offset/mpe for posteriors).
    """

    config: Config

    @nn.compact
    def __call__(self, input_spec, deterministic: bool = True):
        cfg = self.config
        m = cfg.model
        dt = _dtype(m.compute_dtype)
        impl = resolve_attention_impl(m.attention_impl)
        # TPU-native gradient checkpointing (the reference rewrite's
        # gradient_checkpointing flag, ref_model_spec2midi.py:82-91):
        # remat the encoder and decoder so the backward pass recomputes
        # their activations instead of holding them in HBM.
        Enc, Dec = FreqEncoder, Decoder
        if m.remat:
            Enc = nn.remat(FreqEncoder, static_argnums=(2,))
            Dec = nn.remat(Decoder, static_argnums=(2,))
        enc = Enc(
            n_margin=cfg.input.margin_b, n_frame=cfg.input.num_frame,
            n_bin=cfg.feature.n_bins, cnn_channel=m.cnn_channel,
            cnn_kernel=m.cnn_kernel, hid_dim=m.hid_dim, n_layers=m.enc_layer,
            n_heads=m.enc_head, pf_dim=m.pf_dim, dropout=m.dropout, dtype=dt,
            impl=impl, name="encoder")(input_spec, deterministic)
        return Dec(
            n_frame=cfg.input.num_frame, n_bin=cfg.feature.n_bins,
            n_note=cfg.midi.num_note, n_velocity=cfg.midi.num_velocity,
            hid_dim=m.hid_dim, n_layers=m.dec_layer, n_heads=m.dec_head,
            pf_dim=m.pf_dim, dropout=m.dropout, dtype=dt, impl=impl,
            return_attention=m.return_attention or impl == "xla",
            n_strings=m.n_strings if m.tab_head else 0,
            name="decoder")(enc, deterministic)


def resolve_attention_impl(impl: str) -> str:
    """"auto" -> the fused Pallas kernel on TPU, einsum elsewhere."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def build_model(config: Config) -> HFT:
    """Model factory honoring ``config.model.enc_alg``/``dec_alg``."""
    m = config.model
    if m.enc_alg == "cnntime_safreq" and m.dec_alg == "cafreq_satime":
        return HFT(config=config)
    from nylon_amt_tpu.models.ablation import build_ablation_model

    return build_ablation_model(config)


def init_params(config: Config, rng: jax.Array, batch_size: int = 1,
                reference_init: bool = True):
    """From-scratch parameters.

    By default the tree is resampled to match the reference's recipe
    (``model.apply(initialize_weights)``, ``m_training.py:31-33,141`` —
    xavier_uniform on every torch-dim>1 weight, torch-default biases); see
    :mod:`nylon_amt_tpu.models.init`. ``reference_init=False`` keeps raw
    flax defaults (structure-only uses).
    """
    model = build_model(config)
    spec = jnp.zeros((batch_size, config.feature.n_bins, config.window_frames),
                     jnp.float32)
    params = model.init({"params": rng}, spec, deterministic=True)["params"]
    if reference_init:
        from nylon_amt_tpu.models.init import reference_initialize

        params = reference_initialize(params, rng)
    return params
