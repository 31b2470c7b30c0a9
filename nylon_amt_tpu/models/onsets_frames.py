"""Onsets-and-Frames-style dual-CNN transcription model.

TPU-native counterpart of the reference's unused "optimized rewrite" file
``hftt_code/model/ref_model_spec2midi.py``. That file holds two things:

1. ``SimplifiedTranscriptionModel`` (``ref_model_spec2midi.py:7-75``): two
   independent CNN stacks (onset detection / frame prediction), each
   Conv3x3(32) -> BatchNorm -> ReLU -> MaxPool2 -> Conv3x3(64) -> BatchNorm
   -> ReLU -> MaxPool2 -> Dropout(0.3), flattened into MLP heads
   (Linear -> ReLU -> Dropout(0.3) -> Linear -> sigmoid) over the 88 notes.
   :class:`OnsetsFrames` below is that architecture.
2. A rewrite of ``Model_SPEC2MIDI`` with a ``gradient_checkpointing`` flag
   (``ref_model_spec2midi.py:77-91``). The capability lands on the main
   model instead: ``ModelConfig.remat=True`` wraps the hFT encoder and
   decoder in ``flax.linen.remat`` (XLA rematerialisation — the TPU way to
   trade MXU FLOPs for HBM residency), see :mod:`nylon_amt_tpu.models.hft`.

TPU-first choices (deliberate divergences, documented):

* NHWC conv layout (``[B, bins, frames, channel]``) — the native layout for
  TPU convolutions — instead of torch's NCHW.
* SAME-padded convs + 2x2 max-pool reduce both axes exactly as the torch
  stack does for even inputs, so the flattened feature size matches.
* Heads return **logits**; callers apply ``jax.nn.sigmoid`` (same divergence
  as the main model — pairs with sigmoid-BCE-with-logits in training).
* BatchNorm uses flax ``use_running_average=deterministic`` with
  ``batch_stats`` collection (the trainer already threads ``batch_stats``
  for the CNN-block ablation encoder).

The reference model emits ONE 88-way prediction per whole input window
(it flattens every frame into a single vector — ``ref_model_spec2midi.py:69-73``);
that global-pooling-free flatten is preserved here because it is the
defining (if odd) behavior of the component.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config


class _ConvStack(nn.Module):
    """One detection stack (ref ``ref_model_spec2midi.py:12-35``)."""

    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, bins, frames, 1] (NHWC)
        for ch in (32, 64):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class _Head(nn.Module):
    """Flatten -> MLP head (ref ``ref_model_spec2midi.py:41-55``), logits."""

    hidden_dim: int
    n_notes: int
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.n_notes, dtype=jnp.float32)(x)


class OnsetsFrames(nn.Module):
    """Dual-stack onset/frame model (ref ``SimplifiedTranscriptionModel``).

    ``__call__(spec [B, n_bin, T]) -> {"onset": [B, n_notes],
    "frame": [B, n_notes]}`` logits.
    """

    n_notes: int = 88
    hidden_dim: int = 256
    dropout: float = 0.3
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, spec, deterministic: bool = True):
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            self.compute_dtype]
        x = spec[..., None].astype(dt)  # [B, bins, frames, 1] NHWC
        onset_feat = _ConvStack(self.dropout, dt, name="onset_stack")(
            x, deterministic)
        frame_feat = _ConvStack(self.dropout, dt, name="frame_stack")(
            x, deterministic)
        onset = _Head(self.hidden_dim, self.n_notes, self.dropout, dt,
                      name="onset_pred")(onset_feat, deterministic)
        frame = _Head(self.hidden_dim, self.n_notes, self.dropout, dt,
                      name="frame_pred")(frame_feat, deterministic)
        return {"onset": onset, "frame": frame}


def build_onsets_frames(config: Config, hidden_dim: int = 256) -> OnsetsFrames:
    return OnsetsFrames(n_notes=config.midi.num_note, hidden_dim=hidden_dim,
                        compute_dtype=config.model.compute_dtype)


def init_onsets_frames(config: Config, rng: jax.Array, batch_size: int = 1,
                       hidden_dim: int = 256):
    """-> (model, variables) with params + batch_stats collections."""
    model = build_onsets_frames(config, hidden_dim)
    spec = jnp.zeros(
        (batch_size, config.feature.n_bins, config.window_frames),
        jnp.float32)
    variables = model.init({"params": rng}, spec, deterministic=True)
    return model, variables
