"""Typed configuration for the nylon-amt TPU framework.

JSON round-trip compatible with the reference config schema
(``hftt_code/corpus/config.json:1-24``): the ``feature`` / ``input`` / ``midi``
sections use the same key names, so reference configs load unchanged.
``make_dataset``-style augmentation (``input.min_value`` / ``input.max_value`` /
``feature.n_bins`` — reference ``corpus/make_dataset.py:274-278,304-308``) is
represented as optional fields with the same semantics.

Model/training hyperparameters mirror the reference trainer flags
(``hftt_code/training/m_training.py:38-66``) but live in one validated,
serializable place instead of per-entry-point argparse duplication.
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class FeatureConfig:
    """Log-mel frontend geometry (reference ``corpus/config.json:2-12``)."""

    sr: int = 16000
    hop_sample: int = 256
    mel_bins: int = 256
    n_bins: int = 256
    fft_bins: int = 2048
    window_length: int = 2048
    log_offset: float = 1e-8
    window: str = "hann"
    pad_mode: str = "constant"

    @property
    def hop_sec(self) -> float:
        return self.hop_sample / self.sr

    @property
    def frames_per_sec(self) -> float:
        return self.sr / self.hop_sample

    def validate(self) -> None:
        if self.window != "hann":
            raise ValueError(f"unsupported window: {self.window!r}")
        if self.pad_mode not in ("constant", "reflect"):
            raise ValueError(f"unsupported pad_mode: {self.pad_mode!r}")
        if self.window_length > self.fft_bins:
            raise ValueError("window_length must be <= fft_bins")


@dataclass(frozen=True)
class InputConfig:
    """Training-window geometry (reference ``corpus/config.json:13-17``).

    ``min_value``/``max_value`` are the normalization stats the reference's
    ``make_dataset.py`` writes back into the config; ``min_value`` doubles as
    the padding value for window margins (``log(log_offset)`` when max_value
    is unset — reference ``corpus/make_dataset.py:94-103``).
    """

    margin_b: int = 32
    margin_f: int = 32
    num_frame: int = 128
    min_value: float = float(math.log(1e-8))
    max_value: float = 0.0

    @property
    def window_frames(self) -> int:
        """Total spectrogram frames per model input window (192 by default)."""
        return self.margin_b + self.num_frame + self.margin_f


@dataclass(frozen=True)
class MidiConfig:
    """Piano-roll geometry (reference ``corpus/config.json:18-23``)."""

    note_min: int = 21
    note_max: int = 108
    num_note: int = 88
    num_velocity: int = 128

    def validate(self) -> None:
        if self.num_note != self.note_max - self.note_min + 1:
            raise ValueError("num_note must equal note_max - note_min + 1")


@dataclass(frozen=True)
class ModelConfig:
    """hFT-Transformer hyperparameters.

    Defaults are the reference's reduced recipe
    (``training/m_training.py:54-61``); the paper-scale configuration is
    ``ModelConfig.paper_scale()`` (``training/m_training_ablation.py:50-57``).
    """

    cnn_channel: int = 4
    cnn_kernel: int = 5
    hid_dim: int = 64
    pf_dim: int = 128
    enc_layer: int = 2
    dec_layer: int = 2
    enc_head: int = 2
    dec_head: int = 2
    dropout: float = 0.1
    # Architecture variant (reference ablation grid,
    # ``model/model_spec2midi_ablation.py``): encoder in
    # {"cnntime_safreq" (main), "cnnblock_safreq"}, decoder in
    # {"cafreq_satime" (main), "cafreq", "linear_satime"}.
    enc_alg: str = "cnntime_safreq"
    dec_alg: str = "cafreq_satime"
    # TPU-first knobs, no reference analog: dtype used for matmul/attention
    # compute (params are always stored in float32), the attention kernel
    # ("auto" = fused Pallas on TPU, einsum elsewhere), and whether the
    # decoder materializes its last cross-attention map on the Pallas path
    # (the XLA path returns it for free, as the reference does).
    compute_dtype: str = "float32"
    attention_impl: str = "auto"
    return_attention: bool = False
    # Rematerialize encoder/decoder activations in the backward pass
    # (flax.linen.remat). The TPU-native equivalent of the reference
    # rewrite's gradient_checkpointing flag (ref_model_spec2midi.py:82-91):
    # trades MXU recompute for HBM residency.
    remat: bool = False
    # Learned string/fret tablature head (the reference repo's declared end
    # goal: classical-guitar transcription to Alphatab tablature —
    # reference README.md:27-37; BASELINE config 3 "string+fret tab head").
    # Adds fc_string_time on the stage-2 features: per (frame, pitch) cell,
    # n_strings+1 class logits (0 = no string, 1..n = string index, 1 = the
    # highest-pitched string). Off by default; piano checkpoints are
    # unaffected. The fret follows from (pitch, string, tuning) at export.
    tab_head: bool = False
    n_strings: int = 6

    @classmethod
    def paper_scale(cls) -> "ModelConfig":
        return cls(hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3,
                   enc_head=4, dec_head=4)

    def validate(self) -> None:
        if self.hid_dim % self.enc_head or self.hid_dim % self.dec_head:
            raise ValueError("hid_dim must be divisible by head counts")
        if self.tab_head:
            if self.dec_alg != "cafreq_satime":
                raise ValueError("tab_head requires the main two-stage "
                                 "decoder (dec_alg='cafreq_satime')")
            if self.n_strings < 1:
                raise ValueError("tab_head requires n_strings >= 1")


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference ``m_training.py:38-66``)."""

    epochs: int = 20
    batch_size: int = 8
    lr: float = 1e-4
    seed: int = 1234
    n_slice: int = 16
    weight_A: float = 1.0
    weight_B: float = 1.0
    # The reference parses -clip but never applies it (m_training.py:52); we
    # implement it for real, defaulting to off (None) to match the reference's
    # effective behavior.
    clip: float | None = None
    # ReduceLROnPlateau (torch defaults used by the reference: factor=0.1,
    # patience=10, mode='min' — m_training.py:147).
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    n_div_train: int = 1
    n_div_valid: int = 1
    n_div_test: int = 1
    # Checkpoint retention: keep the best checkpoint plus the newest K.
    # None keeps everything (the reference keeps all model_EEE_DDD.dat files).
    keep_checkpoints: int | None = None
    # Tunneled-backend hygiene: clear the transfer journal every N (epoch,
    # div) boundaries (see utils/tunnel.py — the tunnel retains every H2D
    # payload, ~3 MB/step, unbounded). No-op on non-journaling backends
    # (real libtpu, CPU). None disables.
    journal_reset_divs: int | None = 1


@dataclass(frozen=True)
class Config:
    feature: FeatureConfig = field(default_factory=FeatureConfig)
    input: InputConfig = field(default_factory=InputConfig)
    midi: MidiConfig = field(default_factory=MidiConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def validate(self) -> "Config":
        self.feature.validate()
        self.midi.validate()
        self.model.validate()
        return self

    # ---- JSON round-trip ----------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(tp, key):
            section = dict(d.get(key, {}))
            names = {f.name for f in dataclasses.fields(tp)}
            unknown = set(section) - names
            if unknown:
                raise ValueError(f"unknown keys in config[{key!r}]: {sorted(unknown)}")
            return tp(**section)

        return cls(
            feature=build(FeatureConfig, "feature"),
            input=build(InputConfig, "input"),
            midi=build(MidiConfig, "midi"),
            model=build(ModelConfig, "model"),
            train=build(TrainConfig, "train"),
        ).validate()

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_dict(), f, ensure_ascii=False, indent=4)

    # Convenience accessors used throughout the stack.
    @property
    def window_frames(self) -> int:
        return self.input.window_frames

    @property
    def pad_value(self) -> float:
        """Feature pad value for margins (reference ``make_dataset.py:94-97``)."""
        if self.feature.log_offset > 0.0:
            return float(math.log(self.feature.log_offset))
        return float(self.feature.log_offset)
