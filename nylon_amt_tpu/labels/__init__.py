"""MIDI -> note events -> frame-aligned training targets."""

from nylon_amt_tpu.labels.midi2note import midi2note
from nylon_amt_tpu.labels.note2label import note2label

__all__ = ["midi2note", "note2label"]
