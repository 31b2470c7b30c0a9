"""nylon-amt-tpu: a TPU-native automatic music transcription framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
``d-f/nylon-amt`` (the hFT-Transformer AMT pipeline, ISMIR 2023,
arXiv 2307.04305): WAV -> log-mel spectrogram -> hierarchical frequency/time
transformer -> onset/offset/frame/velocity posteriors -> note events -> MIDI,
with mir_eval-equivalent scoring, a MAESTRO/MAPS corpus pipeline, and
data-parallel training over TPU meshes.

Unlike the reference, this framework is fully self-contained: it ships its own
MIDI file reader/writer, DSP frontend, and transcription metrics (no
torchaudio / mido / pretty_midi / mir_eval dependencies).
"""

from nylon_amt_tpu.config import (
    Config,
    FeatureConfig,
    InputConfig,
    MidiConfig,
    ModelConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "FeatureConfig",
    "InputConfig",
    "MidiConfig",
    "ModelConfig",
    "TrainConfig",
    "__version__",
]
