"""Model zoo: the hFT-Transformer, its ablation variants, and the
Onsets-and-Frames-style dual-CNN model."""

from nylon_amt_tpu.models.hft import HFT, build_model
from nylon_amt_tpu.models.onsets_frames import OnsetsFrames, build_onsets_frames

__all__ = ["HFT", "build_model", "OnsetsFrames", "build_onsets_frames"]
