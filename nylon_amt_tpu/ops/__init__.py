"""TPU compute ops: DSP frontend, attention kernels, resampling."""

from nylon_amt_tpu.ops.mel import MelFrontend, mel_filterbank
from nylon_amt_tpu.ops.resample import resample

__all__ = ["MelFrontend", "mel_filterbank", "resample"]
