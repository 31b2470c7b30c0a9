"""Model zoo: the hFT-Transformer and its ablation variants."""

from nylon_amt_tpu.models.hft import HFT, build_model

__all__ = ["HFT", "build_model"]
