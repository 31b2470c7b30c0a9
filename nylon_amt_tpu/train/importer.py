"""PyTorch -> JAX weight conversion for reference hFT checkpoints.

The reference saves whole-model pickles (``model_XXX_YYY.pkl``,
``m_training.py:372-373``) and ``.dat`` dicts containing ``model_dict`` (a
torch ``state_dict`` — ``m_training.py:374-392``). This module maps those
tensors onto our flax parameter tree so published checkpoints (e.g. the
upstream ``model_016_003.pkl``) can be evaluated on TPU without retraining,
and so parity tests can drive both implementations with identical weights.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

# torch Linear stores weight [out, in]; flax Dense kernel is [in, out].
_TRANSPOSE = "T"
_DIRECT = "="


def _layer_rules(prefix_t: str, prefix_f: tuple, has_self: bool, has_cross: bool):
    """Param mapping rules for one transformer layer."""
    rules = {}
    rules[f"{prefix_t}.layer_norm.weight"] = (prefix_f + ("layer_norm", "scale"), _DIRECT)
    rules[f"{prefix_t}.layer_norm.bias"] = (prefix_f + ("layer_norm", "bias"), _DIRECT)
    attn_blocks = []
    if has_self:
        attn_blocks.append("self_attention")
    if has_cross:
        attn_blocks.append("encoder_attention")
    for blk in attn_blocks:
        for fc in ("fc_q", "fc_k", "fc_v", "fc_o"):
            rules[f"{prefix_t}.{blk}.{fc}.weight"] = (prefix_f + (blk, fc, "kernel"), _TRANSPOSE)
            rules[f"{prefix_t}.{blk}.{fc}.bias"] = (prefix_f + (blk, fc, "bias"), _DIRECT)
    for fc in ("fc_1", "fc_2"):
        rules[f"{prefix_t}.positionwise_feedforward.{fc}.weight"] = (
            prefix_f + ("positionwise_feedforward", fc, "kernel"), _TRANSPOSE)
        rules[f"{prefix_t}.positionwise_feedforward.{fc}.bias"] = (
            prefix_f + ("positionwise_feedforward", fc, "bias"), _DIRECT)
    return rules


def _head_rules(prefix_t: str, prefix_f: tuple, names: list[str]):
    rules = {}
    for n in names:
        rules[f"{prefix_t}.{n}.weight"] = (prefix_f + (n, "kernel"), _TRANSPOSE)
        rules[f"{prefix_t}.{n}.bias"] = (prefix_f + (n, "bias"), _DIRECT)
    return rules


def build_rules(enc_layers: int, dec_layers: int) -> dict:
    """Full state_dict-key -> (flax path, transform) mapping for HFT."""
    r: dict[str, tuple] = {}
    e = "encoder_spec2midi"
    r[f"{e}.conv.weight"] = (("encoder", "conv_kernel"), "conv")  # [C,1,1,k]->[C,k]
    r[f"{e}.conv.bias"] = (("encoder", "conv_bias"), _DIRECT)
    r[f"{e}.tok_embedding_freq.weight"] = (("encoder", "tok_embedding_kernel"), _TRANSPOSE)
    r[f"{e}.tok_embedding_freq.bias"] = (("encoder", "tok_embedding_bias"), _DIRECT)
    r[f"{e}.pos_embedding_freq.weight"] = (
        ("encoder", "pos_embedding_freq", "embedding"), _DIRECT)
    for i in range(enc_layers):
        r.update(_layer_rules(f"{e}.layers_freq.{i}",
                              ("encoder", f"layers_freq_{i}"),
                              has_self=True, has_cross=False))

    d = "decoder_spec2midi"
    r[f"{d}.pos_embedding_freq.weight"] = (
        ("decoder", "pos_embedding_freq", "embedding"), _DIRECT)
    r[f"{d}.pos_embedding_time.weight"] = (
        ("decoder", "pos_embedding_time", "embedding"), _DIRECT)
    r.update(_layer_rules(f"{d}.layer_zero_freq", ("decoder", "layer_zero_freq"),
                          has_self=False, has_cross=True))
    for i in range(dec_layers - 1):
        r.update(_layer_rules(f"{d}.layers_freq.{i}",
                              ("decoder", f"layers_freq_{i}"),
                              has_self=True, has_cross=True))
    for i in range(dec_layers):
        r.update(_layer_rules(f"{d}.layers_time.{i}",
                              ("decoder", f"layers_time_{i}"),
                              has_self=True, has_cross=False))
    r.update(_head_rules(d, ("decoder",), [
        "fc_onset_freq", "fc_offset_freq", "fc_mpe_freq", "fc_velocity_freq",
        "fc_onset_time", "fc_offset_time", "fc_mpe_time", "fc_velocity_time",
    ]))
    return r


def convert_state_dict(
    state_dict: Mapping[str, Any],
    enc_layers: int,
    dec_layers: int,
) -> dict:
    """torch state_dict (tensors or ndarrays) -> nested flax params dict."""
    rules = build_rules(enc_layers, dec_layers)
    params: dict = {}
    seen = set()
    for key, tensor in state_dict.items():
        if key not in rules:
            raise KeyError(f"unmapped reference parameter: {key}")
        seen.add(key)
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)().numpy()
                         if hasattr(tensor, "detach") else tensor,
                         dtype=np.float32)
        path, tf = rules[key]
        if tf == _TRANSPOSE:
            arr = arr.T
        elif tf == "conv":
            arr = arr.reshape(arr.shape[0], arr.shape[-1])  # [C,1,1,k]->[C,k]
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    missing = set(rules) - seen
    if missing:
        raise KeyError(f"reference state_dict missing keys: {sorted(missing)[:5]}")
    return params


def load_reference_checkpoint(path: str, enc_layers: int, dec_layers: int) -> dict:
    """Load a reference ``.dat``/``.pkl`` checkpoint into flax params.

    ``.dat`` files are torch.save dicts with a ``model_dict`` state_dict
    (``m_training.py:374-392``); ``.pkl`` files are whole-model pickles whose
    ``state_dict()`` we extract. Requires torch for unpickling.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_dict" in obj:
        sd = obj["model_dict"]
    elif hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj
    return convert_state_dict(sd, enc_layers, dec_layers)
