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
            # MultiHeadAttention owns its projection params (flattened names)
            # so the Pallas path can project into head-blocked layout.
            rules[f"{prefix_t}.{blk}.{fc}.weight"] = (
                prefix_f + (blk, f"{fc}_kernel"), _TRANSPOSE)
            rules[f"{prefix_t}.{blk}.{fc}.bias"] = (
                prefix_f + (blk, f"{fc}_bias"), _DIRECT)
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


def build_rules(enc_layers: int, dec_layers: int,
                enc_alg: str = "cnntime_safreq",
                dec_alg: str = "cafreq_satime") -> dict:
    """Full state_dict-key -> (flax path, transform) mapping.

    Covers the main model (``Model_SPEC2MIDI``) and the ablation grid
    (``model_spec2midi_ablation.py``); ablation models use the same
    ``encoder_spec2midi`` / ``decoder_spec2midi`` attribute names.
    """
    r: dict[str, tuple] = {}
    e = "encoder_spec2midi"
    if enc_alg == "cnntime_safreq":
        r[f"{e}.conv.weight"] = (("encoder", "conv_kernel"), "conv")  # [C,1,1,k]->[C,k]
        r[f"{e}.conv.bias"] = (("encoder", "conv_bias"), _DIRECT)
        r[f"{e}.tok_embedding_freq.weight"] = (
            ("encoder", "tok_embedding_kernel"), _TRANSPOSE)
        r[f"{e}.tok_embedding_freq.bias"] = (
            ("encoder", "tok_embedding_bias"), _DIRECT)
    elif enc_alg == "cnnblock_safreq":
        # 4 conv blocks as nn.Sequential: indices 0/3 = Conv2d, 1/4 = BN.
        for b in range(1, 5):
            for seq_idx, conv_idx in ((0, 0), (3, 1)):
                r[f"{e}.conv_{b}.{seq_idx}.weight"] = (
                    ("encoder", f"conv_block_{b}", f"conv_{conv_idx}",
                     "kernel"), "conv2d")
                r[f"{e}.conv_{b}.{seq_idx}.bias"] = (
                    ("encoder", f"conv_block_{b}", f"conv_{conv_idx}",
                     "bias"), _DIRECT)
            for seq_idx, bn_idx in ((1, 0), (4, 1)):
                base = ("encoder", f"conv_block_{b}", f"bn_{bn_idx}")
                r[f"{e}.conv_{b}.{seq_idx}.weight"] = (base + ("scale",), _DIRECT)
                r[f"{e}.conv_{b}.{seq_idx}.bias"] = (base + ("bias",), _DIRECT)
                r[f"{e}.conv_{b}.{seq_idx}.running_mean"] = (
                    base + ("mean",), "batch_stat")
                r[f"{e}.conv_{b}.{seq_idx}.running_var"] = (
                    base + ("var",), "batch_stat")
                r[f"{e}.conv_{b}.{seq_idx}.num_batches_tracked"] = (None, "skip")
        r[f"{e}.tok_embedding_freq.weight"] = (
            ("encoder", "tok_embedding_freq", "kernel"), _TRANSPOSE)
        r[f"{e}.tok_embedding_freq.bias"] = (
            ("encoder", "tok_embedding_freq", "bias"), _DIRECT)
    else:
        raise ValueError(f"unknown enc_alg {enc_alg!r}")
    r[f"{e}.pos_embedding_freq.weight"] = (
        ("encoder", "pos_embedding_freq", "embedding"), _DIRECT)
    for i in range(enc_layers):
        r.update(_layer_rules(f"{e}.layers_freq.{i}",
                              ("encoder", f"layers_freq_{i}"),
                              has_self=True, has_cross=False))

    d = "decoder_spec2midi"
    freq_heads = ["fc_onset_freq", "fc_offset_freq", "fc_mpe_freq",
                  "fc_velocity_freq"]
    time_heads = ["fc_onset_time", "fc_offset_time", "fc_mpe_time",
                  "fc_velocity_time"]
    if dec_alg in ("cafreq_satime", "cafreq"):
        r[f"{d}.pos_embedding_freq.weight"] = (
            ("decoder", "pos_embedding_freq", "embedding"), _DIRECT)
        r.update(_layer_rules(f"{d}.layer_zero_freq",
                              ("decoder", "layer_zero_freq"),
                              has_self=False, has_cross=True))
        for i in range(dec_layers - 1):
            r.update(_layer_rules(f"{d}.layers_freq.{i}",
                                  ("decoder", f"layers_freq_{i}"),
                                  has_self=True, has_cross=True))
        r.update(_head_rules(d, ("decoder",), freq_heads))
    elif dec_alg == "linear_satime":
        r[f"{d}.fc_convert.weight"] = (("decoder", "fc_convert_kernel"),
                                       _TRANSPOSE)
        r[f"{d}.fc_convert.bias"] = (("decoder", "fc_convert_bias"), _DIRECT)
        r.update(_head_rules(d, ("decoder",), freq_heads))
    else:
        raise ValueError(f"unknown dec_alg {dec_alg!r}")
    if dec_alg in ("cafreq_satime", "linear_satime"):
        r[f"{d}.pos_embedding_time.weight"] = (
            ("decoder", "pos_embedding_time", "embedding"), _DIRECT)
        for i in range(dec_layers):
            r.update(_layer_rules(f"{d}.layers_time.{i}",
                                  ("decoder", f"layers_time_{i}"),
                                  has_self=True, has_cross=False))
        r.update(_head_rules(d, ("decoder",), time_heads))
    return r


def convert_state_dict(
    state_dict: Mapping[str, Any],
    enc_layers: int,
    dec_layers: int,
    enc_alg: str = "cnntime_safreq",
    dec_alg: str = "cafreq_satime",
    with_batch_stats: bool = False,
):
    """torch state_dict (tensors or ndarrays) -> nested flax params dict.

    With ``with_batch_stats`` (BatchNorm models) returns
    ``(params, batch_stats)``.
    """
    rules = build_rules(enc_layers, dec_layers, enc_alg, dec_alg)
    params: dict = {}
    batch_stats: dict = {}
    seen = set()
    for key, tensor in state_dict.items():
        if key not in rules:
            raise KeyError(f"unmapped reference parameter: {key}")
        seen.add(key)
        path, tf = rules[key]
        if tf == "skip":
            continue
        # np.array (not asarray): torch's .numpy() shares memory with the
        # live parameter tensor — without the copy, converted params would
        # silently track any further torch training steps.
        arr = np.array(getattr(tensor, "detach", lambda: tensor)().numpy()
                       if hasattr(tensor, "detach") else tensor,
                       dtype=np.float32, copy=True)
        if tf == _TRANSPOSE:
            arr = arr.T
        elif tf == "conv":
            arr = arr.reshape(arr.shape[0], arr.shape[-1])  # [C,1,1,k]->[C,k]
        elif tf == "conv2d":
            arr = arr.transpose(2, 3, 1, 0)  # torch OIHW -> flax HWIO
        target = batch_stats if tf == "batch_stat" else params
        node = target
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    missing = set(rules) - seen
    if missing:
        raise KeyError(f"reference state_dict missing keys: {sorted(missing)[:5]}")
    if with_batch_stats:
        return params, batch_stats
    return params


def export_state_dict(
    params: Mapping[str, Any],
    enc_layers: int,
    dec_layers: int,
    enc_alg: str = "cnntime_safreq",
    dec_alg: str = "cafreq_satime",
    batch_stats: Mapping[str, Any] | None = None,
) -> dict:
    """Inverse of :func:`convert_state_dict`: flax params -> torch-layout
    ``state_dict`` (numpy arrays, reference key names).

    Lets a checkpoint trained here be loaded back into the reference's
    PyTorch ``Model_SPEC2MIDI`` (``model_spec2midi.py:9-35``) via
    ``model.load_state_dict`` — the reverse interop direction, so results
    can be cross-validated in the original stack. Raises ``KeyError`` if
    ``params`` contains leaves the rule table does not cover (an
    architecture mismatch would otherwise be silently dropped).
    """
    import jax

    rules = build_rules(enc_layers, dec_layers, enc_alg, dec_alg)
    sd: dict = {}
    used: set[str] = set()
    for key, (path, tf) in rules.items():
        if tf == "skip":
            # BatchNorm num_batches_tracked: unused in eval; momentum-based
            # updates in the reference never read it either.
            sd[key] = np.zeros((), np.int64)
            continue
        tree = batch_stats if tf == "batch_stat" else params
        node = tree
        for p in path:
            node = node[p]
        used.add(("batch_stats:" if tf == "batch_stat" else "params:")
                 + "/".join(path))
        arr = np.asarray(node, dtype=np.float32)
        if tf == _TRANSPOSE:
            arr = arr.T
        elif tf == "conv":
            arr = arr.reshape(arr.shape[0], 1, 1, arr.shape[1])
        elif tf == "conv2d":
            arr = arr.transpose(3, 2, 0, 1)  # flax HWIO -> torch OIHW
        sd[key] = np.ascontiguousarray(arr)
    leaves = {"params:" + "/".join(str(k.key) for k in kp)
              for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    if batch_stats is not None:
        leaves |= {"batch_stats:" + "/".join(str(k.key) for k in kp)
                   for kp, _ in
                   jax.tree_util.tree_flatten_with_path(batch_stats)[0]}
    unexported = leaves - used
    # The tablature head (ModelConfig.tab_head) has no reference analog:
    # the torch Model_SPEC2MIDI cannot carry it, so it is dropped from the
    # export by design rather than erroring (everything the reference can
    # represent still round-trips).
    unexported = {p for p in unexported
                  if "/fc_string_time/" not in p + "/"}
    if unexported:
        raise KeyError(f"params leaves not covered by the export rules "
                       f"(architecture mismatch?): {sorted(unexported)[:5]}")
    return sd


def save_reference_checkpoint(path: str, params: Mapping[str, Any],
                              enc_layers: int, dec_layers: int,
                              enc_alg: str = "cnntime_safreq",
                              dec_alg: str = "cafreq_satime",
                              batch_stats: Mapping[str, Any] | None = None,
                              ) -> None:
    """Write a reference-format ``.dat`` (torch.save dict with
    ``model_dict``) that both :func:`load_reference_checkpoint` and the
    reference's resume path (``m_training.py:264-299``) can read."""
    import torch

    sd = export_state_dict(params, enc_layers, dec_layers, enc_alg, dec_alg,
                           batch_stats)
    torch.save({"model_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)


def load_reference_checkpoint(path: str, enc_layers: int, dec_layers: int,
                              enc_alg: str = "cnntime_safreq",
                              dec_alg: str = "cafreq_satime") -> dict:
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
    return convert_state_dict(sd, enc_layers, dec_layers, enc_alg, dec_alg)
