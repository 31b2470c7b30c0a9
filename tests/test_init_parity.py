"""From-scratch weight init parity vs the reference's ``initialize_weights``.

The reference starts training with ``model.apply(initialize_weights)``
(``m_training.py:31-33,141``): xavier_uniform on every torch-dim>1 weight,
biases left at torch module defaults (``U(±1/sqrt(fan_in))`` for
Linear/Conv2d). These tests derive the analytic per-parameter distribution
from the torch model itself (module type + weight fans), verify the torch
post-apply state obeys it (pinning the analytic model to reality), then
verify our ``init_params`` tree — exported to torch layout so fans agree —
obeys the SAME distributions: exact range bounds per leaf, per-leaf std for
large leaves, and pooled normalized moments across the whole tree.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.init as torch_init

import jax

from conftest import requires_reference
from test_ablation import _build_reference, _cfg, _ref_module
from test_model_parity import _load_reference_model

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import init_params
from nylon_amt_tpu.train.importer import export_state_dict


def initialize_weights(m):  # = m_training.py:31-33, verbatim semantics
    if hasattr(m, "weight") and m.weight.dim() > 1:
        nn.init.xavier_uniform_(m.weight.data)


def expected_distributions(ref_model):
    """torch param name -> ("uniform", bound) | ("const", v) | ("default",)
    after ``model.apply(initialize_weights)``."""
    out = {}
    for mod_name, mod in ref_model.named_modules():
        for pname, p in mod.named_parameters(recurse=False):
            full = f"{mod_name}.{pname}" if mod_name else pname
            if pname == "weight" and p.dim() > 1:
                fi, fo = torch_init._calculate_fan_in_and_fan_out(p)
                out[full] = ("uniform", math.sqrt(6.0 / (fi + fo)))
            elif pname == "bias" and isinstance(mod, (nn.Linear, nn.Conv2d)):
                fi, _ = torch_init._calculate_fan_in_and_fan_out(mod.weight)
                out[full] = ("uniform", 1.0 / math.sqrt(fi))
            elif isinstance(mod, (nn.LayerNorm, nn.BatchNorm2d)):
                out[full] = ("const", 1.0 if pname == "weight" else 0.0)
            else:  # nothing else exists in the reference models
                out[full] = ("default", None)
    return out


def check_against(dists, arrays, label):
    """Every array obeys its analytic distribution: exact range, per-leaf
    std when the leaf is large, and pooled moments over all uniform leaves
    (catches a wrong bound on small leaves like the 1-wide head weights)."""
    pooled = []
    for name, (kind, val) in dists.items():
        a = np.asarray(arrays[name], np.float64)
        if kind == "const":
            np.testing.assert_array_equal(a, val, err_msg=f"{label}:{name}")
            continue
        assert kind == "uniform", f"unclassified reference param {name}"
        amax = np.abs(a).max()
        assert amax <= val * (1 + 1e-6), (
            f"{label}:{name} exceeds bound {val:.4g} (max {amax:.4g})")
        if a.size >= 512:
            # U(-b, b) std = b/sqrt(3); 4-sigma-ish slack for the sample std.
            std = a.std()
            tol = 4.0 * val / math.sqrt(3.0) / math.sqrt(a.size)
            assert abs(std - val / math.sqrt(3.0)) <= tol + 0.02 * val, (
                f"{label}:{name} std {std:.4g} vs expected "
                f"{val / math.sqrt(3.0):.4g} (bound {val:.4g})")
        pooled.append(a.ravel() / val)
    pooled = np.concatenate(pooled)
    n = pooled.size
    assert pooled.max() > 1 - 20.0 / n and pooled.min() < -1 + 20.0 / n, label
    # pooled mean ~ N(0, (1/3)/n); std of U(-1,1) = 0.5774.
    assert abs(pooled.mean()) < 5.0 / math.sqrt(3.0 * n), label
    assert abs(pooled.std() - 1 / math.sqrt(3.0)) < 0.01, label


def _our_state_dict(cfg, seed):
    import jax.numpy as jnp

    from nylon_amt_tpu.models.hft import build_model
    from nylon_amt_tpu.models.init import reference_initialize

    model = build_model(cfg)
    spec = jnp.zeros((1, cfg.feature.n_bins, cfg.window_frames), jnp.float32)
    variables = model.init({"params": jax.random.key(seed)}, spec,
                           deterministic=True)
    params = reference_initialize(variables["params"], jax.random.key(seed))
    return export_state_dict(params, cfg.model.enc_layer, cfg.model.dec_layer,
                             cfg.model.enc_alg, cfg.model.dec_alg,
                             batch_stats=variables.get("batch_stats"))


@requires_reference
def test_main_model_init_matches_reference():
    cfg = Config(model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2,
                                   dec_layer=2, enc_head=2, dec_head=2,
                                   dropout=0.0))
    torch.manual_seed(11)
    ref_model = _load_reference_model(cfg)
    ref_model.apply(initialize_weights)
    dists = expected_distributions(ref_model)

    # The analytic model matches what torch actually produced...
    check_against(dists, {k: v.detach().numpy()
                          for k, v in ref_model.named_parameters()}, "torch")
    # ...and our from-scratch init satisfies the same distributions.
    check_against(dists, _our_state_dict(cfg, 5), "jax")


@requires_reference
@pytest.mark.parametrize("enc_alg,dec_alg", [
    ("cnnblock_safreq", "cafreq_satime"),   # 2FDT: Conv2d 4-D fans + BN
    ("cnntime_safreq", "linear_satime"),    # 1FLT: fc_convert
])
def test_ablation_init_matches_reference(enc_alg, dec_alg):
    cfg = _cfg(enc_alg, dec_alg)
    torch.manual_seed(3)
    ref_model = _build_reference(_ref_module(), cfg)
    ref_model.apply(initialize_weights)
    dists = expected_distributions(ref_model)

    check_against(dists, {k: v.detach().numpy()
                          for k, v in ref_model.named_parameters()}, "torch")
    check_against(dists, _our_state_dict(cfg, 9), "jax")


def test_reference_init_is_seeded_and_leafwise():
    """Same rng -> identical tree; the per-leaf streams are independent of
    tree topology elsewhere (path-keyed fold_in)."""
    cfg = Config(model=ModelConfig(hid_dim=32, pf_dim=64, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2))
    a = init_params(cfg, jax.random.key(4))
    b = init_params(cfg, jax.random.key(4))
    for (kp, va), (_, vb) in zip(
            jax.tree_util.tree_flatten_with_path(a)[0],
            jax.tree_util.tree_flatten_with_path(b)[0]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(kp))
    c = init_params(cfg, jax.random.key(5))
    flat_a = jax.tree_util.tree_leaves(a)
    flat_c = jax.tree_util.tree_leaves(c)
    assert any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(flat_a, flat_c))
