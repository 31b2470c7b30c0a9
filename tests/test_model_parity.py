"""Bit-level parity of the flax hFT model vs the PyTorch reference.

Instantiates the reference ``Model_SPEC2MIDI`` (imported from the read-only
reference checkout; skipped when unavailable), copies its weights through the
importer, and checks every output head on identical inputs. This validates
both the model math (incl. the fused conv-stem rewrite) and the converter.
"""

import os
import sys

import numpy as np
import pytest
import torch

from conftest import REFERENCE_PATH, requires_reference

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import HFT
from nylon_amt_tpu.train.importer import convert_state_dict

import jax


def _load_reference_model(cfg: Config, device="cpu"):
    sys.path.insert(0, os.path.join(REFERENCE_PATH, "hftt_code", "model"))
    try:
        import model_spec2midi as ref
    finally:
        sys.path.pop(0)
    m = cfg.model
    encoder = ref.Encoder_SPEC2MIDI(
        cfg.input.margin_b, cfg.input.num_frame, cfg.feature.n_bins,
        m.cnn_channel, m.cnn_kernel, m.hid_dim, m.enc_layer, m.enc_head,
        m.pf_dim, m.dropout, device)
    decoder = ref.Decoder_SPEC2MIDI(
        cfg.input.num_frame, cfg.feature.n_bins, cfg.midi.num_note,
        cfg.midi.num_velocity, m.hid_dim, m.dec_layer, m.dec_head,
        m.pf_dim, m.dropout, device)
    return ref.Model_SPEC2MIDI(encoder, decoder)


@requires_reference
@pytest.mark.parametrize("dec_layers", [1, 2])
def test_forward_parity(rng, dec_layers):
    cfg = Config(model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2,
                                   dec_layer=dec_layers, enc_head=2,
                                   dec_head=2, dropout=0.0))
    torch.manual_seed(0)
    ref_model = _load_reference_model(cfg)
    ref_model.eval()

    params = convert_state_dict(ref_model.state_dict(),
                                cfg.model.enc_layer, cfg.model.dec_layer)

    B = 2
    spec = rng.standard_normal((B, 256, 192)).astype(np.float32)

    with torch.no_grad():
        (t_on_A, t_off_A, t_mpe_A, t_vel_A, t_attn,
         t_on_B, t_off_B, t_mpe_B, t_vel_B) = ref_model(torch.from_numpy(spec))

    model = HFT(config=cfg)
    out = model.apply({"params": params}, spec, deterministic=True)

    def sig(x):
        return np.asarray(jax.nn.sigmoid(x))

    # A heads (reference applies sigmoid inside the model; ours are logits).
    np.testing.assert_allclose(sig(out["onset_A"]), t_on_A.numpy(), atol=2e-5)
    np.testing.assert_allclose(sig(out["offset_A"]), t_off_A.numpy(), atol=2e-5)
    np.testing.assert_allclose(sig(out["mpe_A"]), t_mpe_A.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["velocity_A"]), t_vel_A.numpy(),
                               atol=5e-4)
    # attention weights of the last stage-1 layer
    np.testing.assert_allclose(np.asarray(out["attention"]), t_attn.numpy(),
                               atol=2e-5)
    # B heads
    np.testing.assert_allclose(sig(out["onset_B"]), t_on_B.numpy(), atol=2e-5)
    np.testing.assert_allclose(sig(out["offset_B"]), t_off_B.numpy(), atol=2e-5)
    np.testing.assert_allclose(sig(out["mpe_B"]), t_mpe_B.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["velocity_B"]), t_vel_B.numpy(),
                               atol=5e-4)


def test_output_shapes_and_jit(rng):
    cfg = Config()  # reduced recipe defaults
    model = HFT(config=cfg)
    spec = rng.standard_normal((2, 256, 192)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, spec)["params"]
    fwd = jax.jit(lambda p, s: model.apply({"params": p}, s))
    out = fwd(params, spec)
    assert out["onset_A"].shape == (2, 128, 88)
    assert out["velocity_B"].shape == (2, 128, 88, 128)
    assert out["attention"].shape == (2, 128, cfg.model.dec_head, 88, 256)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_dropout_rng_changes_output(rng):
    cfg = Config()
    model = HFT(config=cfg)
    spec = rng.standard_normal((1, 256, 192)).astype(np.float32)
    params = model.init({"params": jax.random.key(0)}, spec)["params"]
    o1 = model.apply({"params": params}, spec, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    o2 = model.apply({"params": params}, spec, deterministic=False,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1["onset_A"]), np.asarray(o2["onset_A"]))


def test_export_roundtrip(rng):
    """export_state_dict is the exact inverse of convert_state_dict."""
    from nylon_amt_tpu.models.hft import init_params
    from nylon_amt_tpu.train.importer import export_state_dict

    cfg = Config(model=ModelConfig(hid_dim=32, pf_dim=64, enc_layer=2,
                                   dec_layer=2, enc_head=2, dec_head=2,
                                   dropout=0.0))
    params = init_params(cfg, jax.random.key(3))
    sd = export_state_dict(params, cfg.model.enc_layer, cfg.model.dec_layer)
    back = convert_state_dict(sd, cfg.model.enc_layer, cfg.model.dec_layer)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for kp, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v, np.float32), flat_b[kp],
                                      err_msg=jax.tree_util.keystr(kp))


@requires_reference
def test_export_torch_forward_parity(rng):
    """A checkpoint trained here, exported to a torch state_dict and loaded
    into the reference Model_SPEC2MIDI (strict keys), reproduces our
    forward — the reverse interop direction of test_forward_parity."""
    from nylon_amt_tpu.models.hft import init_params
    from nylon_amt_tpu.train.importer import export_state_dict

    cfg = Config(model=ModelConfig(hid_dim=64, pf_dim=128, enc_layer=2,
                                   dec_layer=2, enc_head=2, dec_head=2,
                                   dropout=0.0))
    params = init_params(cfg, jax.random.key(7))
    sd = export_state_dict(params, cfg.model.enc_layer, cfg.model.dec_layer)

    ref_model = _load_reference_model(cfg)
    ref_model.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                               for k, v in sd.items()}, strict=True)
    ref_model.eval()

    spec = rng.standard_normal((2, 256, 192)).astype(np.float32)
    with torch.no_grad():
        (t_on_A, _, _, t_vel_A, t_attn,
         t_on_B, _, t_mpe_B, _) = ref_model(torch.from_numpy(spec))

    model = HFT(config=cfg)
    out = model.apply({"params": params}, spec, deterministic=True)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out["onset_A"])),
                               t_on_A.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["velocity_A"]),
                               t_vel_A.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["attention"]), t_attn.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out["onset_B"])),
                               t_on_B.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out["mpe_B"])),
                               t_mpe_B.numpy(), atol=2e-5)


def test_layernorm_epsilon_matches_torch(rng):
    """Pin LN eps to torch's 1e-5: flax's 1e-6 default passed every
    random-init parity test at atol 2e-5, then amplified to ~3e-3 posterior
    deltas on a trained checkpoint. A low-variance input makes the LN
    eps-dominated (rsqrt(1e-5 + eps) differs 25% between the two defaults),
    and attention/FFN output projections are zeroed so the layer reduces to
    ln(ln(x)) — the residual path alone."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from nylon_amt_tpu.models.hft import EncoderLayer
    from nylon_amt_tpu.ops.layer_fused import _LN_EPS

    assert _LN_EPS == torch.nn.LayerNorm(1).eps  # fused kernels' constant

    hid = 8
    layer = EncoderLayer(hid_dim=hid, n_heads=2, pf_dim=16, dropout=0.0)
    x = (0.7 + 3e-3 * rng.standard_normal((1, 4, hid))).astype(np.float32)
    params = layer.init(jax.random.key(0), x)["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    sa = params["self_attention"]
    sa["fc_o_kernel"] = np.zeros_like(sa["fc_o_kernel"])
    sa["fc_o_bias"] = np.zeros_like(sa["fc_o_bias"])
    ff2 = params["positionwise_feedforward"]["fc_2"]
    ff2["kernel"] = np.zeros_like(ff2["kernel"])
    ff2["bias"] = np.zeros_like(ff2["bias"])
    g = rng.standard_normal(hid).astype(np.float32)
    b = rng.standard_normal(hid).astype(np.float32)
    params["layer_norm"]["scale"] = g
    params["layer_norm"]["bias"] = b

    ours = np.asarray(layer.apply({"params": params}, x, deterministic=True))

    xt = torch.from_numpy(x)
    gt, bt = torch.from_numpy(g), torch.from_numpy(b)
    ref = F.layer_norm(F.layer_norm(xt, (hid,), gt, bt), (hid,), gt, bt)
    # atol leaves room for f32 (x - mu) cancellation on this adversarial
    # input (~2e-5, hits torch's own f32 path too) while staying far below
    # the signals under test: wrong eps ~0.3 abs, fast variance ~3e-3 abs.
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)
