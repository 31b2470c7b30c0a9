"""Ablation model variants: forward parity vs the PyTorch reference grid."""

import os
import sys

import numpy as np
import pytest
import torch

import jax

from conftest import REFERENCE_PATH, requires_reference

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import build_model
from nylon_amt_tpu.train.importer import convert_state_dict


def _ref_module():
    sys.path.insert(0, os.path.join(REFERENCE_PATH, "hftt_code", "model"))
    try:
        import model_spec2midi_ablation as ref
    finally:
        sys.path.pop(0)
    return ref


def _cfg(enc_alg, dec_alg):
    return Config(model=ModelConfig(hid_dim=32, pf_dim=64, enc_layer=2,
                                    dec_layer=2, enc_head=2, dec_head=2,
                                    dropout=0.0, enc_alg=enc_alg,
                                    dec_alg=dec_alg))


def _build_reference(ref, cfg):
    m = cfg.model
    if m.enc_alg == "cnntime_safreq":
        enc = ref.Encoder_CNNtime_SAfreq(
            cfg.input.margin_b, cfg.input.num_frame, cfg.feature.n_bins,
            m.cnn_channel, m.cnn_kernel, m.hid_dim, m.enc_layer, m.enc_head,
            m.pf_dim, m.dropout, "cpu")
    else:
        enc = ref.Encoder_CNNblock_SAfreq(
            cfg.input.margin_b, cfg.input.num_frame, cfg.feature.n_bins,
            m.hid_dim, m.enc_layer, m.enc_head, m.pf_dim, m.dropout,
            0.0, "cpu")
    dec_cls = {"cafreq_satime": ref.Decoder_CAfreq_SAtime,
               "cafreq": ref.Decoder_CAfreq,
               "linear_satime": ref.Decoder_linear_SAtime}[m.dec_alg]
    dec = dec_cls(cfg.input.num_frame, cfg.feature.n_bins, cfg.midi.num_note,
                  cfg.midi.num_velocity, m.hid_dim, m.dec_layer, m.dec_head,
                  m.pf_dim, m.dropout, "cpu")
    if m.dec_alg == "cafreq":
        return ref.Model_single(enc, dec)
    return ref.Model_combination(enc, dec)


@requires_reference
@pytest.mark.parametrize("enc_alg,dec_alg", [
    ("cnntime_safreq", "cafreq_satime"),   # 1FDT
    ("cnntime_safreq", "cafreq"),          # 1FDN
    ("cnntime_safreq", "linear_satime"),   # 1FLT
    ("cnnblock_safreq", "cafreq_satime"),  # 2FDT
])
def test_ablation_forward_parity(rng, enc_alg, dec_alg):
    cfg = _cfg(enc_alg, dec_alg)
    ref = _ref_module()
    torch.manual_seed(0)
    ref_model = _build_reference(ref, cfg)
    ref_model.eval()

    with_bn = enc_alg == "cnnblock_safreq"
    if with_bn:
        params, batch_stats = convert_state_dict(
            ref_model.state_dict(), cfg.model.enc_layer, cfg.model.dec_layer,
            enc_alg, dec_alg, with_batch_stats=True)
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        params = convert_state_dict(ref_model.state_dict(),
                                    cfg.model.enc_layer, cfg.model.dec_layer,
                                    enc_alg, dec_alg)
        variables = {"params": params}

    spec = rng.standard_normal((2, 256, 192)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(spec))

    model = build_model(cfg)
    out = model.apply(variables, spec, deterministic=True)

    if dec_alg == "cafreq":
        names = ["onset_A", "offset_A", "mpe_A", "velocity_A"]
    else:
        names = ["onset_A", "offset_A", "mpe_A", "velocity_A",
                 "onset_B", "offset_B", "mpe_B", "velocity_B"]
    assert len(ref_out) == len(names)
    atol = 1e-4 if with_bn else 3e-5
    for name, ref_arr in zip(names, ref_out):
        got = np.asarray(out[name])
        if not name.startswith("velocity"):
            got = np.asarray(jax.nn.sigmoid(got))
        np.testing.assert_allclose(got, ref_arr.numpy(), atol=atol,
                                   err_msg=f"{enc_alg}/{dec_alg}/{name}")
