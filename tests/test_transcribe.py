"""Batched sliding-window transcription parity vs the reference chunk loop."""

import os
import sys
import types

import numpy as np
import pytest
import torch

from conftest import REFERENCE_PATH, requires_reference

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer.transcribe import Transcriber
from nylon_amt_tpu.train.importer import convert_state_dict


def _tiny_cfg():
    return Config(model=ModelConfig(hid_dim=32, pf_dim=64, enc_layer=1,
                                    dec_layer=1, enc_head=2, dec_head=2,
                                    dropout=0.0))


def _reference_amt_with_model(cfg):
    """Reference AMT wired to a reference torch model (cpu)."""
    for mod in ("torchaudio", "pretty_midi"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.path.insert(0, os.path.join(REFERENCE_PATH, "hftt_code", "model"))
    try:
        import amt as ref_amt
        import model_spec2midi as ref_model
    finally:
        sys.path.pop(0)
    m = cfg.model
    torch.manual_seed(7)
    encoder = ref_model.Encoder_SPEC2MIDI(
        cfg.input.margin_b, cfg.input.num_frame, cfg.feature.n_bins,
        m.cnn_channel, m.cnn_kernel, m.hid_dim, m.enc_layer, m.enc_head,
        m.pf_dim, m.dropout, "cpu")
    decoder = ref_model.Decoder_SPEC2MIDI(
        cfg.input.num_frame, cfg.feature.n_bins, cfg.midi.num_note,
        cfg.midi.num_velocity, m.hid_dim, m.dec_layer, m.dec_head, m.pf_dim,
        m.dropout, "cpu")
    model = ref_model.Model_SPEC2MIDI(encoder, decoder)
    model.eval()
    config_dict = {
        "feature": {"sr": 16000, "hop_sample": 256, "n_bins": 256},
        "input": {"margin_b": 32, "margin_f": 32, "num_frame": 128,
                  "min_value": cfg.input.min_value},
        "midi": {"num_note": 88, "note_min": 21, "num_velocity": 128},
    }
    amt = ref_amt.AMT(config_dict, None)
    amt.model = model
    amt.device = "cpu"
    return amt, model


@requires_reference
@pytest.mark.parametrize("T", [130, 256])
def test_transcript_parity(rng, T):
    cfg = _tiny_cfg()
    amt, ref_model = _reference_amt_with_model(cfg)
    params = convert_state_dict(ref_model.state_dict(), cfg.model.enc_layer,
                                cfg.model.dec_layer)
    feature = (rng.standard_normal((T, 256)) * 2 - 8).astype(np.float32)

    ref_out = amt.transcript(feature)  # 8-tuple
    tr = Transcriber(cfg, params=params, batch_windows=2)
    ours = tr.transcript(feature)

    names = ["onset_A", "offset_A", "mpe_A", "velocity_A",
             "onset_B", "offset_B", "mpe_B", "velocity_B"]
    for name, ref_arr in zip(names, ref_out):
        got = ours[name]
        assert got.shape == ref_arr.shape, name
        if name.startswith("velocity"):
            agree = (got == ref_arr).mean()
            assert agree > 0.999, (name, agree)  # ties may argmax differently
        else:
            np.testing.assert_allclose(got, ref_arr, atol=3e-5, err_msg=name)


@requires_reference
def test_transcript_stride_parity(rng):
    cfg = _tiny_cfg()
    amt, ref_model = _reference_amt_with_model(cfg)
    params = convert_state_dict(ref_model.state_dict(), cfg.model.enc_layer,
                                cfg.model.dec_layer)
    feature = (rng.standard_normal((200, 256)) * 2 - 8).astype(np.float32)

    n_offset = 32
    ref_out = amt.transcript_stride(feature, n_offset)
    tr = Transcriber(cfg, params=params, batch_windows=3)
    ours = tr.transcript_stride(feature, n_offset)
    names = ["onset_A", "offset_A", "mpe_A", "velocity_A",
             "onset_B", "offset_B", "mpe_B", "velocity_B"]
    for name, ref_arr in zip(names, ref_out):
        got = ours[name]
        assert got.shape == ref_arr.shape, name
        if name.startswith("velocity"):
            assert (got == ref_arr).mean() > 0.999, name
        else:
            np.testing.assert_allclose(got, ref_arr, atol=3e-5, err_msg=name)


def test_transcript_data_parallel_matches_single(rng):
    """A data-mesh Transcriber (shard_map over the batch axis) must produce
    the same posteriors as the single-device path — including when the
    window count does not divide the (rounded-up) batch size."""
    import jax

    from nylon_amt_tpu.models.hft import init_params
    from nylon_amt_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.key(0))
    feature = (rng.standard_normal((300, 256)) * 2 - 8).astype(np.float32)

    single = Transcriber(cfg, params=params, batch_windows=2)
    mesh = make_mesh(n_data=4, n_model=1)
    dp = Transcriber(cfg, params=params, batch_windows=3, mesh=mesh)
    assert dp.batch_windows == 4  # rounded up to a multiple of n_data

    for name in ("transcript", "transcript_stride"):
        kwargs = {"n_offset": 32} if name == "transcript_stride" else {}
        ref = getattr(single, name)(feature, **kwargs)
        got = getattr(dp, name)(feature, **kwargs)
        assert set(got) == set(ref)
        for key, arr in ref.items():
            np.testing.assert_allclose(got[key], arr, atol=1e-5,
                                       err_msg=f"{name}/{key}")

    # TP meshes are rejected (data-parallel only)
    with pytest.raises(ValueError):
        Transcriber(cfg, params=params, mesh=make_mesh(n_data=2, n_model=2))


def test_transcript_shapes_no_reference(rng):
    import jax

    from nylon_amt_tpu.models.hft import init_params

    cfg = _tiny_cfg()
    tr = Transcriber(cfg, params=init_params(cfg, jax.random.key(0)),
                     batch_windows=4)
    feature = rng.standard_normal((300, 256)).astype(np.float32)
    out = tr.transcript(feature)
    assert out["onset_A"].shape == (384, 88)  # ceil(300/128)*128
    assert out["velocity_B"].dtype == np.int8
    out_s = tr.transcript_stride(feature, 32)
    assert out_s["onset_B"].shape == (320, 88)  # ceil(300/64)*64
    # 'single' mode returns only the A heads
    out_single = tr.transcript(feature, mode="single")
    assert set(out_single) == {"onset_A", "offset_A", "mpe_A", "velocity_A"}
