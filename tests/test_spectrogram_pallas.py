"""Fused Pallas spectrogram kernel vs the XLA MelFrontend path."""

import numpy as np
import pytest

from nylon_amt_tpu.config import FeatureConfig
from nylon_amt_tpu.ops.mel import MelFrontend
from nylon_amt_tpu.ops.spectrogram_pallas import log_mel_pallas


@pytest.mark.parametrize("n_samples", [16000, 40961])
def test_pallas_matches_xla_path(rng, n_samples):
    cfg = FeatureConfig()
    fe = MelFrontend(cfg)
    wav = (rng.standard_normal(n_samples) * 0.2).astype(np.float32)
    ref = np.asarray(fe(wav))
    got = np.asarray(log_mel_pallas(wav, fe))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)
    np.testing.assert_allclose(np.exp(got), np.exp(ref), rtol=1e-4, atol=1e-8)


def test_pallas_path_via_frontend_flag(rng):
    cfg = FeatureConfig()
    fe_p = MelFrontend(cfg, use_pallas=True)
    fe_x = MelFrontend(cfg)
    wav = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fe_p(wav)), np.asarray(fe_x(wav)),
                               atol=2e-4)
