"""DSP frontend parity tests.

The reference frontend is torchaudio's MelSpectrogram (``amt.py:34-63``).
torchaudio itself is not in the image, but its Spectrogram is a thin wrapper
over ``torch.stft`` (available), and its mel filterbank algorithm is
re-derived independently here in float64 — giving two independent
implementations to cross-check ours against.
"""

import numpy as np
import pytest
import torch

from nylon_amt_tpu.config import FeatureConfig
from nylon_amt_tpu.ops.mel import MelFrontend, hann_window, mel_filterbank
from nylon_amt_tpu.ops.resample import resample


def _reference_fbank_f64(sr, n_fft, n_mels):
    """Independent float64 reimplementation of torchaudio melscale_fbanks
    (mel_scale='htk', norm='slaney')."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m_pts = np.linspace(hz2mel(0.0), hz2mel(sr // 2), n_mels + 2)
    f_pts = mel2hz(m_pts)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (all_freqs - lo) / (ctr - lo)
        down = (hi - all_freqs) / (hi - ctr)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down)) * (2.0 / (hi - lo))
    return fb


def test_mel_filterbank_matches_independent_reference():
    fb = mel_filterbank(16000, 2048, 256)
    ref = _reference_fbank_f64(16000, 2048, 256)
    np.testing.assert_allclose(fb, ref, rtol=0, atol=2e-5)


def test_hann_window_matches_torch():
    w = hann_window(2048)
    ref = torch.hann_window(2048).numpy()
    # torch evaluates the cosine in float32; allow one-ulp-scale differences.
    np.testing.assert_allclose(w, ref, atol=5e-7)


@pytest.mark.parametrize("n_samples", [16000, 16001, 40961])
def test_log_mel_matches_torch_stft_pipeline(rng, n_samples):
    """Full-chain parity vs a torch.stft-based MelSpectrogram equivalent."""
    cfg = FeatureConfig()
    wav = rng.standard_normal(n_samples).astype(np.float32) * 0.1

    fe = MelFrontend(cfg)
    ours = np.asarray(fe(wav))

    # torchaudio.transforms.MelSpectrogram == Spectrogram(power=2) @ MelScale.
    # Spectrogram == torch.stft(center=True, pad_mode=cfg, onesided,
    # normalized=False, hann window), |.|^2.
    t = torch.from_numpy(wav)
    spec = torch.stft(
        t,
        n_fft=cfg.fft_bins,
        hop_length=cfg.hop_sample,
        win_length=cfg.window_length,
        window=torch.hann_window(cfg.window_length),
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs().pow(2.0).numpy()                     # [n_freqs, T]
    fb = _reference_fbank_f64(cfg.sr, cfg.fft_bins, cfg.mel_bins)
    mel = fb.T @ power                                      # [n_mels, T]
    ref = np.log(mel + cfg.log_offset).T                    # [T, n_mels]

    assert ours.shape == ref.shape == (1 + n_samples // cfg.hop_sample, 256)
    # log-mel values span ~[-18.4, ~5]; compare absolutely.
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    # And tightly in linear space (relative).
    np.testing.assert_allclose(np.exp(ours), np.exp(ref), rtol=3e-4, atol=1e-7)


def test_log_mel_silence_gives_log_offset():
    cfg = FeatureConfig()
    fe = MelFrontend(cfg)
    out = np.asarray(fe(np.zeros(16000, dtype=np.float32)))
    np.testing.assert_allclose(out, np.log(cfg.log_offset), atol=1e-2)


def test_resample_preserves_tone_frequency():
    """48k -> 16k sinc resample keeps a 440 Hz tone at 440 Hz."""
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample(wav, sr_in, sr_out)
    assert out.shape[0] == sr_out
    # Dominant FFT bin should be 440 Hz; amplitude preserved within 1%.
    spec = np.abs(np.fft.rfft(out[2000:-2000] * np.hanning(out.shape[0] - 4000)))
    freq = np.fft.rfftfreq(out.shape[0] - 4000, 1 / sr_out)
    assert abs(freq[np.argmax(spec)] - 440.0) < 2.0
    mid = out[2000:-2000]
    assert abs(np.max(mid) - 1.0) < 0.01


def test_resample_identity():
    wav = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(wav, 16000, 16000), wav)
