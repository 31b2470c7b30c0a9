"""On-device log-mel spectrogram frontend.

Replaces the reference's torchaudio frontend (``hftt_code/model/amt.py:34-63``:
``MelSpectrogram(sr=16000, n_fft=2048, win_length=2048, hop_length=256,
pad_mode='constant', n_mels=256, norm='slaney')`` followed by
``log(mel + 1e-8)``) with a numerically equivalent JAX implementation.

Semantics reproduced exactly (torchaudio defaults at that call site):

* ``center=True``: the signal is padded ``n_fft // 2`` on both sides with the
  configured ``pad_mode`` ("constant" = zeros) before framing, giving
  ``1 + len(wav) // hop`` frames.
* periodic Hann window of ``win_length`` samples.
* ``power=2.0`` magnitude spectrogram over the one-sided rFFT.
* mel filterbank on the **HTK** mel scale (torchaudio's default
  ``mel_scale="htk"``) with **Slaney area normalization** (``norm='slaney'``),
  ``f_min=0``, ``f_max=sr/2``.

TPU-first design: instead of an FFT (which XLA lowers poorly for this shape
profile on TPU), the one-sided DFT is evaluated as two real matmuls against
precomputed cosine/sine bases — these run on the MXU and fuse with the mel
projection. ``[1025, 2048]`` bases are ~8 MB each in f32; the whole frontend is
a chain of three matmuls plus elementwise log, which XLA fuses into a handful
of kernels with no host round-trips. A fused single-pass Pallas kernel is
available in :mod:`nylon_amt_tpu.ops.spectrogram_pallas`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nylon_amt_tpu.config import FeatureConfig


def _hz_to_mel_htk(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank ``[n_fft // 2 + 1, n_mels]``.

    HTK mel scale + Slaney area normalization, matching
    ``torchaudio.functional.melscale_fbanks(..., mel_scale='htk',
    norm='slaney')`` as used (via defaults) at reference ``amt.py:59``.
    Note torchaudio's ``f_max`` default is ``sample_rate // 2``.
    """
    if f_max is None:
        f_max = float(sr // 2)
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr // 2, n_freqs)

    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]           # rising edge
    up_slopes = slopes[:, 2:] / f_diff[1:]                # falling edge
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm: {norm!r}")

    return fb.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = win_length if periodic else win_length - 1
    i = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real one-sided DFT bases: cos/sin matrices ``[n_fft//2+1, n_fft]``."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_freqs, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class MelFrontend:
    """Jitted WAV -> log-mel feature extractor.

    ``__call__(wav[n_samples]) -> features [n_frames, n_mels]`` matching the
    reference's ``AMT.wav2feature`` output layout (``amt.py:61-63``).
    """

    def __init__(self, cfg: FeatureConfig, use_pallas: bool | None = None):
        cfg.validate()
        self.cfg = cfg
        # None = auto: the fused Pallas kernel on TPU (~10x the XLA path),
        # the XLA gather+matmul path elsewhere.
        self.use_pallas = use_pallas
        n_fft = cfg.fft_bins

        window = hann_window(cfg.window_length)
        if cfg.window_length < n_fft:  # torchaudio centers the window in n_fft
            lpad = (n_fft - cfg.window_length) // 2
            window = np.pad(window, (lpad, n_fft - cfg.window_length - lpad))
        cos_b, sin_b = _dft_bases(n_fft)
        fb = mel_filterbank(cfg.sr, n_fft, cfg.mel_bins)
        # Fold the window into the DFT bases: (C * w) @ frames == C @ (frames * w).
        self._cos_w = jnp.asarray(cos_b * window[None, :])   # [n_freqs, n_fft]
        self._sin_w = jnp.asarray(sin_b * window[None, :])
        self._fb = jnp.asarray(fb)                           # [n_freqs, n_mels]
        self._jit_frames = jax.jit(self._compute_from_frames)
        self._jit_segments = jax.jit(self._compute_from_sample_blocks)

    def device_state(self) -> tuple:
        """Device-resident constants, for carrying across a tunnel journal
        reset (``utils/tunnel.py``). Compiled executables embed these as
        constants, so already-traced shapes keep working either way; a
        RE-trace (new bucket shape) reads the attributes, which must
        therefore point at live buffers."""
        return (self._cos_w, self._sin_w, self._fb)

    def restore_device_state(self, state: tuple) -> None:
        self._cos_w, self._sin_w, self._fb = state

    # -- framing ---------------------------------------------------------

    def num_frames(self, n_samples: int) -> int:
        return 1 + n_samples // self.cfg.hop_sample

    def frame(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Center-pad and slice into overlapping frames ``[n_frames, n_fft]``."""
        cfg = self.cfg
        n_fft = cfg.fft_bins
        pad = n_fft // 2
        mode = "constant" if cfg.pad_mode == "constant" else "reflect"
        padded = jnp.pad(wav, (pad, pad), mode=mode)
        n_frames = self.num_frames(wav.shape[0])
        starts = np.arange(n_frames) * cfg.hop_sample
        idx = starts[:, None] + np.arange(n_fft)[None, :]
        return padded[idx]

    # -- spectrogram ------------------------------------------------------

    def _compute_from_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames [n_frames, n_fft] -> log-mel [n_frames, n_mels].

        Two MXU matmuls give Re/Im of the one-sided DFT of the windowed
        frame; power + mel projection + log complete the chain.
        """
        ft = frames.astype(jnp.float32)
        # DFT-as-matmul needs true f32 accumulation: on TPU, default-precision
        # f32 matmuls run as single-pass bf16 on the MXU, which is not enough
        # for spectral magnitudes. HIGHEST requests full f32-equivalent passes.
        hi = jax.lax.Precision.HIGHEST
        re = jnp.dot(ft, self._cos_w.T, precision=hi)  # [n_frames, n_freqs]
        im = jnp.dot(ft, self._sin_w.T, precision=hi)
        power = re * re + im * im
        mel = jnp.dot(power, self._fb, precision=hi)   # [n_frames, n_mels]
        return jnp.log(mel + self.cfg.log_offset)

    def features_from_frames(self, frames) -> jnp.ndarray:
        """Explicit-framing entry: ``[n, n_fft]`` sample frames -> ``[n,
        n_mels]`` log-mel rows. Each output row depends only on its input
        frame; the streaming transcriber uses this to produce features
        incrementally with the exact offline numerics."""
        return self._jit_frames(jnp.asarray(frames, jnp.float32))

    def _compute_from_sample_blocks(self, segs: jnp.ndarray) -> jnp.ndarray:
        """segs [S, seg_len] raw samples -> [S, n_frames, n_mels]; framing
        happens ON DEVICE (gather), so the host uploads samples instead of
        hop/n_fft-times-inflated explicit frames."""
        S, L = segs.shape
        hop, n_fft = self.cfg.hop_sample, self.cfg.fft_bins
        n = (L - n_fft) // hop + 1
        idx = (np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :])
        frames = segs[:, idx]                          # [S, n, n_fft]
        return self._compute_from_frames(
            frames.reshape(S * n, n_fft)).reshape(S, n, -1)

    def features_from_sample_blocks(self, segs) -> jnp.ndarray:
        """Batched streaming entry: ``[S, seg_len]`` sample segments (frame
        ``i`` of a segment covers samples ``[i*hop, i*hop + n_fft)``) ->
        ``[S, n_frames, n_mels]``. The caller pre-pads stream edges; the
        upload is raw samples (~hop/n_fft of the explicit-frames size, a
        factor 8 at the reference geometry)."""
        return self._jit_segments(jnp.asarray(segs, jnp.float32))

    def __call__(self, wav) -> jnp.ndarray:
        wav = jnp.asarray(wav, dtype=jnp.float32)
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from nylon_amt_tpu.ops.spectrogram_pallas import log_mel_pallas

            return log_mel_pallas(wav, self)
        return self._jit_frames(self.frame(wav))


@functools.lru_cache(maxsize=4)
def _cached_frontend(key: tuple) -> MelFrontend:
    return MelFrontend(FeatureConfig(*key))


def get_frontend(cfg: FeatureConfig) -> MelFrontend:
    """Cached frontend for a feature config (constants are reused)."""
    key = (cfg.sr, cfg.hop_sample, cfg.mel_bins, cfg.n_bins, cfg.fft_bins,
           cfg.window_length, cfg.log_offset, cfg.window, cfg.pad_mode)
    return _cached_frontend(key)
