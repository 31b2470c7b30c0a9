"""Fused Pallas log-mel spectrogram kernel.

One kernel performs framing, Hann windowing, the one-sided DFT, the power
spectrum, the mel projection, and the log — the ``[T, n_fft]`` frame tensor
(8x the audio bytes) and the ``[T, 1025]`` power spectrum never exist in HBM;
only the raw samples stream in and ``[T, n_mels]`` log-mel streams out.

Design (v5e):

* the padded waveform is laid out ``[rows, 128]``; a 128-frame block needs
  272 rows, streamed as a non-overlapping 256-row main block plus a 16-row
  tail re-fetched from the next block (BlockSpecs cannot overlap);
* rows are deinterleaved by parity once per block, so each of a frame's 16
  rows is a free leading-dim slice and the DFT becomes 16 clean
  ``[128, 128] @ [128, FREQ_BLOCK]`` MXU passes per frequency block (f32
  HIGHEST precision — Mosaic's default f32 matmul runs bf16 passes, which
  measured 0.5 log-mel error);
* the windowed DFT bases are reshaped ``[16, 128, n_freq_pad]`` and streamed
  in 128-frequency blocks (f32 — spectral parity requires full precision, so
  the full 2 x 8.4 MB bases can't be resident); a two-axis grid
  ``(frame_blocks, freq_blocks)`` accumulates ``power @ mel_fb`` into the
  output block, applying the log on the last frequency step;
* frequencies are zero-padded 1025 -> 1152 (9 x 128): zero DFT rows
  contribute nothing to the mel accumulation.

Matches :class:`nylon_amt_tpu.ops.mel.MelFrontend`'s XLA path to f32
accumulation order (8e-6 max log-mel diff measured on hardware); that path
remains the CPU/parity reference. Measured on one v5e chip: 60 s of audio in
223 ms (~270x real time), ~10x the XLA gather+matmul path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
FRAME_BLOCK = 128
FREQ_BLOCK = 128


def _kernel(main_ref, tail_ref, wc_ref, ws_ref, fb_ref, out_ref, even_ref,
            odd_ref, accum_ref, *, hop_rows, rows_per_frame, log_offset,
            n_freq_blocks):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _load_and_frame():
        # Deinterleave rows by parity once per frame block: frame f starts at
        # row 2f, so its 16 rows split into 8 consecutive rows of `even` and
        # 8 of `odd`, making every later access a free leading-dim slice.
        rows = jnp.concatenate([main_ref[...], tail_ref[...]], axis=0)
        half = rows.shape[0] // 2
        wav3 = rows.reshape(half, hop_rows, LANE)
        even_ref[...] = wav3[:, 0, :]
        odd_ref[...] = wav3[:, 1, :]
        accum_ref[...] = jnp.zeros_like(accum_ref)

    # One [128, 128] @ [128, FREQ_BLOCK] MXU pass per frame row r:
    # re[f, q] = sum_r sum_l wav[2f + r, l] * wc[r, l, q].
    re = jnp.zeros((FRAME_BLOCK, FREQ_BLOCK), jnp.float32)
    im = jnp.zeros((FRAME_BLOCK, FREQ_BLOCK), jnp.float32)
    for r in range(rows_per_frame):
        src = even_ref if r % 2 == 0 else odd_ref
        a_r = src[pl.ds(r // 2, FRAME_BLOCK), :]
        # full f32 matmuls: Mosaic's default f32 path is bf16 passes, far
        # too coarse for spectral magnitudes (0.5 log-mel error measured)
        hi = jax.lax.Precision.HIGHEST
        re += jnp.dot(a_r, wc_ref[r], preferred_element_type=jnp.float32,
                      precision=hi)
        im += jnp.dot(a_r, ws_ref[r], preferred_element_type=jnp.float32,
                      precision=hi)
    power = re * re + im * im                      # [FRAME_BLOCK, FREQ_BLOCK]
    accum_ref[...] += jnp.dot(power, fb_ref[...],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

    @pl.when(k == n_freq_blocks - 1)
    def _finish():
        out_ref[...] = jnp.log(accum_ref[...] + log_offset)


@functools.lru_cache(maxsize=4)
def _build_call(n_fft: int, hop: int, n_mels: int, log_offset: float,
                sr: int, window_length: int, nf: int, interpret: bool):
    from nylon_amt_tpu.ops.mel import _dft_bases, hann_window, mel_filterbank

    rows_per_frame = n_fft // LANE                     # 16
    hop_rows = hop // LANE                             # 2
    n_freq = n_fft // 2 + 1                            # 1025
    n_freq_pad = math.ceil(n_freq / FREQ_BLOCK) * FREQ_BLOCK  # 1152
    n_freq_blocks = n_freq_pad // FREQ_BLOCK

    window = hann_window(window_length)
    if window_length < n_fft:
        lpad = (n_fft - window_length) // 2
        window = np.pad(window, (lpad, n_fft - window_length - lpad))
    cos_b, sin_b = _dft_bases(n_fft)
    wc = (cos_b * window[None]).astype(np.float32)
    ws = (sin_b * window[None]).astype(np.float32)
    wc = np.pad(wc, ((0, n_freq_pad - n_freq), (0, 0)))
    ws = np.pad(ws, ((0, n_freq_pad - n_freq), (0, 0)))
    # [freq, n_fft] -> [16, 128, freq] so frames contract without transposes
    wc3 = jnp.asarray(wc.T.reshape(rows_per_frame, LANE, n_freq_pad))
    ws3 = jnp.asarray(ws.T.reshape(rows_per_frame, LANE, n_freq_pad))
    fb = mel_filterbank(sr, n_fft, n_mels)
    fb_pad = jnp.asarray(np.pad(fb, ((0, n_freq_pad - n_freq), (0, 0))))

    main_rows = FRAME_BLOCK * hop_rows                               # 256
    tail_rows = rows_per_frame                                       # 16

    kernel = functools.partial(
        _kernel, hop_rows=hop_rows, rows_per_frame=rows_per_frame,
        log_offset=log_offset, n_freq_blocks=n_freq_blocks)

    half = (main_rows + tail_rows) // 2

    call = pl.pallas_call(
        kernel,
        grid=(nf // FRAME_BLOCK, n_freq_blocks),
        in_specs=[
            # overlapping reads split into a non-overlapping main block plus
            # a 16-row tail re-fetched from the next block's start
            pl.BlockSpec((main_rows, LANE), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tail_rows, LANE),
                         lambda i, k: ((i + 1) * (main_rows // tail_rows), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_frame, LANE, FREQ_BLOCK),
                         lambda i, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_frame, LANE, FREQ_BLOCK),
                         lambda i, k: (0, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_BLOCK, n_mels), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((half, LANE), jnp.float32),   # even rows
            pltpu.VMEM((half, LANE), jnp.float32),   # odd rows
            pltpu.VMEM((FRAME_BLOCK, n_mels), jnp.float32),
        ],
        interpret=interpret,
    )

    def run(wav2d):
        return call(wav2d, wav2d, wc3, ws3, fb_pad)

    return jax.jit(run)


def log_mel_pallas(wav: jnp.ndarray, frontend) -> jnp.ndarray:
    """wav [n_samples] -> log-mel [n_frames, n_mels] via the fused kernel."""
    cfg = frontend.cfg
    n_fft, hop = cfg.fft_bins, cfg.hop_sample
    if n_fft % LANE or hop % LANE:
        return frontend._jit_frames(frontend.frame(wav))  # geometry fallback
    if cfg.pad_mode != "constant":
        return frontend._jit_frames(frontend.frame(wav))

    n = int(wav.shape[0])
    n_frames = 1 + n // hop
    nf = math.ceil(n_frames / FRAME_BLOCK) * FRAME_BLOCK
    # last tail block reads rows [2*nf, 2*nf + 16): pad the row count there
    needed = (2 * nf + n_fft // LANE) * LANE
    pad_l = n_fft // 2
    pad_r = needed - pad_l - n
    wav_p = jnp.pad(wav.astype(jnp.float32), (pad_l, max(0, pad_r)))
    wav2d = wav_p[:needed].reshape(needed // LANE, LANE)

    interpret = jax.default_backend() != "tpu"
    run = _build_call(n_fft, hop, cfg.mel_bins, cfg.log_offset, cfg.sr,
                      cfg.window_length, nf, interpret)
    return run(wav2d)[:n_frames]
