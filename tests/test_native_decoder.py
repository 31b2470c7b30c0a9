"""Native (C++) decoder parity vs the Python implementation."""

import shutil

import numpy as np
import pytest

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.infer.decode import mpe2note
from nylon_amt_tpu.native import load_decoder_library

requires_native = pytest.mark.skipif(
    shutil.which("g++") is None or load_decoder_library() is None,
    reason="native toolchain unavailable")


@requires_native
@pytest.mark.parametrize("mode_offset", ["shorter", "longer", "offset"])
@pytest.mark.parametrize("mode_velocity", ["ignore_zero", "org"])
def test_native_matches_python(rng, mode_offset, mode_velocity):
    T = 400
    onset = np.where(rng.random((T, 88)) > 0.9, rng.random((T, 88)),
                     0.1).astype(np.float32)
    offset = np.where(rng.random((T, 88)) > 0.9, rng.random((T, 88)),
                      0.1).astype(np.float32)
    mpe = (rng.random((T, 88)) > 0.4).astype(np.float32)
    vel = rng.integers(0, 127, (T, 88)).astype(np.int8)
    cfg = Config()
    py = mpe2note(cfg, onset, offset, mpe, vel, mode_offset=mode_offset,
                  mode_velocity=mode_velocity, use_native=False)
    nat = mpe2note(cfg, onset, offset, mpe, vel, mode_offset=mode_offset,
                   mode_velocity=mode_velocity, use_native=True)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert (a["pitch"], a["velocity"]) == (b["pitch"], b["velocity"])
        assert a["onset"] == pytest.approx(b["onset"], abs=1e-6)
        assert a["offset"] == pytest.approx(b["offset"], abs=1e-6)


@requires_native
def test_native_capacity_regrowth(rng):
    """Force the retry path with a dense onset field."""
    T = 64
    onset = np.full((T, 88), 0.9, np.float32)
    onset[::2] = 0.2  # alternating peaks -> many notes
    zeros = np.zeros((T, 88), np.float32)
    vel = np.full((T, 88), 64, np.int8)
    cfg = Config()
    py = mpe2note(cfg, onset, zeros, zeros, vel, use_native=False)
    nat = mpe2note(cfg, onset, zeros, zeros, vel, use_native=True)
    assert len(py) == len(nat) > 1000
