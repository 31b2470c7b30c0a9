"""mpe2note decoder parity vs the reference implementation.

The reference's ``model/amt.py`` imports torchaudio/pretty_midi (absent in
this image), but ``mpe2note`` needs neither — stub the modules and drive the
reference decoder directly against ours on randomized sparse posteriors.
"""

import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_PATH, requires_reference

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.infer.decode import mpe2note

CONFIG_DICT = {
    "feature": {"hop_sample": 256, "sr": 16000},
    "midi": {"num_note": 88, "note_min": 21},
}


def _load_reference_amt():
    for mod in ("torchaudio", "pretty_midi"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.path.insert(0, os.path.join(REFERENCE_PATH, "hftt_code", "model"))
    try:
        import amt as ref_amt
    finally:
        sys.path.pop(0)
    return ref_amt.AMT(CONFIG_DICT, None)


def _random_posteriors(rng, T=256, sparsity=0.97):
    """Sparse peaky posteriors with plateaus to exercise tie handling."""
    onset = rng.random((T, 88)).astype(np.float32)
    onset = np.where(onset > sparsity, onset, onset * 0.3)
    # inject plateaus
    onset[40:43, 5] = 0.8
    onset[100:105, 17] = 0.6
    offset = rng.random((T, 88)).astype(np.float32)
    offset = np.where(offset > sparsity, offset, offset * 0.3)
    mpe = (rng.random((T, 88)) > 0.4).astype(np.float32)
    velocity = rng.integers(0, 127, (T, 88)).astype(np.int8)
    return onset, offset, mpe, velocity


@requires_reference
@pytest.mark.parametrize("mode_offset", ["shorter", "longer", "offset"])
@pytest.mark.parametrize("mode_velocity", ["ignore_zero", "org"])
def test_mpe2note_parity(rng, mode_offset, mode_velocity):
    amt = _load_reference_amt()
    onset, offset, mpe, velocity = _random_posteriors(rng)
    ref = amt.mpe2note(onset, offset, mpe, velocity,
                       mode_velocity=mode_velocity, mode_offset=mode_offset)
    ours = mpe2note(Config(), onset, offset, mpe, velocity,
                    mode_velocity=mode_velocity, mode_offset=mode_offset)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a["pitch"] == b["pitch"]
        assert a["velocity"] == b["velocity"]
        assert a["onset"] == pytest.approx(b["onset"], abs=1e-6)
        assert a["offset"] == pytest.approx(b["offset"], abs=1e-6)


@requires_reference
def test_mpe2note_parity_dense(rng):
    """Denser posteriors (more overlapping notes, truncation rule active)."""
    amt = _load_reference_amt()
    onset, offset, mpe, velocity = _random_posteriors(rng, T=128, sparsity=0.85)
    ref = amt.mpe2note(onset, offset, mpe, velocity)
    ours = mpe2note(Config(), onset, offset, mpe, velocity)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert (a["pitch"], a["velocity"]) == (b["pitch"], b["velocity"])
        # timestamps agree to float32 precision (sub-10us; frame grid is 16ms)
        assert a["onset"] == pytest.approx(b["onset"], abs=1e-4)
        assert a["offset"] == pytest.approx(b["offset"], abs=1e-4)


def test_simple_note_decoding():
    """A clean synthetic note decodes to the expected event."""
    cfg = Config()
    T = 100
    onset = np.zeros((T, 88), np.float32)
    offset = np.zeros((T, 88), np.float32)
    mpe = np.zeros((T, 88), np.float32)
    velocity = np.zeros((T, 88), np.int8)
    p = 39  # MIDI 60
    onset[20, p] = 0.9
    mpe[20:51, p] = 1.0
    offset[50, p] = 0.9
    velocity[20, p] = 64
    notes = mpe2note(cfg, onset, offset, mpe, velocity)
    assert len(notes) == 1
    n = notes[0]
    hop = 256 / 16000
    assert n["pitch"] == 60 and n["velocity"] == 64
    assert n["onset"] == pytest.approx(20 * hop)
    assert n["offset"] == pytest.approx(50 * hop)


def test_velocity_zero_dropped_by_default():
    cfg = Config()
    onset = np.zeros((10, 88), np.float32)
    onset[5, 0] = 1.0
    zeros = np.zeros((10, 88), np.float32)
    assert mpe2note(cfg, onset, zeros, zeros, zeros.astype(np.int8)) == []
    kept = mpe2note(cfg, onset, zeros, zeros, zeros.astype(np.int8),
                    mode_velocity="org")
    assert len(kept) == 1 and kept[0]["velocity"] == 0
