"""note2label rasterizer semantics tests (vs reference conv_note2label.py)."""

import numpy as np
import pytest

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.labels.note2label import note2label


@pytest.fixture
def config():
    return Config()


def test_onset_ramp_shape(config):
    # Onset exactly on a frame boundary: frame 625 (10.0 s at 62.5 fps).
    notes = [{"pitch": 60, "onset": 10.0, "offset": 10.5, "velocity": 77}]
    lab = note2label(config, notes)
    p = 60 - 21
    onset = lab["onset"][:, p]
    f = int(10.0 * 62.5 + 0.5)
    assert onset[f] == 1.0
    # Triangular decay over 3 frames (tolerance = int(50/16 + 0.5) = 3).
    np.testing.assert_allclose(onset[f - 3 : f + 4],
                               [0, 1 / 3, 2 / 3, 1, 2 / 3, 1 / 3, 0],
                               atol=1e-6)
    # velocity stamped where ramp >= 0.5
    vel = lab["velocity"][:, p]
    assert vel[f] == 77 and vel[f - 1] == 77 and vel[f + 1] == 77
    assert vel[f - 2] == 0 and vel[f + 2] == 0


def test_mpe_roll_inclusive(config):
    notes = [{"pitch": 21, "onset": 0.0, "offset": 0.096, "velocity": 1}]
    lab = note2label(config, notes)
    mpe = lab["mpe"][:, 0]
    off_f = int(0.096 * 62.5 + 0.5)  # = 6
    assert mpe[: off_f + 1].all() and not mpe[off_f + 1 :].any()


def test_offset_suppressed_by_same_pitch_onset(config):
    notes = [
        {"pitch": 60, "onset": 0.0, "offset": 1.0, "velocity": 50},
        {"pitch": 60, "onset": 1.0, "offset": 2.0, "velocity": 60},
    ]
    lab = note2label(config, notes)
    p = 39
    off_f = int(1.0 * 62.5 + 0.5)
    # First note's offset ramp suppressed (same-pitch note starts there).
    assert lab["offset"][off_f, p] == 0.0
    # Second note's offset ramp present.
    assert lab["offset"][125, p] == 1.0


def test_velocity_overwrite_order(config):
    """Later note's right-side ramp overwrites velocity where accumulated
    onset >= 0.5, matching the reference's order-dependent rule."""
    notes = [
        {"pitch": 60, "onset": 0.512, "offset": 0.7, "velocity": 50},   # frame 32
        {"pitch": 60, "onset": 0.544, "offset": 0.9, "velocity": 90},   # frame 34
    ]
    lab = note2label(config, notes)
    p = 39
    vel = lab["velocity"][:, p]
    # Frame 33: first note writes 50 (ramp 2/3 >= .5); second note's LEFT side
    # (j=-1) only fills zeros -> stays 50.
    assert vel[33] == 50
    # Frame 34: second note's center overwrites.
    assert vel[34] == 90


def test_offset_duration_tolerance(config):
    notes = [{"pitch": 60, "onset": 0.0, "offset": 8.0, "velocity": 10}]
    lab_wide = note2label(config, notes, offset_duration_tolerance_flag=True)
    lab_narrow = note2label(config, notes)
    p = 39
    # 20% of 8 s = 1.6 s = 100 frames of tolerance: ramp extends far wider.
    assert (lab_wide["offset"][:, p] > 0).sum() > (lab_narrow["offset"][:, p] > 0).sum()


def test_out_of_range_pitch_skipped(config):
    with pytest.warns(UserWarning):
        lab = note2label(config, [{"pitch": 5, "onset": 0.0, "offset": 0.1,
                                   "velocity": 10}])
    assert lab["onset"].sum() == 0


def test_nframe_override(config):
    notes = [{"pitch": 60, "onset": 0.0, "offset": 0.1, "velocity": 10}]
    lab = note2label(config, notes, nframe=500)
    assert lab["onset"].shape == (500, 88)
