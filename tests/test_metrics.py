"""Transcription / multipitch metric tests."""

import numpy as np
import pytest

from nylon_amt_tpu.metrics import (
    evaluate_frames,
    evaluate_notes,
    evaluate_rolls,
    match_notes,
    note_to_hz,
)
from nylon_amt_tpu.metrics.multipitch import roll_from_notes
from nylon_amt_tpu.metrics.transcription import notes_to_arrays


def _notes(*tuples):
    return [{"onset": a, "offset": b, "pitch": p, "velocity": v}
            for a, b, p, v in tuples]


def test_perfect_match():
    notes = _notes((0.0, 1.0, 60, 80), (0.5, 1.5, 64, 90))
    iv, pz, vel = notes_to_arrays(notes)
    out = evaluate_notes(iv, pz, iv, pz, vel, vel)
    assert out["Precision"] == out["Recall"] == out["F-measure"] == 1.0
    assert out["F-measure_velocity"] == 1.0
    assert out["Average_Overlap_Ratio"] == pytest.approx(1.0)


def test_onset_tolerance_boundary():
    ref = _notes((1.0, 2.0, 60, 80))
    est_ok = _notes((1.049, 2.0, 60, 80))
    est_bad = _notes((1.051, 2.0, 60, 80))
    riv, rp, _ = notes_to_arrays(ref)
    assert len(match_notes(riv, rp, *notes_to_arrays(est_ok)[:2])) == 1
    assert len(match_notes(riv, rp, *notes_to_arrays(est_bad)[:2],
                           offset_ratio=None)) == 0


def test_offset_condition():
    ref = _notes((0.0, 1.0, 60, 80))
    est = _notes((0.0, 1.3, 60, 80))  # offset off by 0.3 > max(.05, .2*1.0)
    riv, rp, _ = notes_to_arrays(ref)
    eiv, ep, _ = notes_to_arrays(est)
    out = evaluate_notes(riv, rp, eiv, ep)
    assert out["F-measure"] == 0.0
    assert out["F-measure_no_offset"] == 1.0


def test_pitch_tolerance_50_cents():
    ref = _notes((0.0, 1.0, 60, 80))
    riv, rp, _ = notes_to_arrays(ref)
    est_wrong = _notes((0.0, 1.0, 61, 80))  # 100 cents away
    eiv, ep, _ = notes_to_arrays(est_wrong)
    assert len(match_notes(riv, rp, eiv, ep)) == 0


def test_bipartite_matching_is_maximum():
    """Two refs, two ests where greedy could match only one pair."""
    ref = _notes((0.0, 1.0, 60, 80), (0.04, 1.0, 60, 80))
    est = _notes((0.02, 1.0, 60, 80), (0.08, 1.0, 60, 80))
    riv, rp, _ = notes_to_arrays(ref)
    eiv, ep, _ = notes_to_arrays(est)
    # est0 matches both refs; est1 only matches ref1 (|0.08-0.04|<=0.05).
    # maximum matching pairs est0-ref0, est1-ref1.
    m = match_notes(riv, rp, eiv, ep, offset_ratio=None)
    assert len(m) == 2


def test_velocity_filter_scale_invariant():
    """Velocity metric is invariant to affine rescaling of estimates."""
    notes = _notes((0.0, 1.0, 60, 40), (1.0, 2.0, 64, 80), (2.0, 3.0, 67, 120))
    iv, pz, vel = notes_to_arrays(notes)
    out = evaluate_notes(iv, pz, iv, pz, vel, vel * 0.5 + 3)
    assert out["F-measure_velocity"] == 1.0


def test_velocity_mismatch_detected():
    notes = _notes((0.0, 1.0, 60, 40), (1.0, 2.0, 64, 80), (2.0, 3.0, 67, 120))
    iv, pz, vel = notes_to_arrays(notes)
    # Constant estimates carry no velocity information; no affine rescaling
    # can recover the reference spread, so only the middle note survives.
    bad_vel = np.array([80.0, 80.0, 80.0])
    out = evaluate_notes(iv, pz, iv, pz, vel, bad_vel)
    assert out["F-measure_velocity"] == pytest.approx(1 / 3)
    assert out["F-measure"] == 1.0


def test_velocity_rematch_beats_post_filter():
    """mir_eval folds the velocity criterion into the matching (re-match),
    not into a post-hoc filter of the timing matching. Construct a case
    where they disagree: all notes share pitch and near-identical timing (so
    the timing candidate graph is complete), and the rescaled velocities
    only line up for a non-identity pairing.

    Timing edges: (r1,e1), (r2,e2), (r3,e3), (r2,e3) — the unique PERFECT
    matching is the identity (r3 reaches only e3), so the rescaling fit is
    deterministic. ref velocities [10, 20, 30], est [10, 30, 20]: the
    identity match fits slope 0.5 / intercept 10, rescaled est =
    [15, 25, 20], normalized diffs vs ref = [.167, .167, .333] — a
    post-filter keeps 0 matches. The re-match recovers (r2, e3):
    |20/30 - 20/30| = 0.
    """
    from nylon_amt_tpu.metrics.transcription import match_notes_velocity

    ref_iv = np.array([[0.0, 1.5], [1.0, 2.5], [1.08, 2.6]])
    est_iv = np.array([[0.0, 1.5], [0.96, 2.5], [1.04, 2.6]])
    pz = note_to_hz(np.array([60, 60, 60]))
    ref_vel = np.array([10.0, 20.0, 30.0])
    est_vel = np.array([10.0, 30.0, 20.0])

    m = match_notes_velocity(ref_iv, pz, ref_vel, est_iv, pz, est_vel)
    assert m == [(1, 2)]

    out = evaluate_notes(ref_iv, pz, est_iv, pz, ref_vel, est_vel)
    assert out["F-measure"] == 1.0
    assert out["F-measure_velocity"] == pytest.approx(1 / 3)


def test_empty_estimates():
    ref = _notes((0.0, 1.0, 60, 80))
    riv, rp, _ = notes_to_arrays(ref)
    out = evaluate_notes(riv, rp, np.zeros((0, 2)), np.zeros((0,)))
    assert out["Precision"] == 0.0 and out["Recall"] == 0.0


def test_note_to_hz():
    assert note_to_hz(69) == pytest.approx(440.0)
    assert note_to_hz(60) == pytest.approx(261.6256, abs=1e-3)


def test_frames_and_rolls_agree(rng):
    ref_roll = rng.random((50, 88)) > 0.8
    est_roll = rng.random((50, 88)) > 0.8
    freqs = note_to_hz(np.arange(21, 109))
    ref_f = [freqs[ref_roll[t]] for t in range(50)]
    est_f = [freqs[est_roll[t]] for t in range(50)]
    a = evaluate_frames(ref_f, est_f)
    b = evaluate_rolls(ref_roll, est_roll)
    for k in a:
        assert a[k] == pytest.approx(b[k]), k


def test_roll_from_notes():
    roll = roll_from_notes(_notes((0.0, 0.5, 60, 80)), 100, 62.5, 21, 88)
    assert roll[:32, 39].all()
    assert not roll[33:, 39].any()


def test_score_mpe_posteriors():
    from nylon_amt_tpu.metrics.harness import score_mpe_posteriors

    notes = _notes((0.0, 1.0, 60, 80))
    fps = 62.5
    T = 80
    post = np.zeros((T, 88), np.float32)
    post[: int(1.0 * fps) + 1, 60 - 21] = 0.9   # perfect estimate
    out = score_mpe_posteriors(notes, post, fps=fps)
    assert out["Recall"] > 0.95 and out["Precision"] > 0.95

    # empty estimate: zero recall
    out0 = score_mpe_posteriors(notes, np.zeros((T, 88), np.float32), fps=fps)
    assert out0["Recall"] == 0.0
