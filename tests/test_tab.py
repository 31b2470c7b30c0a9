"""Guitar tablature export tests."""

import pytest

from nylon_amt_tpu.infer.tab import (
    STANDARD_TUNING,
    assign_strings,
    to_alphatex,
)


def _n(pitch, onset, offset, velocity=80):
    return {"pitch": pitch, "onset": onset, "offset": offset,
            "velocity": velocity}


def test_open_strings_map_to_fret_zero():
    notes = [_n(p, i * 1.0, i * 1.0 + 0.5)
             for i, p in enumerate(STANDARD_TUNING)]
    tab = assign_strings(notes)
    assert all(t.fret == 0 for t in tab.notes)
    assert sorted(t.string for t in tab.notes) == [1, 2, 3, 4, 5, 6]


def test_chord_uses_distinct_strings():
    # E major-ish chord: E2, B2, E3, G#3
    notes = [_n(p, 0.0, 1.0) for p in (40, 47, 52, 56)]
    tab = assign_strings(notes)
    strings = [t.string for t in tab.notes]
    assert len(strings) == len(set(strings)) == 4


def test_out_of_range_clamped():
    tab = assign_strings([_n(21, 0.0, 0.5)])  # A0, below guitar range
    assert tab.n_clamped == 1
    assert tab.notes[0].fret >= 0


def test_alphatex_output_structure():
    notes = [_n(64, 0.0, 0.5), _n(67, 0.5, 1.0), _n(40, 0.5, 1.0)]
    tex = to_alphatex(notes, title="test piece", tempo=120)
    assert tex.startswith('\\title "test piece"')
    assert "\\tempo 120" in tex
    assert "0.1" in tex          # open high E = fret 0 string 1
    assert "(" in tex            # the two simultaneous notes form a chord
    assert tex.rstrip().endswith("|")


def test_alphatex_empty():
    tex = to_alphatex([])
    assert "r.1 |" in tex
