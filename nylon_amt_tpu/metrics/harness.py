"""Corpus-level evaluation drivers.

Equivalents of the reference's offline scorers: per-file note-level metrics
with corpus averages (``evaluation/m_transcription.py:89-143``) and
frame-level multipitch metrics at a configurable grid
(``evaluation/m_mpe.py:77-180``), operating on note-event lists instead of
txt intermediates.
"""

from __future__ import annotations

import numpy as np

from nylon_amt_tpu.metrics.multipitch import evaluate_rolls, roll_from_notes
from nylon_amt_tpu.metrics.transcription import evaluate_notes, notes_to_arrays


def score_notes(ref_notes: list[dict], est_notes: list[dict],
                with_velocity: bool = True) -> dict[str, float]:
    """Note-level metric dict for one piece."""
    riv, rp, rv = notes_to_arrays(ref_notes)
    eiv, ep, ev = notes_to_arrays(est_notes)
    return evaluate_notes(riv, rp, eiv, ep,
                          rv if with_velocity else None,
                          ev if with_velocity else None)


def score_frames(ref_notes: list[dict], est_notes: list[dict],
                 fps: float = 62.5, note_min: int = 21,
                 num_note: int = 88) -> dict[str, float]:
    """Frame-level multipitch metric dict for one piece."""
    t_end = max([n["offset"] for n in ref_notes + est_notes] or [0.0])
    n_frames = int(round(t_end * fps)) + 1
    ref_roll = roll_from_notes(ref_notes, n_frames, fps, note_min, num_note)
    est_roll = roll_from_notes(est_notes, n_frames, fps, note_min, num_note)
    return evaluate_rolls(ref_roll, est_roll)


def aggregate(per_file: dict[str, dict[str, float]]) -> dict[str, float]:
    """Average metric dicts over files (reference corpus mean —
    ``m_transcription.py:125-143``)."""
    if not per_file:
        return {}
    keys = next(iter(per_file.values())).keys()
    return {k: float(np.mean([m[k] for m in per_file.values()])) for k in keys}
