"""note2ref emitters and the in-training metrics pass."""

import numpy as np
import pytest

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.labels.note2ref import (
    mpe_roll,
    note_to_freq,
    read_mpe_ref,
    write_note_refs,
)
from nylon_amt_tpu.train.metrics import intervals_from_rolls


NOTES = [
    {"pitch": 60, "onset": 0.0, "offset": 0.5, "velocity": 64},
    {"pitch": 64, "onset": 0.25, "offset": 1.0, "velocity": 80},
    {"pitch": 60, "onset": 0.5, "offset": 0.5, "velocity": 10},  # zero-dur
]


def test_interval_refs(tmp_path):
    stem = str(tmp_path / "piece")
    write_note_refs(NOTES, stem)
    lines = open(stem + ".txt").read().strip().split("\n")
    assert len(lines) == 2  # zero-duration note dropped
    onset, offset, hz = lines[0].split("\t")
    assert float(hz) == pytest.approx(note_to_freq(60))
    vel_lines = open(stem + "_velocity.txt").read().strip().split("\n")
    assert vel_lines[1].split("\t")[3] == "80"


def test_mpe_refs_roundtrip(tmp_path):
    stem = str(tmp_path / "piece")
    write_note_refs(NOTES, stem)
    times, freqs = read_mpe_ref(stem + "_mpe_16ms.txt")
    assert times[1] - times[0] == pytest.approx(0.016)
    # frame at 0.3 s should contain both active notes
    idx = int(0.3 * 62.5 + 0.5)
    assert sorted(freqs[idx]) == pytest.approx(
        sorted([note_to_freq(60), note_to_freq(64)]))
    roll = mpe_roll(NOTES, 62.5)
    assert roll.shape[1] == 128 and roll[:, 60].sum() == int(0.5 * 62.5) + 1


def test_intervals_from_rolls_pairing():
    hop = 0.016
    on = np.zeros((1, 100, 88), np.float32)
    off = np.zeros((1, 100, 88), np.float32)
    on[0, 10, 5] = 0.9
    off[0, 30, 5] = 0.9
    on[0, 50, 5] = 0.8  # no offset after -> min duration
    iv, pz = intervals_from_rolls(on, off, hop, note_min=21)
    assert iv.shape == (2, 2)
    np.testing.assert_allclose(iv[0], [10 * hop, 30 * hop])
    assert iv[1][1] - iv[1][0] == pytest.approx(0.032)
    assert pz[0] == pytest.approx(440.0 * 2 ** ((26 - 69) / 12))


def test_intervals_empty_fallback():
    iv, pz = intervals_from_rolls(np.zeros((1, 10, 88)), np.zeros((1, 10, 88)),
                                  0.016)
    assert iv.shape == (1, 2) and pz[0] == 440.0


def test_metrics_fn_end_to_end(rng):
    """metrics_fn on a state whose posteriors we control via a stub."""
    import jax

    from nylon_amt_tpu.train.metrics import make_note_metrics_fn
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.train.step import create_train_state

    import dataclasses
    from nylon_amt_tpu.config import ModelConfig, TrainConfig

    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2),
                 train=TrainConfig(batch_size=2))
    feat = rng.standard_normal((40, 256)).astype(np.float32)
    lab = {"onset": (rng.random((40, 88)) > 0.97).astype(np.float32),
           "offset": (rng.random((40, 88)) > 0.97).astype(np.float32),
           "mpe": rng.random((40, 88)) > 0.9,
           "velocity": rng.integers(1, 127, (40, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])
    ds = WindowDataset(arrays, cfg, n_slice=16)

    state = create_train_state(cfg, jax.random.key(0))
    metrics_fn = make_note_metrics_fn(cfg)
    out = metrics_fn(state, [ds])
    assert set(out) >= {"precision", "recall", "f1"}
    assert all(0.0 <= v <= 1.0 for v in out.values())
