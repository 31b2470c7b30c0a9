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


def _intervals_reference_loop(onset, offset, hop_sec, note_min=21,
                              threshold=0.5, min_duration=0.032):
    """The original (pre-vectorization) triple-loop pairing, kept as the
    semantic reference for intervals_from_rolls (reference train.py:26-45)."""
    from nylon_amt_tpu.metrics.transcription import note_to_hz

    on = np.asarray(onset) >= threshold if threshold is not None \
        else np.asarray(onset) != 0
    off = np.asarray(offset) >= threshold if threshold is not None \
        else np.asarray(offset) != 0
    intervals, pitches = [], []
    min_frames = max(1, int(min_duration / hop_sec))
    for b in range(on.shape[0]):
        for p in range(on.shape[2]):
            on_frames = np.flatnonzero(on[b, :, p])
            if on_frames.size == 0:
                continue
            off_frames = np.flatnonzero(off[b, :, p])
            for f in on_frames:
                later = off_frames[off_frames > f]
                g = int(later[0]) if later.size else f + min_frames
                t0, t1 = f * hop_sec, g * hop_sec
                if t1 - t0 < min_duration:
                    t1 = t0 + min_duration
                intervals.append([t0, t1])
                pitches.append(note_to_hz(p + note_min))
    if not intervals:
        return np.array([[0.0, 0.032]]), np.array([440.0])
    return np.asarray(intervals), np.asarray(pitches)


def test_intervals_vectorization_matches_loop(rng):
    """The vectorized searchsorted pairing == the per-note Python loop,
    including emission order, on dense random rolls."""
    on = (rng.random((3, 64, 88)) > 0.9).astype(np.float32)
    off = (rng.random((3, 64, 88)) > 0.9).astype(np.float32)
    iv_fast, pz_fast = intervals_from_rolls(on, off, 0.016)
    iv_slow, pz_slow = _intervals_reference_loop(on, off, 0.016)
    np.testing.assert_allclose(iv_fast, iv_slow)
    np.testing.assert_allclose(pz_fast, pz_slow)

    # onsets but zero offsets anywhere (empty-offset code path)
    iv_f2, pz_f2 = intervals_from_rolls(on, np.zeros_like(off), 0.016)
    iv_s2, pz_s2 = _intervals_reference_loop(on, np.zeros_like(off), 0.016)
    np.testing.assert_allclose(iv_f2, iv_s2)
    np.testing.assert_allclose(pz_f2, pz_s2)


def test_metrics_fn_ignores_padded_rows(rng):
    """metrics_fn over a split whose last batch is padded scores exactly the
    real rows: equal to scoring the same batches without padding."""
    import jax

    from nylon_amt_tpu.config import ModelConfig, TrainConfig
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.metrics.transcription import evaluate_notes
    from nylon_amt_tpu.train.metrics import make_note_metrics_fn
    from nylon_amt_tpu.train.step import create_train_state

    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2),
                 train=TrainConfig(batch_size=4))
    feat = rng.standard_normal((80, 256)).astype(np.float32)
    lab = {"onset": (rng.random((80, 88)) > 0.97).astype(np.float32),
           "offset": (rng.random((80, 88)) > 0.97).astype(np.float32),
           "mpe": rng.random((80, 88)) > 0.9,
           "velocity": rng.integers(1, 127, (80, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])
    ds = WindowDataset(arrays, cfg, n_slice=16)
    assert len(ds) % cfg.train.batch_size != 0, "test needs a padded tail"

    state = create_train_state(cfg, jax.random.key(0))
    got = make_note_metrics_fn(cfg)(state, [ds])

    # Hand-rolled expectation: same batch partitioning, no padding.
    @jax.jit
    def forward(params, spec):
        out = state.apply_fn({"params": params}, spec, deterministic=True)
        return jax.nn.sigmoid(out["onset_B"]), jax.nn.sigmoid(out["offset_B"])

    hop = cfg.feature.hop_sec
    nm = cfg.midi.note_min
    totals, n = {"f1": 0.0}, 0
    # Unpadded iteration: the last batch is genuinely smaller, no mask, no
    # slicing — an independent ground truth for what the padded path must
    # compute.
    for batch in ds.batches(cfg.train.batch_size, shuffle=False):
        on_p, off_p = forward(state.params, batch["spec"])
        est = intervals_from_rolls(np.asarray(on_p), np.asarray(off_p),
                                   hop, nm, 0.5)
        ref = intervals_from_rolls(batch["onset"], batch["offset"],
                                   hop, nm, 0.5)
        totals["f1"] += evaluate_notes(ref[0], ref[1], est[0], est[1])["F-measure"]
        n += 1
    assert got["f1"] == pytest.approx(totals["f1"] / n)


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
