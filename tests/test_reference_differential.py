"""Differential L2/L3 parity: execute the reference's OWN numpy code.

The model (L5), trainer (L6), and decoder (L7) layers are pinned by tests
that run the PyTorch reference. This file holds the label rasterizer and
corpus assembler to the same standard: it imports
``hftt_code/corpus/conv_note2label.py`` (numpy-only) and
``hftt_code/corpus/make_dataset.py`` (numpy+tqdm) from the read-only
reference checkout, drives both stacks with identical synthetic inputs, and
asserts the arrays byte-equal. A misreading of either reference file would
silently shift every training target; these tests execute the original
instead of encoding a reading of it.

The reference files use the ``np.bool`` alias (removed in numpy 1.24) —
restored for the duration of each call via ``_np_bool_shim``.
"""

import contextlib
import importlib.util
import os
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import REFERENCE_PATH, requires_reference

from nylon_amt_tpu.config import Config, FeatureConfig, InputConfig
from nylon_amt_tpu.data.corpus import SplitArrays, assemble_split, build_corpus_split
from nylon_amt_tpu.labels.note2label import note2label

CORPUS_DIR = os.path.join(REFERENCE_PATH, "hftt_code", "corpus")


def _import_reference(name: str):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(CORPUS_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def _np_bool_shim():
    """numpy >= 1.24 removed the ``np.bool`` alias the reference uses."""
    had = hasattr(np, "bool")
    if not had:
        np.bool = np.bool_
    try:
        yield
    finally:
        if not had:
            del np.bool


def _synthetic_notes(seed: int, n: int = 60, strings: bool = False):
    """Note lists exercising every rasterizer branch: chords, overlapping
    same-pitch notes (order-dependent velocity), exact offset==onset chains
    (offset suppression), a t=0 onset, and long notes (duration-tolerance
    ramp widening)."""
    rng = np.random.default_rng(seed)
    notes = []
    t = 0.0
    for i in range(n):
        pitch = int(rng.integers(21, 109))
        onset = t + float(rng.uniform(0.0, 0.4))
        dur = float(rng.uniform(0.05, 3.0))
        notes.append({"pitch": pitch, "onset": onset,
                      "offset": onset + dur,
                      "velocity": int(rng.integers(1, 128))})
        # chord partner at the identical onset
        if i % 4 == 0:
            notes.append({"pitch": min(pitch + 7, 108), "onset": onset,
                          "offset": onset + dur * 0.7,
                          "velocity": int(rng.integers(1, 128))})
        # same-pitch re-onset exactly at the offset (suppression rule)
        if i % 5 == 0:
            notes.append({"pitch": pitch, "onset": onset + dur,
                          "offset": onset + dur + 0.3,
                          "velocity": int(rng.integers(1, 128))})
        # overlapping same-pitch note with a different velocity
        # (order-dependent velocity overwrite)
        if i % 7 == 0:
            notes.append({"pitch": pitch, "onset": onset + 0.01,
                          "offset": onset + 0.4,
                          "velocity": int(rng.integers(1, 128))})
        t = onset + float(rng.uniform(0.05, 0.3))
    notes.insert(0, {"pitch": 60, "onset": 0.0, "offset": 0.5,
                     "velocity": 100})
    if strings:
        for k, note in enumerate(notes):
            note["string"] = (k % 6) + 1
    return notes


@requires_reference
@pytest.mark.parametrize("dur_tol", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_note2label_differential(seed, dur_tol):
    """Our rasterizer == the reference's executed on identical notes."""
    ref = _import_reference("conv_note2label")
    cfg = Config()
    notes = _synthetic_notes(seed)

    with _np_bool_shim():
        ref_label = ref.note2label(cfg.to_dict(), notes, dur_tol)
    ours = note2label(cfg, notes, offset_duration_tolerance_flag=dur_tol)

    ref_mpe = np.asarray(ref_label["mpe"], dtype=bool)
    ref_onset = np.asarray(ref_label["onset"], dtype=np.float32)
    ref_offset = np.asarray(ref_label["offset"], dtype=np.float32)
    ref_velocity = np.asarray(ref_label["velocity"], dtype=np.int8)

    assert ours["mpe"].shape == ref_mpe.shape
    np.testing.assert_array_equal(ours["mpe"], ref_mpe)
    np.testing.assert_array_equal(ours["onset"], ref_onset)
    np.testing.assert_array_equal(ours["offset"], ref_offset)
    np.testing.assert_array_equal(ours["velocity"], ref_velocity)


def _small_config(max_value: float = 0.0) -> Config:
    # Small geometry keeps the assembled arrays tiny; min_value is pinned to
    # the reference's float32-rounded value so the normalization path is
    # bit-comparable.
    return Config(
        feature=FeatureConfig(mel_bins=8),
        input=InputConfig(margin_b=4, margin_f=3, num_frame=16,
                          max_value=max_value,
                          min_value=float(np.float32(np.log(1e-8)))),
    )


def _make_pieces(cfg: Config, n_pieces: int, seed: int = 0):
    """Per-piece (feature, label) pairs with deliberate frame-count
    mismatches both ways (make_dataset takes max(feature, label) frames)."""
    rng = np.random.default_rng(seed)
    ref_n2l = _import_reference("conv_note2label")
    pieces = []
    for p in range(n_pieces):
        notes = _synthetic_notes(100 + p, n=8)
        with _np_bool_shim():
            ref_label = ref_n2l.note2label(cfg.to_dict(), notes, False)
        n_label = len(ref_label["mpe"])
        delta = [-5, 0, 7, -2, 3][p % 5]       # feature shorter AND longer
        n_feat = max(1, n_label + delta)
        feat = rng.standard_normal((n_feat, cfg.feature.mel_bins)) \
                  .astype(np.float32)
        pieces.append((feat, ref_label))
    return pieces


def _run_reference_make_dataset(tmp_path, cfg, pieces, n_div):
    ref_md = _import_reference("make_dataset")
    d_feature = tmp_path / "feature_in"
    d_label = tmp_path / "label_in"
    d_dataset = tmp_path / "dataset"
    for d in (d_feature, d_label, d_dataset):
        d.mkdir(exist_ok=True)
    for sub in ("idx", "feature", "label_mpe", "label_onset",
                "label_offset", "label_velocity"):
        (d_dataset / sub).mkdir(exist_ok=True)

    filelist = []
    for i, (feat, label) in enumerate(pieces):
        name = f"piece_{i:03d}"
        filelist.append(Path(name))
        with open(d_feature / f"{name}.pkl", "wb") as f:
            pickle.dump(feat, f, protocol=4)
        with open(d_label / f"{name}.pkl", "wb") as f:
            pickle.dump(label, f, protocol=4)

    # Reference quirk: the n_div==1 branch joins paths with Path.joinpath,
    # the n_div>1 branch with string concatenation (make_dataset.py:83-86).
    d_out = d_dataset if n_div == 1 else str(d_dataset)
    with _np_bool_shim():
        ref_md.make_dataset(filelist, "train", d_feature, d_label, d_out,
                            cfg.to_dict(), n_div)

    def load(sub, div):
        suffix = f"_{div:03d}" if n_div > 1 else ""
        with open(d_dataset / sub / f"train{suffix}.pkl", "rb") as f:
            return pickle.load(f)

    shards = []
    for div in range(n_div):
        shards.append({
            "idx": load("idx", div),
            "feature": load("feature", div),
            "mpe": load("label_mpe", div),
            "onset": load("label_onset", div),
            "offset": load("label_offset", div),
            "velocity": load("label_velocity", div),
        })
    return shards


def _label_arrays(label):
    return {
        "mpe": np.asarray(label["mpe"], dtype=bool),
        "onset": np.asarray(label["onset"], dtype=np.float32),
        "offset": np.asarray(label["offset"], dtype=np.float32),
        "velocity": np.asarray(label["velocity"], dtype=np.int8),
    }


@requires_reference
@pytest.mark.parametrize("n_div,max_value", [(1, 0.0), (3, 0.0), (1, 4.0)])
def test_make_dataset_differential(tmp_path, capsys, n_div, max_value):
    """Our corpus assembler == the reference's make_dataset executed on
    identical per-piece features/labels: feature padding + normalization,
    all four label planes, idx table, and the round-robin shard split."""
    cfg = _small_config(max_value=max_value)
    pieces = _make_pieces(cfg, n_pieces=5)
    ref_shards = _run_reference_make_dataset(tmp_path, cfg, pieces, n_div)
    capsys.readouterr()     # swallow the reference's per-file prints

    out_dir = str(tmp_path / "ours")
    converted = [(feat, _label_arrays(label)) for feat, label in pieces]
    build_corpus_split(cfg, converted, out_dir, "train", n_div=n_div)

    for div in range(n_div):
        ours = SplitArrays.load(out_dir, "train",
                                shard=div if n_div > 1 else None)
        ref = ref_shards[div]
        np.testing.assert_array_equal(np.asarray(ours.idx, np.int64),
                                      np.asarray(ref["idx"], np.int64))
        np.testing.assert_array_equal(ours.feature, ref["feature"])
        np.testing.assert_array_equal(ours.mpe, np.asarray(ref["mpe"], bool))
        np.testing.assert_array_equal(ours.onset, ref["onset"])
        np.testing.assert_array_equal(ours.offset, ref["offset"])
        np.testing.assert_array_equal(
            ours.velocity, np.asarray(ref["velocity"], np.int8))


@requires_reference
def test_config_rewrite_fields_match_reference():
    """The make_dataset __main__ writes min_value / n_bins back into the
    config (make_dataset.py:274-278,305-306); our defaults match."""
    cfg = Config()
    assert cfg.input.max_value == 0.0
    ref_min = float(np.log(np.float64(cfg.feature.log_offset)))
    assert cfg.input.min_value == pytest.approx(ref_min, abs=1e-6)
    assert cfg.feature.n_bins == cfg.feature.mel_bins
