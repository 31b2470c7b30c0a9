"""Corpus assembly + window sampling tests (vs reference make_dataset geometry)."""

import os

import numpy as np
import pytest

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.data.corpus import SplitArrays, assemble_split, build_corpus_split
from nylon_amt_tpu.data.windows import WindowDataset


@pytest.fixture
def config():
    return Config()


def _fake_piece(rng, n_frames):
    feat = rng.standard_normal((n_frames, 256)).astype(np.float32)
    lab = {
        "onset": rng.random((n_frames, 88)).astype(np.float32),
        "offset": rng.random((n_frames, 88)).astype(np.float32),
        "mpe": rng.random((n_frames, 88)) > 0.5,
        "velocity": rng.integers(0, 127, (n_frames, 88)).astype(np.int8),
    }
    return feat, lab


def test_assemble_geometry(rng, config):
    pieces = [_fake_piece(rng, n) for n in (50, 70)]
    arrays = assemble_split(config, [p[0] for p in pieces],
                            [p[1] for p in pieces])
    gap = 32 + 128 - 1  # margin_f + num_frame - 1
    assert arrays.feature.shape[0] == 32 + 50 + gap + 70 + gap
    assert len(arrays.idx) == 120
    # idx blocks: [32..82) then [50 + gap offset..]
    assert arrays.idx[0] == 32 and arrays.idx[49] == 81
    assert arrays.idx[50] == 32 + 50 + gap
    # pad value before/after pieces
    assert np.allclose(arrays.feature[0], config.pad_value)
    # pieces land intact
    np.testing.assert_array_equal(arrays.feature[32:82], pieces[0][0])
    np.testing.assert_array_equal(arrays.onset[arrays.idx[50]:arrays.idx[50]+70],
                                  pieces[1][1]["onset"])


def test_every_window_in_bounds(rng, config):
    arrays = assemble_split(config, *zip(*[_fake_piece(rng, n) for n in (5, 200, 33)]))
    inp = config.input
    for start in arrays.idx:
        assert start - inp.margin_b >= 0
        assert start + inp.num_frame + inp.margin_f <= arrays.feature.shape[0]


def test_window_gather_matches_reference_layout(rng, config):
    feat, lab = _fake_piece(rng, 300)
    arrays = assemble_split(config, [feat], [lab])
    ds = WindowDataset(arrays, config)
    batch = ds.gather(np.array([0, 100]))
    # spec = feature[idx-32 : idx+160].T (dataset.py:49-56)
    start = arrays.idx[100]
    np.testing.assert_array_equal(
        batch["spec"][1], arrays.feature[start - 32 : start + 160].T)
    np.testing.assert_array_equal(batch["onset"][1],
                                  arrays.onset[start : start + 128])
    assert batch["velocity"].dtype == np.int32
    assert batch["mpe"].dtype == np.float32


def test_n_slice_subsampling(rng, config):
    arrays = assemble_split(config, *zip(*[_fake_piece(rng, 100)]))
    ds = WindowDataset(arrays, config, n_slice=16)
    # reference: idx[:len//16*16:16] (dataset.py:35-38)
    assert len(ds) == 6
    np.testing.assert_array_equal(ds.idx, arrays.idx[:96:16])


def test_pad_to_batch(rng, config):
    arrays = assemble_split(config, *zip(*[_fake_piece(rng, 20)]))
    ds = WindowDataset(arrays, config)
    batches = list(ds.batches(8, pad_to_batch=True))
    assert all(b["spec"].shape[0] == 8 for b in batches)
    assert batches[-1]["valid"].sum() == 20 - 8 * 2


def test_save_load_roundtrip(rng, config, tmp_path):
    arrays = assemble_split(config, *zip(*[_fake_piece(rng, 40)]))
    arrays.save(str(tmp_path), "train")
    loaded = SplitArrays.load(str(tmp_path), "train")
    np.testing.assert_array_equal(loaded.feature, arrays.feature)
    np.testing.assert_array_equal(loaded.idx, arrays.idx)


def test_sharded_build_round_robin(rng, config, tmp_path):
    pieces = [_fake_piece(rng, 30 + i) for i in range(5)]
    build_corpus_split(config, pieces, str(tmp_path), "train", n_div=2)
    s0 = SplitArrays.load(str(tmp_path), "train", shard=0)
    s1 = SplitArrays.load(str(tmp_path), "train", shard=1)
    # round-robin: shard0 gets pieces 0,2,4 (30+32+34 frames of idx)
    assert len(s0.idx) == 30 + 32 + 34
    assert len(s1.idx) == 31 + 33


def test_normalization(rng):
    import dataclasses
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, input=dataclasses.replace(cfg.input, min_value=-5.0, max_value=3.0))
    feat = np.full((10, 256), -1.0, np.float32)
    lab = {k: np.zeros((10, 88), d) for k, d in
           [("onset", np.float32), ("offset", np.float32), ("mpe", bool),
            ("velocity", np.int8)]}
    arrays = assemble_split(cfg, [feat], [lab])
    np.testing.assert_allclose(arrays.feature[32], (-1.0 + 5.0) / 8.0)
    assert arrays.feature[0, 0] == 0.0  # normalized corpora pad with 0


def test_make_list_maps_split_rule(tmp_path):
    """MAPS MUS split (reference ``make_list_maps.py:48-74``): real-piano
    recordings (ENSTDkAm/ENSTDkCl) -> test; synthesized renditions of tunes
    that appear in test -> valid; remaining tunes -> train."""
    from nylon_amt_tpu.data.lists import make_list_maps

    pieces = [
        ("ENSTDkAm", "chpn_op7_1"),     # real piano -> test
        ("ENSTDkCl", "bk_xmas1"),       # real piano -> test
        ("AkPnBcht", "chpn_op7_1"),     # tune also in test -> valid
        ("SptkBGCl", "bk_xmas1"),       # tune also in test -> valid
        ("AkPnBcht", "mz_311_1"),       # unseen tune -> train
        ("StbgTGd2", "grieg_butterfly"),  # unseen tune -> train
    ]
    for piano, tune in pieces:
        d = tmp_path / piano / "MUS"
        d.mkdir(parents=True, exist_ok=True)
        stem = f"MAPS_MUS-{tune}_{piano}"
        (d / f"{stem}.wav").write_bytes(b"")
        (d / f"{stem}.mid").write_bytes(b"")
    # non-MUS content must be ignored entirely
    other = tmp_path / "AkPnBcht" / "ISOL"
    other.mkdir(parents=True)
    (other / "MAPS_ISOL_NO_P_S0_M60_AkPnBcht.wav").write_bytes(b"")

    cl = make_list_maps(str(tmp_path))
    by_split = {s: sorted(os.path.basename(a)[:-4]
                          for _, a, _ in cl.entries[s])
                for s in ("train", "valid", "test")}
    assert by_split["test"] == ["MAPS_MUS-bk_xmas1_ENSTDkCl",
                                "MAPS_MUS-chpn_op7_1_ENSTDkAm"]
    assert by_split["valid"] == ["MAPS_MUS-bk_xmas1_SptkBGCl",
                                 "MAPS_MUS-chpn_op7_1_AkPnBcht"]
    assert by_split["train"] == ["MAPS_MUS-grieg_butterfly_StbgTGd2",
                                 "MAPS_MUS-mz_311_1_AkPnBcht"]
    # canonical names are zero-padded and sequential within the split
    assert cl.names("test") == ["test_000", "test_001"]
    # every audio path has a .mid sibling recorded
    for s in ("train", "valid", "test"):
        for _, a, m in cl.entries[s]:
            assert m == a[:-4] + ".mid"
