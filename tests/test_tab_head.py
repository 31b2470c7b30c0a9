"""Learned string/fret tablature head (ModelConfig.tab_head).

BASELINE config 3 names a "string+fret tab head for Alphatab export"; the
reference repo has no counterpart (its end goal — README.md:27-37 — was
never built). These tests cover the head end to end: model output, loss
term, label rasterization, corpus round trip, engine/fused-path parity,
decode annotation, warm-start merge, and the torch-export exclusion.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
from nylon_amt_tpu.models.hft import build_model, init_params

N_STRINGS = 6


def tab_config(**model_kw):
    kw = dict(hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1,
              enc_head=2, dec_head=2, dropout=0.0, tab_head=True)
    kw.update(model_kw)
    return Config(model=ModelConfig(**kw),
                  train=TrainConfig(batch_size=2, n_slice=1))


def _batch(cfg, B=2, seed=0, with_string=True):
    rng = np.random.default_rng(seed)
    n_note = cfg.midi.num_note
    batch = {
        "spec": rng.standard_normal(
            (B, cfg.feature.n_bins, cfg.window_frames)).astype(np.float32),
        "onset": (rng.random((B, cfg.input.num_frame, n_note)) < 0.01
                  ).astype(np.float32),
        "offset": (rng.random((B, cfg.input.num_frame, n_note)) < 0.01
                   ).astype(np.float32),
        "mpe": (rng.random((B, cfg.input.num_frame, n_note)) < 0.05
                ).astype(np.float32),
        "velocity": rng.integers(
            0, 128, (B, cfg.input.num_frame, n_note)).astype(np.int32),
    }
    if with_string:
        batch["string"] = rng.integers(
            0, N_STRINGS + 1, (B, cfg.input.num_frame, n_note)
        ).astype(np.int32)
    return batch


# ---------------------------------------------------------------- model ----

def test_model_emits_string_logits():
    cfg = tab_config()
    params = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)
    spec = jnp.zeros((2, cfg.feature.n_bins, cfg.window_frames), jnp.float32)
    out = model.apply({"params": params}, spec, deterministic=True)
    assert out["string_B"].shape == (2, cfg.input.num_frame,
                                     cfg.midi.num_note, N_STRINGS + 1)
    assert "fc_string_time" in params["decoder"]


def test_tab_head_off_by_default():
    cfg = tab_config(tab_head=False)
    params = init_params(cfg, jax.random.key(0))
    assert "fc_string_time" not in params["decoder"]


def test_tab_head_requires_two_stage_decoder():
    with pytest.raises(ValueError, match="tab_head"):
        tab_config(dec_alg="cafreq").validate()


def test_engine_and_fused_train_match_flax():
    from nylon_amt_tpu.infer import engine
    from nylon_amt_tpu.models import fused_train

    cfg = tab_config(enc_layer=2, dec_layer=2)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(3)
    spec = jnp.asarray(rng.standard_normal(
        (2, cfg.feature.n_bins, cfg.window_frames)), jnp.float32)
    ref = build_model(cfg).apply({"params": params}, spec,
                                 deterministic=True)
    got_e = engine.forward(params, spec, cfg, interpret=True)
    got_t = fused_train.make_fused_apply(cfg, interpret=True)(
        {"params": params}, spec, deterministic=True)
    for got, tag in ((got_e, "engine"), (got_t, "fused_train")):
        assert "string_B" in got, tag
        np.testing.assert_allclose(
            np.asarray(got["string_B"]), np.asarray(ref["string_B"]),
            atol=2e-4, rtol=2e-4, err_msg=tag)


# ----------------------------------------------------------------- loss ----

def test_loss_includes_string_term_only_with_labels():
    from nylon_amt_tpu.train.step import loss_fn

    cfg = tab_config()
    params = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)

    loss_with, m_with = loss_fn(cfg, model.apply, params, _batch(cfg))
    loss_without, m_without = loss_fn(cfg, model.apply, params,
                                      _batch(cfg, with_string=False))
    assert "loss_string_B" in m_with
    assert "loss_string_B" not in m_without
    assert float(loss_with) > float(loss_without)
    np.testing.assert_allclose(
        float(loss_with) - float(loss_without),
        float(m_with["loss_string_B"]), rtol=1e-5)


def test_train_step_learns_string_head():
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    cfg = tab_config()
    state = create_train_state(cfg, jax.random.key(0), batch_size=2)
    step = make_train_step(cfg)
    batch = _batch(cfg)
    _, m0 = step(state, batch, jax.random.key(1))
    # gradient flows: the head's params move
    before = np.asarray(
        create_train_state(cfg, jax.random.key(0), batch_size=2)
        .params["decoder"]["fc_string_time"]["kernel"])
    state2, _ = step(create_train_state(cfg, jax.random.key(0), batch_size=2),
                     batch, jax.random.key(1))
    after = np.asarray(state2.params["decoder"]["fc_string_time"]["kernel"])
    assert float(m0["loss_string_B"]) > 0
    assert not np.allclose(before, after)


# ---------------------------------------------------------------- labels ----

def test_note2label_string_raster():
    from nylon_amt_tpu.labels import note2label

    cfg = tab_config()
    notes = [{"pitch": 64, "onset": 0.5, "offset": 1.0, "velocity": 90,
              "string": 1},
             {"pitch": 45, "onset": 1.0, "offset": 1.5, "velocity": 70,
              "string": 5}]
    lab = note2label(cfg, notes, nframe=128, strings=True)
    assert lab["string"].shape == (128, cfg.midi.num_note)
    fps = cfg.feature.frames_per_sec
    f0 = int(0.5 * fps + 0.5)
    assert lab["string"][f0, 64 - cfg.midi.note_min] == 1
    f1 = int(1.0 * fps + 0.5)
    assert lab["string"][f1, 45 - cfg.midi.note_min] == 5
    # string cells coincide with velocity cells
    np.testing.assert_array_equal(lab["string"] > 0, lab["velocity"] > 0)
    # off by default
    assert "string" not in note2label(cfg, notes, nframe=128)


def test_corpus_roundtrip_and_gather_with_strings(tmp_path):
    from nylon_amt_tpu.data.corpus import SplitArrays, assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.labels import note2label

    cfg = tab_config()
    rng = np.random.default_rng(0)
    feats, labs = [], []
    for _ in range(2):
        feat = rng.standard_normal((300, cfg.feature.mel_bins)
                                   ).astype(np.float32)
        notes = [{"pitch": 60, "onset": 0.3, "offset": 0.8, "velocity": 80,
                  "string": 3}]
        feats.append(feat)
        labs.append(note2label(cfg, notes, nframe=300, strings=True))
    arrays = assemble_split(cfg, feats, labs)
    assert arrays.string is not None
    arrays.save(str(tmp_path), "train")
    loaded = SplitArrays.load(str(tmp_path), "train")
    np.testing.assert_array_equal(np.asarray(loaded.string),
                                  np.asarray(arrays.string))

    batch = WindowDataset(loaded, cfg).gather(np.array([0, 5]))
    assert batch["string"].shape == (2, cfg.input.num_frame,
                                     cfg.midi.num_note)
    assert batch["string"].dtype == np.int32

    # a string-less corpus keeps the old five-array format
    labs_plain = [{k: v for k, v in l.items() if k != "string"} for l in labs]
    plain = assemble_split(cfg, feats, labs_plain)
    assert plain.string is None
    plain.save(str(tmp_path / "plain"), "train")
    reloaded = SplitArrays.load(str(tmp_path / "plain"), "train")
    assert reloaded.string is None
    assert "string" not in WindowDataset(reloaded, cfg).gather(np.array([0]))


# ------------------------------------------------------------- inference ----

def test_transcriber_returns_string_grid_and_annotation():
    from nylon_amt_tpu.infer.tab import annotate_strings, assign_strings
    from nylon_amt_tpu.infer.transcribe import Transcriber

    cfg = tab_config()
    params = init_params(cfg, jax.random.key(0))
    tr = Transcriber(cfg, params=params, batch_windows=2, use_engine=False)
    feat = np.random.default_rng(0).standard_normal(
        (200, cfg.feature.n_bins)).astype(np.float32)
    post = tr.transcript(feat)
    assert "string_B" in post
    assert post["string_B"].shape == post["velocity_B"].shape
    assert post["string_B"].dtype == np.int8

    grid = np.zeros_like(post["string_B"])
    fps = cfg.feature.frames_per_sec
    frame = int(1.0 * fps + 0.5)
    grid[frame, 64 - cfg.midi.note_min] = 2   # predict string 2 for E4
    notes = [{"pitch": 64, "onset": 1.0, "offset": 1.4, "velocity": 80}]
    annotated = annotate_strings(notes, grid, cfg)
    assert annotated[0]["string"] == 2
    assert "string" not in notes[0]          # input not mutated
    tab = assign_strings(annotated)
    assert tab.notes[0].string == 2          # honored (fret 5 on B string)
    assert tab.notes[0].fret == 64 - 59

    # infeasible prediction falls back to the greedy rule
    grid[frame, 64 - cfg.midi.note_min] = 6  # E4 on low E = fret 24 > max
    bad = annotate_strings(notes, grid, cfg)
    tab2 = assign_strings(bad)
    assert tab2.notes[0].string != 6


def test_stride_mode_carries_string_grid():
    from nylon_amt_tpu.infer.transcribe import Transcriber

    cfg = tab_config()
    params = init_params(cfg, jax.random.key(0))
    tr = Transcriber(cfg, params=params, batch_windows=2, use_engine=False)
    feat = np.random.default_rng(0).standard_normal(
        (200, cfg.feature.n_bins)).astype(np.float32)
    post = tr.transcript_stride(feat, n_offset=16)
    assert "string_B" in post
    assert post["string_B"].shape == post["onset_B"].shape


# ------------------------------------------------------- warm start/export ----

def test_merge_params_subset_warm_start():
    from nylon_amt_tpu.train.checkpoint import merge_params

    cfg_tab = tab_config()
    cfg_plain = tab_config(tab_head=False)
    fresh = init_params(cfg_tab, jax.random.key(0))
    piano = init_params(cfg_plain, jax.random.key(7))
    merged = merge_params(fresh, piano)
    # shared params come from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["fc_onset_time"]["kernel"]),
        np.asarray(piano["decoder"]["fc_onset_time"]["kernel"]))
    # the new head keeps its fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["fc_string_time"]["kernel"]),
        np.asarray(fresh["decoder"]["fc_string_time"]["kernel"]))

    # reverse direction (checkpoint has MORE params) must fail loudly
    with pytest.raises(KeyError):
        merge_params(piano, fresh)


def test_export_drops_tab_head():
    from nylon_amt_tpu.train.importer import export_state_dict

    cfg = tab_config(enc_layer=2, dec_layer=2)
    params = init_params(cfg, jax.random.key(0))
    sd = export_state_dict(params, 2, 2)
    assert not any("string" in k for k in sd)
