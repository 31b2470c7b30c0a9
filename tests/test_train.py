"""Training subsystem tests: loss parity, step, plateau, checkpoint, DP."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
from nylon_amt_tpu.data.corpus import assemble_split
from nylon_amt_tpu.data.windows import WindowDataset
from nylon_amt_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from nylon_amt_tpu.train.plateau import ReduceLROnPlateau
from nylon_amt_tpu.train.step import (
    create_train_state,
    get_learning_rate,
    loss_fn,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


def tiny_config(**train_kw):
    train_kw.setdefault("batch_size", 4)
    return Config(
        model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1,
                          enc_head=2, dec_head=2, dropout=0.0),
        train=TrainConfig(**train_kw),
    )


def fake_batch(rng, cfg, B=4):
    return {
        "spec": rng.standard_normal((B, 256, cfg.window_frames)).astype(np.float32),
        "onset": (rng.random((B, 128, 88)) > 0.95).astype(np.float32),
        "offset": (rng.random((B, 128, 88)) > 0.95).astype(np.float32),
        "mpe": (rng.random((B, 128, 88)) > 0.7).astype(np.float32),
        "velocity": rng.integers(0, 128, (B, 128, 88)).astype(np.int32),
        "valid": np.ones((B,), np.float32),
    }


def test_loss_matches_torch_criteria(rng):
    """Our logits-based loss == torch BCELoss(sigmoid)+CrossEntropyLoss on
    the same values (reference train.py:141-153)."""
    cfg = tiny_config()
    B = 2
    out = {}
    for fam in ("A", "B"):
        out[f"onset_{fam}"] = rng.standard_normal((B, 128, 88)).astype(np.float32)
        out[f"offset_{fam}"] = rng.standard_normal((B, 128, 88)).astype(np.float32)
        out[f"mpe_{fam}"] = rng.standard_normal((B, 128, 88)).astype(np.float32)
        out[f"velocity_{fam}"] = rng.standard_normal((B, 128, 88, 128)).astype(np.float32)
    batch = fake_batch(rng, cfg, B)

    apply_fn = lambda *_a, **_k: out  # bypass the model
    loss, _ = loss_fn(cfg, apply_fn, {}, batch)

    bce, ce = torch.nn.BCELoss(), torch.nn.CrossEntropyLoss()
    ref = 0.0
    for fam in ("A", "B"):
        for k in ("onset", "offset", "mpe"):
            ref += bce(torch.sigmoid(torch.from_numpy(out[f"{k}_{fam}"])).reshape(-1),
                       torch.from_numpy(batch[k]).reshape(-1))
        ref += ce(torch.from_numpy(out[f"velocity_{fam}"]).reshape(-1, 128),
                  torch.from_numpy(batch["velocity"]).reshape(-1).long())
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-5)


def test_masked_rows_do_not_contribute(rng):
    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.key(0))
    b4 = fake_batch(rng, cfg, 4)
    # Same 2 real rows, padded two ways: garbage in masked rows must not matter.
    b4["valid"] = np.array([1, 1, 0, 0], np.float32)
    b4_alt = {k: v.copy() for k, v in b4.items()}
    for k in ("spec", "onset", "offset", "mpe", "velocity"):
        b4_alt[k][2:] = np.flip(b4_alt[k][2:], axis=0)
    l1, _ = loss_fn(cfg, state.apply_fn, state.params, b4)
    l2, _ = loss_fn(cfg, state.apply_fn, state.params, b4_alt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_train_step_reduces_loss(rng):
    cfg = tiny_config(lr=1e-3)
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    batch = fake_batch(rng, cfg)
    drng = jax.random.key(1)
    losses = []
    for _ in range(40):
        state, metrics = step(state, batch, drng)
        losses.append(float(metrics["loss"]))
    # Random 128-class velocity targets put a ~9.7 floor under the loss, so
    # assert a solid absolute decrease rather than a ratio.
    assert losses[-1] < losses[0] - 2.0, losses[::10]
    assert losses[-1] == min(losses)


def test_learning_rate_injection():
    cfg = tiny_config(lr=1e-3)
    state = create_train_state(cfg, jax.random.key(0))
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-3)
    new = set_learning_rate(state.opt_state, 1e-4)
    assert get_learning_rate(new) == pytest.approx(1e-4)


def test_plateau_matches_torch():
    """State machine parity with torch ReduceLROnPlateau over a noisy curve."""
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=1.0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt)
    ours = ReduceLROnPlateau(lr=1.0)
    rng = np.random.default_rng(0)
    value = 1.0
    for i in range(60):
        value *= 1.0 + rng.normal() * 0.01  # plateau-ish noise
        tsched.step(value)
        ours.step(value)
        assert ours.lr == pytest.approx(opt.param_groups[0]["lr"]), f"step {i}"


def test_checkpoint_roundtrip(rng, tmp_path):
    from nylon_amt_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config()
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    state, _ = step(state, fake_batch(rng, cfg), jax.random.key(1))

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, 0, state, {"scheduler": {"lr": 1e-4}}, is_best=True)

    fresh = create_train_state(cfg, jax.random.key(99))
    restored, host = mgr.restore(0, 0, fresh)
    assert host["scheduler"]["lr"] == 1e-4
    assert mgr.best_tag() == (0, 0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    assert int(restored.step) == 1


def test_load_params_ignores_saved_shardings(rng, tmp_path):
    """load_params must restore on the local topology even when the
    checkpoint was written with device placements that no longer exist
    (e.g. TPU-trained -> CPU inference, or mesh-sharded -> single device).
    The template-less orbax restore replays saved shardings and raises
    'Device ... was not found'; the metadata-template path must not."""
    from nylon_amt_tpu.train.checkpoint import CheckpointManager, load_params

    cfg = tiny_config(batch_size=8)
    state = create_train_state(cfg, jax.random.key(0))
    mesh = make_mesh(n_data=8)
    sharded = state.replace(params=shard_params(state.params, mesh))

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, 0, sharded, {"scheduler": {"lr": 1e-4}}, is_best=True)

    params = load_params(str(tmp_path))
    # Contract: host-resident numpy leaves — device-agnostic AND immune to
    # tunnel journal resets that invalidate pre-existing device buffers
    # (utils/tunnel.py); Transcriber device_puts once on construction.
    for leaf in jax.tree_util.tree_leaves(params):
        assert isinstance(leaf, np.ndarray)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, params)


def test_dp_matches_single_device(rng):
    """A data-parallel step over an 8-device mesh must equal the single-device
    step (same batch, replicated params)."""
    cfg = tiny_config(batch_size=8)
    batch = fake_batch(rng, cfg, 8)
    drng = jax.random.key(3)

    state1 = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    state1, m1 = step(state1, batch, drng)

    mesh = make_mesh(n_data=8)
    state8 = create_train_state(cfg, jax.random.key(0))
    state8 = state8.replace(params=shard_params(state8.params, mesh))
    state8, m8 = step(state8, shard_batch(batch, mesh), drng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # Adam updates are ~lr=1e-4 scale; cross-device reduction order adds f32
    # noise that the m/sqrt(v) ratio amplifies for near-zero gradients, so
    # compare absolutely at a fraction of the step size.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        state1.params, state8.params)


def test_tp_sharding_compiles_and_matches(rng):
    """data x model = 4x2 mesh: TP weight sharding must not change the math."""
    cfg = tiny_config(batch_size=4)
    batch = fake_batch(rng, cfg, 4)
    drng = jax.random.key(3)

    state1 = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    state1, m1 = step(state1, batch, drng)

    mesh = make_mesh(n_data=4, n_model=2)
    state_tp = create_train_state(cfg, jax.random.key(0))
    state_tp = state_tp.replace(params=shard_params(state_tp.params, mesh))
    state_tp, mtp = step(state_tp, shard_batch(batch, mesh), drng)

    np.testing.assert_allclose(float(m1["loss"]), float(mtp["loss"]), rtol=1e-5)


def test_trainer_end_to_end(rng, tmp_path):
    """Two epochs over a synthetic corpus through the full Trainer."""
    from nylon_amt_tpu.train.loop import Trainer

    cfg = dataclasses.replace(tiny_config(batch_size=4, epochs=2), )
    feat = rng.standard_normal((60, 256)).astype(np.float32)
    lab = {"onset": rng.random((60, 88)).astype(np.float32),
           "offset": rng.random((60, 88)).astype(np.float32),
           "mpe": rng.random((60, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (60, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])

    def provider(split, div):
        return WindowDataset(arrays, cfg, n_slice=8)

    trainer = Trainer(cfg, str(tmp_path / "run"))
    state = trainer.fit(provider)
    perf = trainer.performance
    assert len(perf["loss_train"]) == 2
    assert (tmp_path / "run" / "performance.json").exists()
    assert (tmp_path / "run" / "parameter.json").exists()
    assert trainer.ckpt.exists(1, 0)
    # resume from (0, 0) must run the remaining epoch without error
    trainer2 = Trainer(cfg, str(tmp_path / "run"))
    trainer2.fit(provider, resume=(0, 0))
    assert len(trainer2.performance["loss_train"]) == 2


def test_preemption_checkpoint_and_resume(rng, tmp_path):
    """SIGTERM/SIGUSR1-driven elastic recovery: a preemption request mid-run
    checkpoints the live state tagged "preempted"; resume="auto" re-runs the
    interrupted (epoch, div) instead of skipping past it.
    """
    import os
    import signal

    from nylon_amt_tpu.train.loop import Trainer

    cfg = tiny_config(batch_size=4, epochs=2)
    feat = rng.standard_normal((60, 256)).astype(np.float32)
    lab = {"onset": rng.random((60, 88)).astype(np.float32),
           "offset": rng.random((60, 88)).astype(np.float32),
           "mpe": rng.random((60, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (60, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])

    calls = {"n": 0}

    def preempting_provider(split, div):
        if split == "train":
            calls["n"] += 1
            if calls["n"] == 2:  # deliver eviction notice during epoch 1
                os.kill(os.getpid(), signal.SIGUSR1)
        return WindowDataset(arrays, cfg, n_slice=8)

    trainer = Trainer(cfg, str(tmp_path / "run"))
    trainer.fit(preempting_provider)
    # Epoch 0 completed; epoch 1 was preempted before any batch ran.
    assert len(trainer.performance["loss_train"]) == 1
    assert trainer.ckpt.exists(1, 0)
    assert trainer.latest_checkpoint() == (1, 0)

    def provider(split, div):
        return WindowDataset(arrays, cfg, n_slice=8)

    trainer2 = Trainer(cfg, str(tmp_path / "run"))
    trainer2.fit(provider, resume="auto")
    # The preempted (1, 0) shard was re-run, not skipped: the restored
    # performance history (1 entry) gains exactly one more entry.
    assert len(trainer2.performance["loss_train"]) == 2
    assert not trainer2._preempt_requested


def _toy_provider(rng, cfg):
    feat = rng.standard_normal((60, 256)).astype(np.float32)
    lab = {"onset": rng.random((60, 88)).astype(np.float32),
           "offset": rng.random((60, 88)).astype(np.float32),
           "mpe": rng.random((60, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (60, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])

    def provider(split, div):
        return WindowDataset(arrays, cfg, n_slice=8)

    return provider


def test_preempted_resume_matches_uninterrupted(rng, tmp_path):
    """A preemption + auto-resume run reaches bit-identical final params to
    an uninterrupted run: the preempted checkpoint snapshots PRE-shard state
    and shuffle RNG, so the interrupted shard replays exactly once with the
    same batch order (no double-applied batches, no shuffle drift)."""
    import os
    import signal

    from nylon_amt_tpu.train.loop import Trainer

    cfg = tiny_config(batch_size=4, epochs=2)
    provider = _toy_provider(rng, cfg)

    baseline = Trainer(cfg, str(tmp_path / "base"))
    base_state = baseline.fit(provider)

    calls = {"n": 0}

    def preempting_provider(split, div):
        ds = provider(split, div)
        if split == "train":
            calls["n"] += 1
            if calls["n"] == 2:  # eviction notice during epoch 1
                os.kill(os.getpid(), signal.SIGUSR1)
        return ds

    trainer = Trainer(cfg, str(tmp_path / "run"))
    trainer.fit(preempting_provider)
    trainer2 = Trainer(cfg, str(tmp_path / "run"))
    resumed_state = trainer2.fit(provider, resume="auto")

    for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                    jax.tree_util.tree_leaves(resumed_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert trainer2.performance["loss_train"] == baseline.performance["loss_train"]


def test_latest_checkpoint_skips_torn(rng, tmp_path):
    """A hard kill between the orbax state write and host.json leaves a torn
    checkpoint; auto-resume must fall back to the newest restorable one."""
    import os

    from nylon_amt_tpu.train.loop import Trainer

    cfg = tiny_config(batch_size=4, epochs=2)
    trainer = Trainer(cfg, str(tmp_path / "run"))
    trainer.fit(_toy_provider(rng, cfg))
    assert trainer.latest_checkpoint() == (1, 0)

    # Simulate the torn save: host.json missing on the newest checkpoint.
    os.remove(os.path.join(trainer.ckpt.directory, "model_001_000",
                           "host.json"))
    assert trainer.latest_checkpoint() == (0, 0)
    # resume="auto" restores (0, 0) and completes without crashing.
    trainer2 = Trainer(cfg, str(tmp_path / "run"))
    trainer2.fit(_toy_provider(rng, cfg), resume="auto")
    assert trainer2.ckpt.is_valid(1, 0)


def test_checkpoint_retention(rng, tmp_path):
    """keep_checkpoints=1 retains only {best} + newest after each save."""
    from nylon_amt_tpu.train.loop import Trainer

    cfg = tiny_config(batch_size=4, epochs=3, keep_checkpoints=1)
    trainer = Trainer(cfg, str(tmp_path / "run"))
    trainer.fit(_toy_provider(rng, cfg))
    kept = trainer.ckpt.valid_tags()
    expected = {(2, 0), (trainer.best_epoch, trainer.best_div)}
    assert set(kept) == expected
    assert len(kept) <= 2
