"""Full-model parity of the fused training path vs flax autodiff.

``models/fused_train.py`` runs the entire hFT forward through the
custom-VJP layer kernels. At dropout 0 the loss AND every parameter
gradient must match ``jax.grad`` through ``model.apply`` (the path that is
itself trajectory-parity-tested against the torch reference).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
from nylon_amt_tpu.models import fused_train
from nylon_amt_tpu.models.hft import build_model, init_params
from nylon_amt_tpu.train.step import loss_fn


def small_config(**model_kw):
    kw = dict(hid_dim=16, pf_dim=32, enc_layer=2, dec_layer=2,
              enc_head=2, dec_head=2, dropout=0.0)
    kw.update(model_kw)
    return Config(model=ModelConfig(**kw), train=TrainConfig(batch_size=2))


def fake_batch(rng, cfg, B=2):
    return {
        "spec": jnp.asarray(
            rng.standard_normal((B, cfg.feature.n_bins, cfg.window_frames)),
            jnp.float32),
        "onset": jnp.asarray(rng.random((B, 128, 88)) > 0.95, jnp.float32),
        "offset": jnp.asarray(rng.random((B, 128, 88)) > 0.95, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, 128, 88)) > 0.7, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, 128, (B, 128, 88)),
                                jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }


def test_fused_train_loss_and_grads_match_flax():
    cfg = small_config()
    rng = np.random.default_rng(0)
    params = init_params(cfg, jax.random.key(1), batch_size=2)
    model = build_model(cfg)
    batch = fake_batch(rng, cfg)
    fused_apply = fused_train.make_fused_apply(cfg, interpret=True)
    assert fused_train.supports(cfg)

    def loss_flax(p):
        return loss_fn(cfg, model.apply, p, batch)[0]

    def loss_fused(p):
        return loss_fn(cfg, fused_apply, p, batch)[0]

    l_flax, g_flax = jax.value_and_grad(loss_flax)(params)
    l_fused, g_fused = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l_fused), float(l_flax), rtol=1e-5)

    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_flax)
    assert len(flat_f) == len(flat_r)
    for (path_f, a), (path_r, b) in zip(flat_f, flat_r):
        assert path_f == path_r
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4,
            err_msg=jax.tree_util.keystr(path_f))


def test_fused_shard_map_dp_matches_single_device():
    """The fused path under a DP mesh (shard_map + global-denominator loss
    + psum'd grads) must produce the same step as the single-device fused
    step — this is the multi-chip execution mode of the fused kernels
    (pallas_call cannot be auto-partitioned by the SPMD partitioner)."""
    from nylon_amt_tpu.parallel.mesh import make_mesh, shard_batch
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    cfg = small_config()
    rng = np.random.default_rng(11)
    B = 8
    batch = fake_batch(rng, cfg, B)
    # uneven valid mask: the global-denominator path must still match
    batch["valid"] = jnp.asarray([1, 1, 1, 1, 1, 1, 1, 0], jnp.float32)
    fused_apply = fused_train.make_fused_apply(cfg, interpret=True)

    mesh = make_mesh(n_data=8, n_model=1)
    state_m = create_train_state(cfg, jax.random.key(5), batch_size=B)
    step_m = make_train_step(cfg, mesh=mesh, fused_apply=fused_apply)
    sharded = shard_batch(batch, mesh)
    state_m, metrics_m = step_m(state_m, sharded, jax.random.key(9))

    state_s = create_train_state(cfg, jax.random.key(5), batch_size=B)
    step_s = make_train_step(cfg, fused_apply=fused_apply)
    state_s, metrics_s = step_s(state_s, batch, jax.random.key(9))

    np.testing.assert_allclose(float(metrics_m["loss"]),
                               float(metrics_s["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_m.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_hash_keep_mask_statistics():
    """The in-kernel dropout hash: correct keep rate per seed, and
    independent realizations across seeds (what per-shard ``fold_in``
    streams rely on for DP decorrelation)."""
    from nylon_amt_tpu.ops.attention import hash_keep_mask

    rate = 0.1
    shape = (1, 256, 256)
    n = shape[1] * shape[2]

    def mask(seed):
        return np.asarray(
            hash_keep_mask(jnp.int32(seed), 3, jnp.int32(0), shape, rate)
        ) > 0

    m1, m2 = mask(12345), mask(54321)
    # keep-rate: binomial sigma = sqrt(p(1-p)/n) ~ 0.0012; allow 5 sigma
    for m in (m1, m2):
        assert abs(m.mean() - (1 - rate)) < 0.006, m.mean()
    # cross-seed independence: P(agree) = p^2 + (1-p)^2 = 0.82
    agree = (m1 == m2).mean()
    assert abs(agree - 0.82) < 0.01, agree
    # same seed regenerates the identical mask (fwd/bwd contract)
    assert (mask(12345) == m1).all()


def test_fused_shard_map_dp_dropout():
    """DP shard_map at dropout 0.1 (the production MAESTRO recipe,
    ``EXE-TRAINING-MAESTRO.sh``): per-shard mask streams must be
    DECORRELATED (``train/step.py`` folds ``axis_index`` into the rng, so
    DP deliberately does NOT bit-match single-device under dropout — see
    PARITY.md divergences), and the full fused step must stay finite and
    near the dropout-0 loss."""
    from jax.sharding import PartitionSpec as P

    from nylon_amt_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                             shard_batch)
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    cfg = small_config(dropout=0.1)
    rng = np.random.default_rng(21)
    one = fake_batch(rng, cfg, B=1)
    # identical data on every shard: any per-shard loss difference can
    # only come from the dropout rng stream
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 8, axis=0), one)
    params = init_params(cfg, jax.random.key(7), batch_size=1)
    fused_apply = fused_train.make_fused_apply(cfg, interpret=True)
    mesh = make_mesh(n_data=8, n_model=1)

    def per_shard_loss(p, b, key):
        # mirrors the train-step rng handling (train/step.py)
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return loss_fn(cfg, fused_apply, p, b, key)[0][None]

    losses = jax.shard_map(
        per_shard_loss, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()), out_specs=P(DATA_AXIS),
        check_vma=False)(params, shard_batch(batch, mesh),
                         jax.random.key(13))
    losses = np.asarray(losses, np.float64)
    assert np.isfinite(losses).all()
    # (a) decorrelated masks: identical data, 8 distinct dropout losses
    assert len(np.unique(losses)) == 8, losses
    # (c) every shard's dropout loss stays near the deterministic loss
    loss0 = float(loss_fn(cfg, fused_apply, params, batch)[0])
    assert np.all(np.abs(losses - loss0) / abs(loss0) < 0.5), (losses, loss0)

    # full production step (shard_map + psum + Adam) at dropout 0.1
    state = create_train_state(cfg, jax.random.key(5), batch_size=8)
    step = make_train_step(cfg, mesh=mesh, fused_apply=fused_apply)
    state, metrics = step(state, shard_batch(batch, mesh),
                          jax.random.key(9))
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fused_train_supports_gating():
    assert not fused_train.supports(small_config(enc_alg="cnnblock_safreq"))
    assert not fused_train.supports(small_config(dec_alg="linear_satime"))
    assert not fused_train.supports(small_config(remat=True))
    assert fused_train.supports(small_config(dec_alg="cafreq"))


def test_fused_train_cafreq_single_stage():
    cfg = small_config(dec_alg="cafreq")
    rng = np.random.default_rng(3)
    params = init_params(cfg, jax.random.key(2), batch_size=2)
    model = build_model(cfg)
    batch = fake_batch(rng, cfg)
    fused_apply = fused_train.make_fused_apply(cfg, interpret=True)
    l_flax = loss_fn(cfg, model.apply, params, batch)[0]
    l_fused = loss_fn(cfg, fused_apply, params, batch)[0]
    np.testing.assert_allclose(float(l_fused), float(l_flax), rtol=1e-5)
