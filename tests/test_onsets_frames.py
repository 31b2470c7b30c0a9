"""Tests for the ref_model_spec2midi.py counterparts.

Covers the last reference inventory row (SURVEY.md §2, L5):
``hftt_code/model/ref_model_spec2midi.py`` — the Onsets-and-Frames-style
``SimplifiedTranscriptionModel`` (-> ``models/onsets_frames.py``) and the
rewrite's ``gradient_checkpointing`` flag (-> ``ModelConfig.remat``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import build_model, init_params
from nylon_amt_tpu.models.onsets_frames import init_onsets_frames


def _tiny(remat: bool) -> Config:
    return Config(model=ModelConfig(
        hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1, enc_head=2,
        dec_head=2, dropout=0.1, remat=remat))


class TestOnsetsFrames:
    def test_shapes_and_structure(self):
        config = Config()
        model, variables = init_onsets_frames(config, jax.random.key(0),
                                              batch_size=2)
        spec = jax.random.normal(
            jax.random.key(1),
            (2, config.feature.n_bins, config.window_frames))
        out = model.apply(variables, spec, deterministic=True)
        assert set(out) == {"onset", "frame"}
        assert out["onset"].shape == (2, config.midi.num_note)
        assert out["frame"].shape == (2, config.midi.num_note)
        # The flatten matches the torch stack's post-pool geometry
        # (ref_model_spec2midi.py:57-61): 64 ch x bins/4 x frames/4.
        expect = 64 * (config.feature.n_bins // 4) * (config.window_frames // 4)
        assert (variables["params"]["onset_pred"]["Dense_0"]["kernel"].shape[0]
                == expect)
        # Two INDEPENDENT stacks (ref :12-35): params differ per stack.
        assert "onset_stack" in variables["params"]
        assert "frame_stack" in variables["params"]

    def test_train_mode_grads_and_batch_stats(self):
        config = Config()
        model, variables = init_onsets_frames(config, jax.random.key(0),
                                              batch_size=2)
        spec = jax.random.normal(
            jax.random.key(1),
            (2, config.feature.n_bins, config.window_frames))

        def loss(params, bs):
            out, upd = model.apply(
                {"params": params, "batch_stats": bs}, spec,
                deterministic=False, rngs={"dropout": jax.random.key(2)},
                mutable=["batch_stats"])
            return (jnp.mean(out["onset"] ** 2) + jnp.mean(out["frame"] ** 2),
                    upd["batch_stats"])

        grads, new_bs = jax.jit(jax.grad(loss, has_aux=True))(
            variables["params"], variables["batch_stats"])
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(leaf))
        # BatchNorm running stats must actually move in training mode.
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(new_bs)
        assert any(not np.allclose(b, a) for b, a in zip(before, after))


class TestRemat:
    def test_forward_identical_and_grads_close(self):
        """remat=True must not change the function, only its memory plan
        (ref gradient_checkpointing semantics, ref_model_spec2midi.py:84-91).
        """
        p = init_params(_tiny(False), jax.random.key(0))
        p_r = init_params(_tiny(True), jax.random.key(0))
        # Identical parameter structure: remat is transparent to checkpoints.
        k0 = [k for k, _ in jax.tree_util.tree_leaves_with_path(p)]
        k1 = [k for k, _ in jax.tree_util.tree_leaves_with_path(p_r)]
        assert k0 == k1

        model = build_model(_tiny(False))
        model_r = build_model(_tiny(True))
        spec = jax.random.normal(
            jax.random.key(1),
            (2, _tiny(False).feature.n_bins, _tiny(False).window_frames))

        def loss(m, params):
            out = m.apply({"params": params}, spec, deterministic=True)
            return sum(jnp.mean(v.astype(jnp.float32) ** 2)
                       for k, v in out.items() if k != "attention")

        l0 = jax.jit(lambda q: loss(model, q))(p)
        l1 = jax.jit(lambda q: loss(model_r, q))(p)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)

        g0 = jax.jit(jax.grad(lambda q: loss(model, q)))(p)
        g1 = jax.jit(jax.grad(lambda q: loss(model_r, q)))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            # Recompute reassociation: close, not bit-equal.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_dropout_rng_flows_through_remat(self):
        """Stochastic training through remat: same rng => same grads as the
        un-rematted model (flax lifts the dropout PRNG through the remat)."""
        p = init_params(_tiny(False), jax.random.key(0))
        model = build_model(_tiny(False))
        model_r = build_model(_tiny(True))
        cfg = _tiny(False)
        spec = jax.random.normal(
            jax.random.key(1), (2, cfg.feature.n_bins, cfg.window_frames))
        key = jax.random.key(7)

        def loss(m, params):
            out = m.apply({"params": params}, spec, deterministic=False,
                          rngs={"dropout": key})
            return sum(jnp.mean(v.astype(jnp.float32) ** 2)
                       for k, v in out.items() if k != "attention")

        g0 = jax.jit(jax.grad(lambda q: loss(model, q)))(p)
        g1 = jax.jit(jax.grad(lambda q: loss(model_r, q)))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
