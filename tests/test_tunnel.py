"""Transfer-journal reset (utils/tunnel.py): the evacuate -> reset ->
restore fence that bounds host RSS on journaling tunnel backends.

On the CPU test mesh there is no tunnel, so the reset callable is faked;
what these tests pin is the part that must be correct everywhere: the
carried pytree is value-identical, shardings and typed PRNG keys survive,
and a Trainer run with the fence enabled matches one without it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nylon_amt_tpu.utils.tunnel as tunnel
from nylon_amt_tpu.utils.tunnel import reset_transfer_journal


@pytest.fixture
def fake_reset(monkeypatch):
    calls = []

    def fn():
        calls.append(1)
        return None

    monkeypatch.setattr(tunnel, "_PROBED", True)
    monkeypatch.setattr(tunnel, "_RESET_FN", fn)
    return calls


def test_identity_without_tunnel(monkeypatch):
    monkeypatch.setattr(tunnel, "_PROBED", True)
    monkeypatch.setattr(tunnel, "_RESET_FN", None)
    x = jnp.arange(4.0)
    tree = {"a": x, "b": 3, "c": "s"}
    out = reset_transfer_journal(tree)
    assert out["a"] is x and out["b"] == 3 and out["c"] == "s"


def test_round_trip_values_and_keys(fake_reset):
    key = jax.random.key(7)
    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "i": jnp.array([1, 2], jnp.int32),
        "key": key,
        "host": np.ones(3),
        "n": 5,
    }
    before = jax.random.uniform(key, (2,))
    out = reset_transfer_journal(tree, force=True)
    assert fake_reset, "fake reset was not invoked"
    np.testing.assert_array_equal(out["w"], tree["w"])
    np.testing.assert_array_equal(out["i"], tree["i"])
    assert out["n"] == 5
    np.testing.assert_array_equal(out["host"], tree["host"])
    # the restored key must continue the SAME stream
    np.testing.assert_array_equal(jax.random.uniform(out["key"], (2,)),
                                  before)


def test_sharding_preserved(fake_reset):
    from jax.sharding import NamedSharding, PartitionSpec

    from nylon_amt_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    sh = NamedSharding(mesh, PartitionSpec("data"))
    x = jax.device_put(jnp.arange(16.0), sh)
    out = reset_transfer_journal({"x": x}, force=True)
    assert out["x"].sharding == sh
    np.testing.assert_array_equal(out["x"], x)


def test_streaming_fence_is_output_neutral(fake_reset):
    """StreamingTranscriber with the journal fence firing every block emits
    byte-identical posteriors to an unfenced session."""
    from nylon_amt_tpu.config import Config, ModelConfig
    from nylon_amt_tpu.infer.stream import StreamingTranscriber
    from nylon_amt_tpu.models.hft import init_params

    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2,
                                   dropout=0.0))
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(int(5.3 * cfg.feature.sr))
           ).astype(np.float32)

    def run(reset_blocks):
        st = StreamingTranscriber(cfg, params=params, batch_windows=2,
                                  journal_reset_blocks=reset_blocks)
        blocks = []
        for i in range(0, wav.shape[0], 4096):
            blocks.extend(st.feed(wav[i : i + 4096]))
        blocks.extend(st.flush())
        return blocks

    b_off = run(None)
    n_before = len(fake_reset)
    b_on = run(1)
    assert len(fake_reset) > n_before  # the fence actually fired
    assert len(b_off) == len(b_on) >= 2
    for x, y in zip(b_off, b_on):
        assert set(x) == set(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_trainer_fence_is_trajectory_neutral(tmp_path, monkeypatch):
    """fit() with the journal fence firing every div == fit() without it.

    The fence fires through loop.py's `journal_reset_supported()` gate, so
    this also covers the integration point, not just the utility.
    """
    from tests.test_train import fake_batch, tiny_config  # noqa: F401
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    cfg = tiny_config(batch_size=4, epochs=2)
    feat = rng.standard_normal((60, 256)).astype(np.float32)
    lab = {"onset": rng.random((60, 88)).astype(np.float32),
           "offset": rng.random((60, 88)).astype(np.float32),
           "mpe": rng.random((60, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (60, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])

    def provider(split, div):
        return WindowDataset(arrays, cfg, n_slice=8)

    def run(subdir, enable):
        calls = []
        monkeypatch.setattr(tunnel, "_PROBED", True)
        monkeypatch.setattr(tunnel, "_RESET_FN",
                            (lambda: calls.append(1)) if enable else None)
        trainer = Trainer(cfg, str(tmp_path / subdir))
        final = trainer.fit(provider)
        return (jax.device_get(final.params),
                trainer.performance["loss_train"],
                trainer.performance["loss_valid"], calls)

    p0, lt0, lv0, c0 = run("off", enable=False)
    p1, lt1, lv1, c1 = run("on", enable=True)
    assert not c0 and len(c1) == 2  # fired once per (epoch, div)
    assert lt0 == lt1 and lv0 == lv1
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
