"""Input prefetch pipeline semantics."""

import threading
import time

import numpy as np
import pytest

from nylon_amt_tpu.data.prefetch import prefetch


def test_order_and_completeness():
    items = list(range(57))
    got = list(prefetch(iter(items), depth=2))
    assert got == items


def test_transfer_runs_on_worker_thread():
    main_thread = threading.current_thread()
    seen = []

    def transfer(x):
        seen.append(threading.current_thread() is not main_thread)
        return x * 2

    got = list(prefetch(iter([1, 2, 3]), transfer=transfer))
    assert got == [2, 4, 6]
    assert all(seen)


def test_exception_propagates():
    def gen():
        yield 1
        raise RuntimeError("gather failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="gather failed"):
        list(it)


def test_early_close_stops_worker():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.2)
    # The worker stopped early: it produced at most a few queue-depths worth.
    assert len(produced) < 50


def test_runahead_overlaps_consumer():
    """While the consumer sleeps on item i, the worker pre-gathers i+1/i+2."""
    timeline = []

    def gen():
        for i in range(4):
            timeline.append(("produce", i, time.perf_counter()))
            yield i

    it = prefetch(gen(), depth=2)
    first = next(it)
    time.sleep(0.3)  # "device compute"
    t_resume = time.perf_counter()
    rest = list(it)
    assert [first] + rest == [0, 1, 2, 3]
    produced_during_sleep = [e for e in timeline
                             if e[0] == "produce" and e[2] < t_resume]
    # items 0..2 at least were produced while the consumer was busy
    assert len(produced_during_sleep) >= 3


def test_trainer_epoch_uses_prefetch(rng):
    """The Trainer's epoch loop yields identical results through the
    prefetch pipeline (numerical no-op, ordering preserved under a fixed
    shuffle RNG)."""
    import dataclasses

    import jax

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset
    from nylon_amt_tpu.train.loop import Trainer
    from nylon_amt_tpu.train.step import create_train_state

    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2,
                                   dropout=0.0),
                 train=TrainConfig(batch_size=4))
    feat = rng.standard_normal((60, 256)).astype(np.float32)
    lab = {"onset": rng.random((60, 88)).astype(np.float32),
           "offset": rng.random((60, 88)).astype(np.float32),
           "mpe": rng.random((60, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (60, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])
    ds = WindowDataset(arrays, cfg, n_slice=8)

    trainer = Trainer(cfg, "/tmp/prefetch_trainer_test")
    state = create_train_state(cfg, jax.random.key(0))
    s1, loss1 = trainer.train_epoch(state, ds, np.random.default_rng(7),
                                    jax.random.key(1))

    # Manual loop, same shuffle seed, no prefetch.
    state2 = create_train_state(cfg, jax.random.key(0))
    losses = []
    for batch in ds.batches(4, shuffle=True, rng=np.random.default_rng(7),
                            pad_to_batch=True):
        state2, m = trainer.train_step(state2, batch, jax.random.key(1))
        losses.append(float(m["loss"]))
    assert loss1 == pytest.approx(float(np.sum(losses)) / len(losses))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
