"""Multi-host DP: 2 real processes x 4 virtual CPU devices vs one process
with 8 devices — full Trainer.fit parity (losses + final params).

This exercises the exact v5e-16 code path: jax.distributed initialization,
per-process batch slicing in WindowDataset, global-array assembly via
make_array_from_process_local_data, cross-process gradient reduction, and
orbax multi-process checkpointing into a shared directory.
"""

import numpy as np
import pytest

from nylon_amt_tpu.parallel.mh_check import run_comparison


def test_two_process_fit_matches_single_process(tmp_path):
    result = run_comparison(str(tmp_path), n_processes=2, local_devices=4,
                            epochs=2)
    assert result["multi"]["n_processes"] == 2
    assert result["multi"]["n_global_devices"] == 8
    np.testing.assert_allclose(result["multi"]["loss_train"],
                               result["ref"]["loss_train"], rtol=1e-5)


def test_local_batch_slicing(rng):
    """Each process's batches() slice reassembles to the single-process
    global batch, row for row."""
    from nylon_amt_tpu.config import Config, TrainConfig
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset

    cfg = Config(train=TrainConfig(batch_size=8))
    feat = rng.standard_normal((70, 256)).astype(np.float32)
    lab = {"onset": rng.random((70, 88)).astype(np.float32),
           "offset": rng.random((70, 88)).astype(np.float32),
           "mpe": rng.random((70, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (70, 88)).astype(np.int8)}
    arrays = assemble_split(cfg, [feat], [lab])
    ds = WindowDataset(arrays, cfg, n_slice=2)

    global_batches = list(ds.batches(8, shuffle=True,
                                     rng=np.random.default_rng(3),
                                     pad_to_batch=True))
    locals_per_pid = [
        list(ds.batches(8, shuffle=True, rng=np.random.default_rng(3),
                        pad_to_batch=True, process_index=pid,
                        process_count=2))
        for pid in range(2)
    ]
    assert len(locals_per_pid[0]) == len(global_batches)
    for i, gb in enumerate(global_batches):
        for key in gb:
            reassembled = np.concatenate(
                [locals_per_pid[0][i][key], locals_per_pid[1][i][key]])
            np.testing.assert_array_equal(reassembled, gb[key])


def test_batch_size_must_divide():
    from nylon_amt_tpu.config import Config, TrainConfig
    from nylon_amt_tpu.data.corpus import assemble_split
    from nylon_amt_tpu.data.windows import WindowDataset

    rng = np.random.default_rng(0)
    cfg = Config(train=TrainConfig(batch_size=6))
    feat = rng.standard_normal((70, 256)).astype(np.float32)
    lab = {"onset": rng.random((70, 88)).astype(np.float32),
           "offset": rng.random((70, 88)).astype(np.float32),
           "mpe": rng.random((70, 88)) > 0.7,
           "velocity": rng.integers(0, 127, (70, 88)).astype(np.int8)}
    ds = WindowDataset(assemble_split(cfg, [feat], [lab]), cfg)
    with pytest.raises(ValueError, match="divide"):
        next(ds.batches(7, process_count=2))
