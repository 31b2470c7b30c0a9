"""CLI end-to-end tests (reference EXE shells / m_inference.py parity)."""

import json
import os

import numpy as np
import pytest

import jax

from nylon_amt_tpu.cli import main
from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(
        model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1,
                          enc_head=2, dec_head=2, dropout=0.0),
        train=TrainConfig(batch_size=4, epochs=1, n_slice=8),
    )


@pytest.fixture(scope="module")
def workdir(tiny_cfg, tmp_path_factory):
    """Config JSON + synthetic wav/midi fixtures + a saved checkpoint."""
    from nylon_amt_tpu.midi.smf import write_notes
    from nylon_amt_tpu.train.checkpoint import CheckpointManager
    from nylon_amt_tpu.train.step import create_train_state
    from nylon_amt_tpu.utils.wavio import save_wav

    d = tmp_path_factory.mktemp("cli")
    with open(d / "config.json", "w") as f:
        json.dump(tiny_cfg.to_dict(), f)

    sr = tiny_cfg.feature.sr
    t = np.arange(3 * sr) / sr
    rng = np.random.default_rng(0)
    os.makedirs(d / "lists", exist_ok=True)
    for split, names in (("test", ["te0", "te1"]), ("valid", ["va0"]),
                         ("train", ["tr0"])):
        with open(d / "lists" / f"{split}.tsv", "w") as f:
            for n in names:
                wav = (0.3 * np.sin(2 * np.pi * 262 * t)
                       + 0.01 * rng.standard_normal(t.size))
                save_wav(str(d / f"{n}.wav"), wav[:, None].astype(np.float32),
                         sr)
                write_notes(str(d / f"{n}.mid"),
                            [{"onset": 0.1, "offset": 1.0, "pitch": 60,
                              "velocity": 80}])
                f.write(f"{n}\t{d / (n + '.wav')}\t{d / (n + '.mid')}\n")

    state = create_train_state(tiny_cfg, jax.random.key(0))
    mgr = CheckpointManager(str(d / "ckpt"))
    mgr.save(0, 0, state, {"note": "cli fixture"}, is_best=True)
    return d


def test_transcribe_combination_writes_both_families(workdir):
    """Combination mode must emit _1st (A heads) and _2nd (B heads) note
    JSONs per file, like m_inference.py:142-165."""
    out = workdir / "out_comb"
    rc = main(["transcribe", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt"),
               "--wav", str(workdir / "te0.wav"), "--out", str(out),
               "--tab", "--sheet"])
    assert rc == 0
    assert (out / "te0_1st.notes.json").exists()
    assert (out / "te0_2nd.notes.json").exists()
    assert (out / "te0.mid").exists()
    assert (out / "te0.alphatex").exists()
    assert (out / "te0.musicxml").exists()
    # The primary JSON mirrors the 2nd (B-head) decode in combination mode.
    with open(out / "te0.notes.json") as f:
        primary = json.load(f)
    with open(out / "te0_2nd.notes.json") as f:
        second = json.load(f)
    assert primary == second


def test_transcribe_single_mode_writes_first_only(workdir):
    out = workdir / "out_single"
    rc = main(["transcribe", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt"), "--mode", "single",
               "--wav", str(workdir / "te0.wav"), "--out", str(out)])
    assert rc == 0
    assert (out / "te0_1st.notes.json").exists()
    assert not (out / "te0_2nd.notes.json").exists()


def test_transcribe_batch_list_mode(workdir):
    """--list iterates every file of the split (EXE-EVALUATION flow)."""
    out = workdir / "out_batch"
    rc = main(["transcribe", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt"),
               "--list", str(workdir / "lists"), "--split", "test",
               "--out", str(out)])
    assert rc == 0
    for stem in ("te0", "te1"):
        assert (out / f"{stem}_1st.notes.json").exists()
        assert (out / f"{stem}_2nd.notes.json").exists()


def test_transcribe_requires_input(workdir):
    rc = main(["transcribe", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt")])
    assert rc == 2


def test_corpus_refs_writes_mir_eval_txts(workdir, tmp_path):
    """--refs emits the conv_note2ref.py reference txts for valid/test
    (EXE-CORPUS-MAESTRO.sh:43-45), and none for train."""
    corpus = tmp_path / "corpus_refs"
    rc = main(["corpus", "--config", str(workdir / "config.json"),
               "--lists", str(workdir / "lists"), "--out", str(corpus),
               "--refs"])
    assert rc == 0
    ref = corpus / "ref"
    for stem in ("te0", "te1", "va0"):
        for suffix in (".txt", "_velocity.txt", "_mpe_16ms.txt",
                       "_mpe_10ms.txt"):
            assert (ref / f"{stem}{suffix}").exists(), f"{stem}{suffix}"
    assert not (ref / "tr0.txt").exists()
    # interval file: onset \t offset \t pitch-Hz (one 60=C4 note at 0.1-1.0)
    rows = np.loadtxt(ref / "te0.txt").reshape(-1, 3)
    assert rows.shape[0] == 1
    assert np.allclose(rows[0], [0.1, 1.0, 261.625565], atol=1e-4)


def test_train_valid_test_records_test_loss(workdir, tmp_path):
    """--valid-test appends the test-split loss each (epoch, div)
    (reference m_training_ablation.py -valid_test)."""
    corpus = tmp_path / "corpus"
    rc = main(["corpus", "--config", str(workdir / "config.json"),
               "--lists", str(workdir / "lists"), "--out", str(corpus)])
    assert rc == 0
    run = tmp_path / "run"
    rc = main(["train", "--config", str(workdir / "config.json"),
               "--dataset", str(corpus), "--out", str(run),
               "--valid-test", "--epochs", "1"])
    assert rc == 0
    with open(run / "performance.json") as f:
        perf = json.load(f)
    assert len(perf["loss_test"]) == len(perf["loss_train"]) == 1
    assert np.isfinite(perf["loss_test"][0])


def test_train_init_from_warm_starts(workdir, tmp_path):
    """--init-from fine-tunes from a checkpoint's params (fresh optimizer),
    and rejects a checkpoint whose architecture mismatches the config."""
    from nylon_amt_tpu.train.checkpoint import load_params

    corpus = tmp_path / "corpus"
    rc = main(["corpus", "--config", str(workdir / "config.json"),
               "--lists", str(workdir / "lists"), "--out", str(corpus)])
    assert rc == 0
    run = tmp_path / "ft"
    rc = main(["train", "--config", str(workdir / "config.json"),
               "--dataset", str(corpus), "--out", str(run),
               "--init-from", str(workdir / "ckpt"), "--epochs", "1"])
    assert rc == 0
    # the fine-tune trained: its params moved away from the init params
    init = load_params(str(workdir / "ckpt"))
    tuned = load_params(str(run / "checkpoints"))
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        init, tuned)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0

    # architecture mismatch -> clear error, not a shape crash mid-train
    import dataclasses

    cfg = Config.from_dict(json.load(open(workdir / "config.json")))
    big = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, hid_dim=cfg.model.hid_dim
                                       * 2))
    with open(tmp_path / "big.json", "w") as f:
        json.dump(big.to_dict(), f)
    with pytest.raises(SystemExit, match="does not match"):
        main(["train", "--config", str(tmp_path / "big.json"),
              "--dataset", str(corpus), "--out", str(tmp_path / "ft2"),
              "--init-from", str(workdir / "ckpt"), "--epochs", "1"])


def test_evaluate_batch_list_mode(workdir, tmp_path):
    """evaluate --list scores every split file against transcribe --list
    outputs (the EXE-EVALUATION-MAESTRO.sh loop) with per-file + mean."""
    out = workdir / "out_eval_batch"
    rc = main(["transcribe", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt"),
               "--list", str(workdir / "lists"), "--split", "test",
               "--out", str(out)])
    assert rc == 0
    result_path = tmp_path / "scores.json"
    rc = main(["evaluate", "--config", str(workdir / "config.json"),
               "--list", str(workdir / "lists"), "--split", "test",
               "--est-dir", str(out), "--out", str(result_path)])
    assert rc == 0
    scores = json.load(open(result_path))
    assert set(scores["note"]["per_file"]) == {"te0.notes.json",
                                               "te1.notes.json"}
    for fam in ("note", "frame"):
        assert np.isfinite(scores[fam]["mean"]["F-measure"])

    # no input at all -> usage error, matching transcribe
    assert main(["evaluate", "--config",
                 str(workdir / "config.json")]) == 2


def test_export_then_transcribe_matches(workdir, tmp_path):
    """cli export writes a reference-format .dat that the transcribe path
    (torch importer) loads back to identical notes."""
    dat = tmp_path / "model.dat"
    rc = main(["export", "--config", str(workdir / "config.json"),
               "--checkpoint", str(workdir / "ckpt"), "--out", str(dat)])
    assert rc == 0

    out_a, out_b = tmp_path / "from_orbax", tmp_path / "from_dat"
    for ckpt, out in ((workdir / "ckpt", out_a), (dat, out_b)):
        rc = main(["transcribe", "--config", str(workdir / "config.json"),
                   "--checkpoint", str(ckpt),
                   "--wav", str(workdir / "te0.wav"), "--out", str(out)])
        assert rc == 0
    a = json.load(open(out_a / "te0.notes.json"))
    b = json.load(open(out_b / "te0.notes.json"))
    assert a == b


def test_train_trace_writes_profile(workdir, tmp_path):
    """--trace captures a JAX profiler trace of the run."""
    corpus = tmp_path / "corpus"
    rc = main(["corpus", "--config", str(workdir / "config.json"),
               "--lists", str(workdir / "lists"), "--out", str(corpus)])
    assert rc == 0
    trace_dir = tmp_path / "trace"
    rc = main(["train", "--config", str(workdir / "config.json"),
               "--dataset", str(corpus), "--out", str(tmp_path / "run_tr"),
               "--epochs", "1", "--trace", str(trace_dir)])
    assert rc == 0
    found = [p for p in trace_dir.rglob("*") if p.is_file()]
    assert found, "no trace artifacts written"


def test_tab_head_is_opt_in(workdir, tmp_path, monkeypatch):
    """Default --tab export uses the lowest-fret heuristic; the learned
    string head (which has not beaten the heuristic on the guitar proof
    corpus — docs/guitar_run.log) engages only with --tab-head."""
    from nylon_amt_tpu.infer import tab as tab_mod
    from nylon_amt_tpu.train.checkpoint import CheckpointManager
    from nylon_amt_tpu.train.step import create_train_state

    cfg = Config(
        model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1, dec_layer=1,
                          enc_head=2, dec_head=2, dropout=0.0,
                          tab_head=True),
        train=TrainConfig(batch_size=4, epochs=1, n_slice=8),
    )
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    state = create_train_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, 0, state, {"note": "tab fixture"}, is_best=True)

    calls = []
    real = tab_mod.annotate_strings
    monkeypatch.setattr(
        tab_mod, "annotate_strings",
        lambda *a, **k: calls.append(1) or real(*a, **k))

    common = ["transcribe", "--config", str(tmp_path / "config.json"),
              "--checkpoint", str(tmp_path / "ckpt"),
              "--wav", str(workdir / "te0.wav"), "--tab"]
    rc = main(common + ["--out", str(tmp_path / "out_default")])
    assert rc == 0
    assert not calls, "default --tab must not consult the learned head"
    assert (tmp_path / "out_default" / "te0.alphatex").exists()

    rc = main(common + ["--tab-head", "--out", str(tmp_path / "out_head")])
    assert rc == 0
    assert calls, "--tab-head must route through annotate_strings"
    assert (tmp_path / "out_head" / "te0.alphatex").exists()
