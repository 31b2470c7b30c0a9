"""Streaming transcription: incremental emission must match the offline path.

The offline reference semantics live in ``Transcriber.transcript``
(``amt.py:66-118`` geometry); the streaming path re-derives features,
windows, and posteriors incrementally, so these tests pin the invariant
that makes it correct: feed-in-any-chunking + flush == offline whole-file.
"""

import numpy as np
import pytest

import jax

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer.stream import StreamingTranscriber
from nylon_amt_tpu.infer.transcribe import Transcriber
from nylon_amt_tpu.models.hft import init_params


@pytest.fixture(scope="module")
def tiny():
    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2,
                                   dropout=0.0))
    params = init_params(cfg, jax.random.key(0))
    return cfg, params


def _audio(rng, seconds, sr):
    t = np.arange(int(seconds * sr)) / sr
    wav = 0.2 * np.sin(2 * np.pi * 440.0 * t) * (np.sin(2 * np.pi * 0.7 * t)
                                                 > 0)
    return (wav + 0.01 * rng.standard_normal(t.size)).astype(np.float32)


@pytest.mark.parametrize("chunk", [160, 1000, 4096, 100_000])
def test_streaming_matches_offline(tiny, rng, chunk):
    cfg, params = tiny
    wav = _audio(rng, 5.3, cfg.feature.sr)   # ~332 frames = 3 blocks

    tr = Transcriber(cfg, params=params, batch_windows=2)
    feature = np.asarray(tr.frontend(wav))
    offline = tr.transcript(feature)

    st = StreamingTranscriber(cfg, params=params, transcriber=tr)
    n_blocks_live = 0
    for i in range(0, wav.shape[0], chunk):
        n_blocks_live += len(st.feed(wav[i : i + chunk]))
    st.flush()
    post = st.posteriors()

    assert st.frames_emitted == offline["onset_A"].shape[0]
    assert n_blocks_live >= 1  # some blocks were emitted before flush
    for key, ref in offline.items():
        np.testing.assert_allclose(post[key], ref, atol=2e-5, err_msg=key)

    # note decode wiring: st.notes() decodes the streamed B-head posteriors
    # (posterior parity above is the numerical guarantee; random-init
    # posteriors sit near the 0.5 threshold, so decoding the *offline*
    # arrays could flip on last-ulp diffs)
    ref_notes = tr.mpe2note(post["onset_B"], post["offset_B"],
                            post["mpe_B"], post["velocity_B"])
    assert st.notes() == ref_notes


def test_streaming_features_match_frontend(tiny, rng):
    """Incrementally finalized mel frames equal the whole-file frontend."""
    cfg, params = tiny
    wav = _audio(rng, 2.0, cfg.feature.sr)
    tr = Transcriber(cfg, params=params)
    st = StreamingTranscriber(cfg, params=params, transcriber=tr)
    for i in range(0, wav.shape[0], 3333):
        st.feed(wav[i : i + 3333])
    # before flush: every finalized frame matches the offline frontend
    full = np.asarray(tr.frontend(wav))
    n = st._next_frame
    assert 0 < n < full.shape[0] + 1
    st._featurize_pending()  # featurization is deferred until a block emits
    got = st._feat  # no blocks emitted yet at 2 s -> ring buffer intact
    # Tolerance: the streaming path runs the mel matmul over different frame
    # batch sizes than the whole-file call, so XLA may tile the f32 reduction
    # differently — log-mel rows agree to reduction-order ulps, not bits.
    np.testing.assert_allclose(got, full[st._feat_start : n], atol=3e-4)
    st.flush()
    assert st._next_frame == full.shape[0]


def test_stable_notes_never_retract(tiny, rng):
    """Notes reported stable must appear unchanged in the final decode."""
    cfg, params = tiny
    wav = _audio(rng, 6.0, cfg.feature.sr)
    st = StreamingTranscriber(cfg, params=params)
    stable_seen: list[dict] = []
    for i in range(0, wav.shape[0], 8000):
        if st.feed(wav[i : i + 8000]):
            for n in st.stable_notes():
                if n not in stable_seen:
                    stable_seen.append(n)
    st.flush()
    final = st.notes()
    for n in stable_seen:
        assert n in final


def test_feed_after_flush_raises(tiny):
    cfg, params = tiny
    st = StreamingTranscriber(cfg, params=params)
    st.flush()
    with pytest.raises(RuntimeError):
        st.feed(np.zeros(100, np.float32))


def test_serve_cli_jsonl(tmp_path, rng):
    """`cli serve --wav` emits JSONL note events + a final MIDI."""
    import json

    from nylon_amt_tpu.cli import main
    from nylon_amt_tpu.train.checkpoint import CheckpointManager
    from nylon_amt_tpu.train.step import create_train_state
    from nylon_amt_tpu.utils.wavio import save_wav

    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2,
                                   dropout=0.0))
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    state = create_train_state(cfg, jax.random.key(0))
    CheckpointManager(str(tmp_path / "ckpt")).save(0, 0, state, {},
                                                   is_best=True)
    wav = _audio(rng, 4.0, cfg.feature.sr)
    save_wav(str(tmp_path / "in.wav"), wav[:, None], cfg.feature.sr)

    rc = main(["serve", "--config", str(tmp_path / "config.json"),
               "--checkpoint", str(tmp_path / "ckpt"),
               "--wav", str(tmp_path / "in.wav"),
               "--midi", str(tmp_path / "out.mid")])
    assert rc == 0
    assert (tmp_path / "out.mid").exists()


@pytest.mark.parametrize("seconds", [0.0, 0.05, 2.048])
def test_streaming_edge_lengths(tiny, rng, seconds):
    """Degenerate stream lengths: empty, shorter than one STFT frame, and
    exactly one block of hops — flush must still equal the offline path."""
    cfg, params = tiny
    sr = cfg.feature.sr
    n = int(seconds * sr)
    wav = (0.1 * rng.standard_normal(max(n, 0))).astype(np.float32)

    tr = Transcriber(cfg, params=params, batch_windows=2)
    st = StreamingTranscriber(cfg, params=params, transcriber=tr)
    if n:
        st.feed(wav)
    st.feed(np.zeros(0, np.float32))     # empty feeds are legal no-ops
    st.flush()
    post = st.posteriors()

    # even an empty stream mirrors offline: 1 zero-pad STFT frame -> 1 block
    offline = tr.transcript(np.asarray(tr.frontend(wav)))
    for key, ref in offline.items():
        np.testing.assert_allclose(post[key], ref, atol=2e-5,
                                   err_msg=f"{seconds}s/{key}")


def test_streaming_single_sample_feeds(tiny, rng):
    """Pathological chunking: one sample at a time over a short stream."""
    cfg, params = tiny
    sr = cfg.feature.sr
    wav = (0.1 * rng.standard_normal(int(0.2 * sr))).astype(np.float32)
    tr = Transcriber(cfg, params=params)
    st = StreamingTranscriber(cfg, params=params, transcriber=tr)
    for s in wav:
        st.feed(np.asarray([s]))
    st.flush()
    offline = tr.transcript(np.asarray(tr.frontend(wav)))
    post = st.posteriors()
    for key, ref in offline.items():
        np.testing.assert_allclose(post[key], ref, atol=2e-5, err_msg=key)


def test_pop_stable_notes_matches_offline(tiny, rng):
    """Incremental decode with pruning: the union of per-feed pops plus the
    final pop must equal the offline decode of the whole stream (times to
    float-add rounding), with no duplicates and no retractions."""
    cfg, params = tiny
    wav = _audio(rng, 9.0, cfg.feature.sr)
    tr = Transcriber(cfg, params=params, batch_windows=2)
    st = StreamingTranscriber(cfg, params=params, transcriber=tr)

    popped: list[dict] = []
    for i in range(0, wav.shape[0], 8000):
        if st.feed(wav[i : i + 8000]):
            popped.extend(st.pop_stable_notes())
    st.flush()
    popped.extend(st.pop_stable_notes(final=True))

    offline = tr.transcript(np.asarray(tr.frontend(wav)))
    ref = tr.mpe2note(offline["onset_B"], offline["offset_B"],
                      offline["mpe_B"], offline["velocity_B"])
    got = sorted(sorted(popped, key=lambda x: x["pitch"]),
                 key=lambda x: x["onset"])
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g["pitch"] == r["pitch"] and g["velocity"] == r["velocity"]
        assert abs(g["onset"] - r["onset"]) < 1e-9
        assert abs(g["offset"] - r["offset"]) < 1e-9


def test_pop_stable_notes_prunes_posteriors(tiny, rng):
    """Pruning keeps the retained tail bounded on a long stream."""
    cfg, params = tiny
    sr = cfg.feature.sr
    wav = _audio(rng, 25.0, cfg.feature.sr)   # ~12 blocks
    st = StreamingTranscriber(cfg, params=params)
    max_blocks = 0
    for i in range(0, wav.shape[0], sr):
        if st.feed(wav[i : i + sr]):
            st.pop_stable_notes()
            max_blocks = max(max_blocks, len(st._posteriors))
    # guard (1 block + 8) + margin (1 block) + head partials: <= 4 blocks,
    # unless a note sounds across the whole stream (the fixture's notes are
    # ~0.7 s bursts)
    assert max_blocks <= 4
    assert st._post_start > 0


def test_pop_stable_notes_prunes_dedup_keys(tiny):
    """The emitted-note dedup set must not grow with stream length (an
    endless serving stream would otherwise leak one key per note).

    Uses the deferred-session API to inject synthetic posteriors (one
    clear note per block), so the note stream is deterministic instead of
    depending on a random-init model's threshold crossings."""
    cfg, params = tiny
    st = StreamingTranscriber(cfg, params=params, mode="single", defer=True)
    nf, nn = cfg.input.num_frame, cfg.midi.num_note
    sr, hop = cfg.feature.sr, cfg.feature.hop_sample

    def block_post():
        z = np.zeros((1, nf, nn), np.float32)
        onset, offset, mpe = z.copy(), z.copy(), z.copy()
        vel = np.zeros((1, nf, nn), np.int8)
        onset[0, 10, 40], offset[0, 40, 40] = 0.9, 0.9
        mpe[0, 10:41, 40] = 0.9
        vel[0, 10, 40] = 80
        return {"onset_A": onset, "offset_A": offset, "mpe_A": mpe,
                "velocity_A": vel}

    n_popped, max_keys = 0, 0
    for _ in range(12):
        st.feed(np.zeros(nf * hop, np.float32))
        blocks = st._ready_block_ids(final=False)
        for k in blocks:
            st.accept_posteriors([k], block_post())
        if blocks:
            n_popped += len(st.pop_stable_notes())
            max_keys = max(max_keys, len(st._popped))
    assert n_popped >= 6           # one injected note per emitted block
    assert max_keys < n_popped     # keys for pruned history were dropped
    assert len(st._popped) <= max_keys


def test_pop_stable_notes_a_only_model_under_combination_mode(tiny):
    """A stage-1-only model emits only A heads; pop_stable_notes must pick
    the family from the stored posteriors, not assume B exists because the
    session was opened in combination mode."""
    cfg, params = tiny
    st = StreamingTranscriber(cfg, params=params, mode="combination",
                              defer=True)
    nf, nn = cfg.input.num_frame, cfg.midi.num_note
    hop = cfg.feature.hop_sample

    z = np.zeros((1, nf, nn), np.float32)
    onset, offset, mpe = z.copy(), z.copy(), z.copy()
    vel = np.zeros((1, nf, nn), np.int8)
    onset[0, 10, 50], offset[0, 40, 50] = 0.9, 0.9
    mpe[0, 10:41, 50] = 0.9
    vel[0, 10, 50] = 90
    post = {"onset_A": onset, "offset_A": offset, "mpe_A": mpe,
            "velocity_A": vel}

    popped = []
    for _ in range(4):
        st.feed(np.zeros(nf * hop, np.float32))
        for k in st._ready_block_ids(final=False):
            st.accept_posteriors([k], post)
        popped += st.pop_stable_notes()       # must not KeyError on onset_B
    assert popped and all(n["pitch"] == 50 + cfg.midi.note_min
                          for n in popped)
