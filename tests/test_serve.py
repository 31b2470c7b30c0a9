"""Multi-stream serving: batched pumps must equal per-stream offline decode."""

import numpy as np
import pytest

import jax

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer.serve import StreamServer
from nylon_amt_tpu.infer.transcribe import Transcriber
from nylon_amt_tpu.models.hft import init_params


@pytest.fixture(scope="module")
def tiny():
    cfg = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                   dec_layer=1, enc_head=2, dec_head=2,
                                   dropout=0.0))
    params = init_params(cfg, jax.random.key(0))
    return cfg, params


def _audio(rng, seconds, sr, f0):
    t = np.arange(int(seconds * sr)) / sr
    wav = 0.2 * np.sin(2 * np.pi * f0 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0)
    return (wav + 0.01 * rng.standard_normal(t.size)).astype(np.float32)


def _offline_notes(tr, wav):
    post = tr.transcript(np.asarray(tr.frontend(wav)))
    return tr.mpe2note(post["onset_B"], post["offset_B"], post["mpe_B"],
                       post["velocity_B"])


def _assert_notes_equal(got, ref):
    got = sorted(sorted(got, key=lambda x: x["pitch"]),
                 key=lambda x: x["onset"])
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g["pitch"] == r["pitch"] and g["velocity"] == r["velocity"]
        assert abs(g["onset"] - r["onset"]) < 1e-9
        assert abs(g["offset"] - r["offset"]) < 1e-9


def test_two_streams_interleaved_match_offline(tiny, rng):
    """Two concurrent streams of different lengths/content, fed interleaved
    and pumped through shared batched forwards, must each reproduce their
    own offline decode — no cross-talk, no loss at close."""
    cfg, params = tiny
    sr = cfg.feature.sr
    tr = Transcriber(cfg, params=params, batch_windows=4)
    wavs = {0: _audio(rng, 7.0, sr, 440.0), 1: _audio(rng, 4.5, sr, 330.0)}

    srv = StreamServer(cfg, transcriber=tr)
    sids = {k: srv.open() for k in wavs}
    collected = {sid: [] for sid in sids.values()}

    chunk = 8000
    pos = {k: 0 for k in wavs}
    done = set()
    while len(done) < len(wavs) or srv.session_ids:
        for k, wav in wavs.items():
            if k in done:
                continue
            srv.feed(sids[k], wav[pos[k] : pos[k] + chunk])
            pos[k] += chunk
            if pos[k] >= wav.shape[0]:
                srv.close(sids[k])
                done.add(k)
        for sid, notes in srv.pump():
            collected[sid].extend(notes)

    for k, wav in wavs.items():
        _assert_notes_equal(collected[sids[k]], _offline_notes(tr, wav))


def test_pump_batches_across_sessions(tiny, rng):
    """One pump with several ready sessions issues exactly one batched
    _run_all call covering all their windows."""
    cfg, params = tiny
    sr = cfg.feature.sr
    tr = Transcriber(cfg, params=params, batch_windows=4)
    srv = StreamServer(cfg, transcriber=tr)
    sids = [srv.open() for _ in range(3)]
    for i, sid in enumerate(sids):
        srv.feed(sid, _audio(rng, 3.0, sr, 300.0 + 50 * i))  # 1 ready block

    calls = []
    orig = tr._run_all
    tr._run_all = lambda w: (calls.append(w.shape[0]), orig(w))[1]
    try:
        srv.pump()
    finally:
        tr._run_all = orig
    assert calls == [3]  # 3 sessions x 1 block in ONE batched forward


def test_closed_session_is_removed_and_others_continue(tiny, rng):
    cfg, params = tiny
    sr = cfg.feature.sr
    tr = Transcriber(cfg, params=params, batch_windows=4)
    srv = StreamServer(cfg, transcriber=tr)
    a, b = srv.open(), srv.open()
    wav_a = _audio(rng, 3.0, sr, 440.0)
    srv.feed(a, wav_a)
    srv.feed(b, _audio(rng, 1.0, sr, 330.0))
    srv.close(a)
    got_a = []
    for sid, notes in srv.pump():
        if sid == a:
            got_a.extend(notes)
    assert a not in srv.session_ids and b in srv.session_ids
    _assert_notes_equal(got_a, _offline_notes(tr, wav_a))
    srv.feed(b, np.zeros(sr, np.float32))  # survivor still accepts audio
    srv.close(b)
    srv.pump()
    assert srv.session_ids == []


def test_pump_featurize_batch_is_bucketed(tiny, rng):
    """The batched featurize must pad the session axis to a power of two —
    an unpadded [S, ...] retraces the jitted featurizer on every distinct
    session count (a full remote recompile in the production environment)."""
    cfg, params = tiny
    sr = cfg.feature.sr
    tr = Transcriber(cfg, params=params, batch_windows=4)
    srv = StreamServer(cfg, transcriber=tr)

    seen = []
    orig = tr.frontend.features_from_sample_blocks

    def spy(segs):
        seen.append(np.asarray(segs).shape[0])
        return orig(segs)

    tr.frontend.features_from_sample_blocks = spy
    try:
        wav = _audio(rng, 4.5, sr, 440.0)
        sids = [srv.open() for _ in range(3)]     # 3 -> must pad to 4
        for i in range(0, wav.shape[0], 8000):
            for sid in sids:
                srv.feed(sid, wav[i : i + 8000])
            srv.pump()
        for sid in sids:
            srv.close(sid)
        srv.pump()
    finally:
        tr.frontend.features_from_sample_blocks = orig
    assert seen, "featurize never ran"
    assert all(s & (s - 1) == 0 for s in seen), f"non-bucketed sizes: {seen}"
    assert 4 in seen                              # the 3-session group padded
