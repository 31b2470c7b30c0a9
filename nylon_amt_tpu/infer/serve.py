"""Multi-stream serving: batch many live sessions through one forward.

One v5e chip transcribes ~19x real time at batch-1 block latency
(PERF.md), so a serving process should multiplex many concurrent audio
streams. This scheduler does the minimum that makes that efficient:

* each stream is a deferred :class:`~nylon_amt_tpu.infer.stream.
  StreamingTranscriber` (``defer=True``) — feeds only advance ring
  buffers, never touch the device;
* :meth:`StreamServer.pump` collects every session's ready windows,
  concatenates them into batched forwards through the shared
  :class:`~nylon_amt_tpu.infer.transcribe.Transcriber` (fixed
  ``batch_windows`` shape => ``ceil(total/max_batch)`` forwards per pump,
  ONE in steady state), and routes the posterior rows back to their
  sessions;
* per-session results then flow through the session's own incremental
  decode (``pop_stable_notes``), so memory stays bounded per stream.

The reference has no serving path at all (SURVEY §0); this module is the
TPU-native answer to "production deployment and serving": device work is
batched (MXU-friendly), device interactions per pump scale with the total
window backlog — not the session count — and sessions are isolated (a
closed/flushed stream never blocks the others).

Typical loop (socket server, audio mixer, ...)::

    srv = StreamServer(config, params=params, max_batch=16)
    sid = srv.open()
    srv.feed(sid, chunk)          # any chunk sizes, any interleaving
    for sid, notes in srv.pump(): # one batched forward for ALL sessions
        emit(sid, notes)
    srv.close(sid)                # flush tail -> final notes
"""

from __future__ import annotations

from typing import Any

import numpy as np

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.infer.stream import StreamingTranscriber
from nylon_amt_tpu.infer.transcribe import Transcriber


class StreamServer:
    """Batching scheduler over many :class:`StreamingTranscriber` sessions.

    All sessions share one :class:`Transcriber` (one jitted forward, one
    compiled batch shape). ``max_batch`` is the per-forward window budget;
    a pump with more ready windows than that runs them immediately as
    several fixed-shape sub-batches (nothing is deferred to later pumps).
    """

    def __init__(self, config: Config, params: Any = None,
                 transcriber: Transcriber | None = None, max_batch: int = 8,
                 mode: str = "combination",
                 journal_reset_pumps: int | None = 128, **tr_kwargs):
        self.config = config
        self.mode = mode
        self.tr = transcriber or Transcriber(config, params=params,
                                             batch_windows=max_batch,
                                             **tr_kwargs)
        self._sessions: dict[int, StreamingTranscriber] = {}
        self._closing: set[int] = set()
        self._next_sid = 0
        # Tunnel hygiene: the journaling tunnel retains every uploaded audio
        # segment (~MBs/pump for a full fleet), so an endless serving
        # process grows RSS without bound. Between pumps all session state
        # is host-side; every N pumps the shared transcriber's device state
        # is carried across a journal reset. No-op off-tunnel.
        self.journal_reset_pumps = journal_reset_pumps
        self._pumps = 0

    # -- session lifecycle -----------------------------------------------------

    def open(self) -> int:
        """Register a new stream; returns its session id."""
        sid = self._next_sid
        self._next_sid += 1
        self._sessions[sid] = StreamingTranscriber(
            self.config, transcriber=self.tr, mode=self.mode, defer=True)
        return sid

    def feed(self, sid: int, samples: np.ndarray) -> None:
        """Append audio to a session (host-only; no device work)."""
        self._sessions[sid].feed(samples)

    def close(self, sid: int) -> None:
        """Mark end-of-stream: the tail is finalized on the next pump(s),
        after which the session is dropped."""
        self._sessions[sid].flush()
        self._closing.add(sid)

    @property
    def session_ids(self) -> list[int]:
        return list(self._sessions)

    def session(self, sid: int) -> StreamingTranscriber:
        return self._sessions[sid]

    # -- the batched step ------------------------------------------------------

    def pump(self, **decode_kwargs) -> list[tuple[int, list[dict]]]:
        """Batch every session's ready blocks through the shared forward
        (one sub-batch per ``max_batch`` windows) and return
        ``(sid, newly_stable_notes)`` for each session that produced any.
        Closed sessions emit their final notes and are removed."""
        # sessions with emittable blocks this pump
        ready = [(sid, st, st._ready_block_ids(final=sid in self._closing))
                 for sid, st in self._sessions.items()]
        ready = [(sid, st, blocks) for sid, st, blocks in ready if blocks]

        # batch their pending featurization into one device call per
        # distinct bucketed segment length — in steady state all sessions
        # pend the same 128-frame block, so that is ONE call for the whole
        # fleet, uploading raw samples (device-side framing; ~8x less
        # transfer than explicit frames)
        groups: dict[int, list] = {}
        for _, st, _ in ready:
            seg, n = st._take_pending()
            if n:
                seg, k = st.bucket_segment(seg, n)
                groups.setdefault(k, []).append((st, seg, n))
        for items in groups.values():
            segs = np.stack([seg for _, seg, _ in items])
            # Bucket the batch axis to powers of two: the featurizer is
            # jitted, and sessions join/leave/pend at different rates, so an
            # unpadded [S, ...] would retrace (= full remote recompile in
            # this environment) on every distinct session count.
            s = segs.shape[0]
            s_pad = 1 << (s - 1).bit_length()
            if s_pad > s:
                segs = np.concatenate(
                    [segs, np.zeros((s_pad - s,) + segs.shape[1:],
                                    segs.dtype)])
            feats = np.asarray(
                self.tr.frontend.features_from_sample_blocks(segs))
            for (st, _, n), f in zip(items, feats):
                st._accept_features(f[:n])

        jobs: list[tuple[int, list[int], np.ndarray]] = []
        for sid, st, _ in ready:
            blocks, windows = st.ready_windows(final=sid in self._closing)
            if blocks:
                jobs.append((sid, blocks, windows))

        touched = set()
        if jobs:
            batched = np.concatenate([w for _, _, w in jobs])
            post = self.tr._run_all(batched)
            row = 0
            for sid, blocks, w in jobs:
                n = w.shape[0]
                self._sessions[sid].accept_posteriors(
                    blocks, {k: v[row : row + n] for k, v in post.items()})
                row += n
                touched.add(sid)

        out = []
        for sid in list(self._sessions):
            final = sid in self._closing
            # decode only sessions whose posteriors changed this pump — the
            # tail decode is the per-pump host cost, and an untouched
            # session cannot have new stable notes
            if sid in touched or final:
                notes = self._sessions[sid].pop_stable_notes(
                    final=final, **decode_kwargs)
                if notes:
                    out.append((sid, notes))
            if final:
                del self._sessions[sid]
                self._closing.discard(sid)

        self._pumps += 1
        jr = self.journal_reset_pumps
        if jr and self._pumps % jr == 0:
            self.tr.reset_transfer_journal()
        return out
