"""Online (streaming) transcription with bounded latency.

The reference has no serving path at all — its inference is the offline
batch loop of ``evaluation/m_inference.py`` over whole files. This module
adds a production serving capability on top of the same model + decoder:
audio arrives in arbitrary-size chunks (a socket, a sound card, a pipe) and
posterior blocks / note events are emitted as soon as they are final.

Design — everything is incremental but **numerically equal to the offline
path** (``Transcriber.transcript``, to reduction-order ulps), which is what
makes it testable:

* **Features.** STFT frame ``i`` covers samples ``[i*hop - n_fft/2,
  i*hop + n_fft/2)`` (center padding, ``amt.py:55-63`` semantics). A frame
  is *final* once ``i*hop + n_fft/2`` samples have arrived; finalized
  frames are cut from the sample ring buffer on the host and batched
  through ``MelFrontend.features_from_frames`` in ONE device call per
  emitted block (each device interaction costs a tunnel round trip, so
  per-feed featurization would bound the serving rate) — the same per-row
  computation as offline (equal up to f32 matmul reduction-order ulps,
  since the frame batch sizes differ).
* **Posteriors.** The model consumes 192-frame windows = a 128-frame block
  plus ``margin_b`` past and ``margin_f`` future context
  (``amt.py:70-96``). Block ``k`` is final once feature frame
  ``128(k+1) + margin_f`` exists, so the algorithmic latency is
  ``num_frame + margin_f`` frames (160 frames = 2.56 s at the reference
  geometry) plus the ``n_fft/2`` sample lookahead of the STFT (64 ms).
* **Notes.** ``notes()`` decodes the posteriors accumulated so far (the
  decoder is causal in the sense that a note is determined once its offset
  and the following onset-free gap are seen); notes ending more than
  ``guard`` frames before the stream head are stable and never change on
  future feeds — callers can emit them immediately.
* **flush()** reproduces the offline tail padding (zero samples for the
  STFT, ``min_value`` feature rows + ``margin_f`` for the model), after
  which the concatenated posteriors equal ``transcript()`` of the whole
  recording.

Only ``pad_mode="constant"`` is supported (the reference config's value):
reflect padding would make early/late frames depend on future samples.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.infer.transcribe import Transcriber

_POST_KEYS = ("onset", "offset", "mpe", "velocity")


class StreamingTranscriber:
    """Incremental audio -> posterior-block -> note-event pipeline.

    Wraps a :class:`Transcriber` (or builds one from ``config``/``params``)
    and maintains sample/feature ring buffers. Typical loop::

        st = StreamingTranscriber(config, params=params)
        for chunk in audio_source:          # any chunk sizes
            blocks = st.feed(chunk)         # 0+ finalized posterior blocks
        st.flush()
        notes = st.notes()                  # == offline decode
    """

    def __init__(self, config: Config, params: Any = None,
                 transcriber: Transcriber | None = None, mode: str =
                 "combination", defer: bool = False,
                 journal_reset_blocks: int | None = 512, **tr_kwargs):
        if config.feature.pad_mode != "constant":
            raise ValueError("streaming requires pad_mode='constant' "
                             f"(got {config.feature.pad_mode!r})")
        self.config = config
        self.mode = mode
        # defer=True: feed()/flush() never run the model — an external
        # scheduler (infer.serve.StreamServer) pulls ready_windows() and
        # pushes accept_posteriors(), batching many sessions per forward
        self._defer = defer
        self.tr = transcriber or Transcriber(config, params=params,
                                             **tr_kwargs)
        self.journal_reset_blocks = journal_reset_blocks
        self._blocks_since_reset = 0
        cfg = config
        self._hop = cfg.feature.hop_sample
        self._n_fft = cfg.feature.fft_bins
        self._pad = self._n_fft // 2
        self._n_frame = cfg.input.num_frame
        self._margin_b = cfg.input.margin_b
        self._margin_f = cfg.input.margin_f
        self._n_bins = cfg.feature.n_bins
        self._min_value = np.float32(cfg.input.min_value)

        # sample ring buffer: buf[0] is global sample index `buf_start`
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0
        self._n_samples = 0            # total samples fed
        self._next_frame = 0           # next feature frame to finalize
        # feature ring buffer: rows [feat_start, feat_start + len(feat))
        self._feat = np.zeros((0, self._n_bins), np.float32)
        self._feat_start = 0
        # frames [_featurized_until, _next_frame) are finalized but not yet
        # featurized: the device call is deferred until a posterior block is
        # actually emittable (a feed that completes no block costs zero
        # device round trips), and the upload is the RAW SAMPLE segment —
        # framing happens on device, so the transfer is ~8x smaller than
        # explicit [n, n_fft] frames at the reference hop
        self._featurized_until = 0
        self._next_block = 0           # next posterior block to emit
        self._posteriors: list[dict[str, np.ndarray]] = []
        self._flushed = False
        # incremental-decode state (pop_stable_notes): global frame index of
        # the first retained posterior block, and keys already returned
        self._post_start = 0
        self._popped: set[tuple] = set()
        # one-dispatch block step (lazily jitted): featurize + window
        # assembly + forward fused into ONE device computation, so the
        # steady-state single-stream block costs one tunnel round trip
        # instead of two (featurize fetch + forward fetch)
        self._fused_step = None

    # -- properties -----------------------------------------------------------

    @property
    def latency_seconds(self) -> float:
        """Algorithmic emit latency: block + future margin + STFT lookahead."""
        fps = self.config.feature.frames_per_sec
        return (self._n_frame + self._margin_f) / fps + \
            self._pad / self.config.feature.sr

    @property
    def frames_emitted(self) -> int:
        return self._next_block * self._n_frame

    # -- feeding --------------------------------------------------------------

    def feed(self, samples: np.ndarray) -> list[dict[str, np.ndarray]]:
        """Append audio samples; return any posterior blocks finalized by
        them (each ``{onset_A, ...: [num_frame, num_note]}``)."""
        if self._flushed:
            raise RuntimeError("feed() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._n_samples += samples.shape[0]
        self._advance_frames(last_frame=(self._n_samples - self._pad)
                             // self._hop)
        if self._defer:
            return []
        return self._emit_ready_blocks(final=False)

    def flush(self) -> list[dict[str, np.ndarray]]:
        """End of stream: finalize tail frames (zero right pad) and emit the
        remaining blocks with offline tail padding. Idempotent."""
        if self._flushed:
            return []
        self._flushed = True
        # offline frame count: 1 + n_samples // hop (mel.py num_frames);
        # the tail's zero right-padding happens in _take_pending when
        # hi > n_samples.
        self._advance_frames(last_frame=self._n_samples // self._hop)
        if self._defer:
            return []
        return self._emit_ready_blocks(final=True)

    def _advance_frames(self, last_frame: int) -> None:
        """Finalize feature frames up to ``last_frame`` (bookkeeping only;
        the samples stay in the ring buffer until featurization)."""
        if last_frame >= self._next_frame:
            self._next_frame = last_frame + 1

    # -- windows --------------------------------------------------------------

    def _take_pending(self) -> tuple[np.ndarray, int]:
        """Cut the raw-sample segment covering every finalized-but-
        unfeaturized frame (stream edges zero-padded) and hand it to a
        featurizer — this instance's own, or a StreamServer that batches
        many sessions into ONE device call. Returns ``(segment, n_frames)``;
        the mel rows come back via :meth:`_accept_features`."""
        f0, f1 = self._featurized_until, self._next_frame
        n = f1 - f0
        if n <= 0:
            return np.zeros(0, np.float32), 0
        lo = f0 * self._hop - self._pad                 # global sample range
        hi = (f1 - 1) * self._hop - self._pad + self._n_fft
        seg_lo, seg_hi = max(lo, 0), min(hi, self._n_samples)
        seg = self._buf[seg_lo - self._buf_start : seg_hi - self._buf_start]
        if lo < 0 or hi > self._n_samples:              # stream edges: zeros
            seg = np.pad(seg, (seg_lo - lo, hi - seg_hi))
        self._featurized_until = f1
        # drop samples no longer needed by any future frame
        keep_from = f1 * self._hop - self._pad
        if keep_from > self._buf_start:
            self._buf = self._buf[max(keep_from - self._buf_start, 0):]
            self._buf_start = max(keep_from, self._buf_start)
        return seg.astype(np.float32, copy=False), n

    def bucket_segment(self, seg: np.ndarray, n: int
                       ) -> tuple[np.ndarray, int]:
        """Zero-pad a segment so its frame count is a multiple of
        ``num_frame`` — the jitted mel computation then sees a handful of
        static shapes instead of retracing (and re-compiling, minutes
        through a remote-compile service) per distinct chunk arithmetic."""
        k = -(-n // self._n_frame) * self._n_frame
        target = (k - 1) * self._hop + self._n_fft
        if seg.shape[0] < target:
            seg = np.pad(seg, (0, target - seg.shape[0]))
        return seg, k

    def _accept_features(self, feats: np.ndarray) -> None:
        if feats.shape[0]:
            self._feat = np.concatenate([self._feat, feats])

    def _featurize_pending(self) -> None:
        """One device call for every finalized-but-unfeaturized frame."""
        seg, n = self._take_pending()
        if not n:
            return
        seg, _ = self.bucket_segment(seg, n)
        feats = np.asarray(
            self.tr.frontend.features_from_sample_blocks(seg[None])[0])[:n]
        self._accept_features(feats)

    def _ready_block_ids(self, final: bool) -> list[int]:
        """Blocks whose future margin is available (all remaining when
        ``final``)."""
        if final:
            # offline block count: ceil(T / num_frame) (amt.py:70-74)
            n_blocks = -(-self._next_frame // self._n_frame)
            return list(range(self._next_block, n_blocks))
        blocks = []
        k = self._next_block
        while self._next_frame >= (k + 1) * self._n_frame + self._margin_f:
            blocks.append(k)
            k += 1
        return blocks

    def ready_windows(self, final: bool = False
                      ) -> tuple[list[int], np.ndarray]:
        """Emittable block ids + their model-input windows ``[n, n_bins,
        window_frames]`` WITHOUT running the model — a multi-stream server
        batches windows from many sessions into one forward and hands the
        results back via :meth:`accept_posteriors`."""
        blocks = self._ready_block_ids(final)
        if not blocks:
            return [], np.zeros(
                (0, self._n_bins, self._n_frame + self._margin_b
                 + self._margin_f), np.float32)
        self._featurize_pending()
        windows = np.stack([self._window(k) for k in blocks])
        return blocks, windows.transpose(0, 2, 1)

    def accept_posteriors(self, blocks: list[int], post: dict
                          ) -> list[dict[str, np.ndarray]]:
        """Store the model outputs for ``blocks`` (rows of ``post`` in the
        same order) and advance the emit pointer. Counterpart of
        :meth:`ready_windows`."""
        assert blocks == list(range(self._next_block,
                                    self._next_block + len(blocks)))
        out = []
        fams = ("A", "B") if self.mode == "combination" and \
            "onset_B" in post else ("A",)
        for i, _ in enumerate(blocks):
            out.append({f"{key}_{fam}": np.asarray(post[f"{key}_{fam}"][i])
                        for fam in fams for key in _POST_KEYS})
        self._posteriors.extend(out)
        self._next_block = blocks[-1] + 1
        # drop feature rows older than the next window's left edge
        keep_from = self._next_block * self._n_frame - self._margin_b
        if keep_from > self._feat_start:
            self._feat = self._feat[keep_from - self._feat_start:]
            self._feat_start = keep_from
        return out

    # -- one-dispatch single-block path ---------------------------------------

    def _make_fused_step(self):
        """Jit of: mel(seg) -> window assembly -> forward. Returns
        ``(posteriors [1, ...], feats [n_seg_frames, n_bins])`` so the host
        fetches BOTH in one ``device_get`` (one tunnel round trip)."""
        import jax
        import jax.numpy as jnp

        tr = self.tr
        mel = tr.frontend
        win = self._margin_b + self._n_frame + self._margin_f

        @jax.jit
        def step(params, seg, win_prior, n_known):
            feats = mel._compute_from_sample_blocks(seg[None])[0]
            rows = jnp.arange(win)
            # rows < n_known come from the host-prefilled prior (retained
            # features / min_value stream padding); the rest are the frames
            # just featurized, starting at feats[0] (the host's featurize
            # pointer equals the first unknown window row by construction)
            fresh = feats[jnp.clip(rows - n_known, 0, feats.shape[0] - 1)]
            window = jnp.where((rows < n_known)[:, None], win_prior, fresh)
            post = tr._run_batch(params, window.T[None])
            return post, feats

        return step

    def _emit_block_fused(self, k: int) -> list[dict[str, np.ndarray]] | None:
        """Emit ONE ready block in a single device dispatch + fetch.
        Returns None when the fast path's preconditions don't hold (caller
        falls back to the two-call path)."""
        import jax
        import jax.numpy as jnp

        lo = k * self._n_frame - self._margin_b
        hi = (k + 1) * self._n_frame + self._margin_f
        f0 = self._featurized_until
        n_known = f0 - lo
        # All checks BEFORE _take_pending (it consumes the sample buffer):
        # the known prefix must be host-available (negative rows are stream
        # padding), and the pending frames must cover the rest of the window.
        if not (0 <= n_known < hi - lo):
            return None
        if max(lo, 0) < self._feat_start or self._next_frame < hi:
            return None
        seg, n_new = self._take_pending()
        win_prior = np.full((hi - lo, self._n_bins), self._min_value,
                            np.float32)
        src_lo = max(lo, self._feat_start)
        if f0 > src_lo:
            win_prior[src_lo - lo : f0 - lo] = \
                self._feat[src_lo - self._feat_start : f0 - self._feat_start]
        seg, _ = self.bucket_segment(seg, n_new)
        if self._fused_step is None:
            self._fused_step = self._make_fused_step()
        post_dev, feats_dev = self._fused_step(
            self.tr.params, jnp.asarray(seg), jnp.asarray(win_prior),
            jnp.int32(n_known))
        post, feats = jax.device_get((post_dev, feats_dev))
        self._accept_features(np.asarray(feats[:n_new], np.float32))
        return self.accept_posteriors([k], post)

    def _emit_ready_blocks(self, final: bool) -> list[dict[str, np.ndarray]]:
        """Run every ready block through this session's own Transcriber."""
        ready = self._ready_block_ids(final)
        out = None
        if (len(ready) == 1 and not final and self.tr.params is not None
                and self.tr.mesh is None):
            # steady-state realtime case: one block -> one round trip
            out = self._emit_block_fused(ready[0])
        if out is not None:
            blocks = ready
        else:
            blocks, windows = self.ready_windows(final)
            if not blocks:
                return []
            out = self.accept_posteriors(blocks, self.tr._run_all(windows))
        # Tunnel hygiene for endless single-stream sessions: every uploaded
        # segment is retained by the journaling tunnel (utils/tunnel.py);
        # with all posteriors now host-side this is a safe fence point.
        # Deferred sessions are fenced by their StreamServer instead.
        jr = self.journal_reset_blocks
        if jr and not self._defer:
            self._blocks_since_reset += len(blocks)
            if self._blocks_since_reset >= jr:
                self._blocks_since_reset = 0
                self.tr.reset_transfer_journal()
        return out

    def _window(self, k: int) -> np.ndarray:
        """Feature window for block ``k``: rows ``[128k - margin_b,
        128k + num_frame + margin_f)`` with ``min_value`` padding outside
        the recording (matches ``Transcriber.transcript`` geometry)."""
        lo = k * self._n_frame - self._margin_b
        hi = (k + 1) * self._n_frame + self._margin_f
        n_rows = hi - lo
        win = np.full((n_rows, self._n_bins), self._min_value, np.float32)
        src_lo = max(lo, self._feat_start)
        src_hi = min(hi, self._feat_start + self._feat.shape[0])
        if src_hi > src_lo:
            win[src_lo - lo : src_hi - lo] = \
                self._feat[src_lo - self._feat_start :
                           src_hi - self._feat_start]
        return win

    # -- results --------------------------------------------------------------

    def posteriors(self) -> dict[str, np.ndarray]:
        """Retained emitted blocks concatenated: ``[n_frames, num_note]``
        per key. Without :meth:`pop_stable_notes` pruning this is every
        emitted frame, and after ``flush()`` equals ``transcript()`` of the
        whole recording; with pruning it is the live tail starting at
        global frame ``self._post_start``."""
        if not self._posteriors:
            fams = ("A", "B") if self.mode == "combination" else ("A",)
            n_note = self.config.midi.num_note
            return {f"{key}_{fam}": np.zeros((0, n_note), np.float32)
                    for fam in fams for key in _POST_KEYS}
        keys = self._posteriors[0].keys()
        return {key: np.concatenate([p[key] for p in self._posteriors])
                for key in keys}

    def notes(self, fam: str | None = None, **decode_kwargs) -> list[dict]:
        """Decode the retained posteriors into note events (reference
        ``mpe2note`` rules). After ``flush()`` (and without pruning) this
        equals the offline decode of the full recording; with
        :meth:`pop_stable_notes` pruning it covers only the live tail
        (times are still absolute)."""
        post = self.posteriors()
        if fam is None:
            fam = "B" if "onset_B" in post else "A"
        if post[f"onset_{fam}"].shape[0] == 0:
            return []
        out = self.tr.mpe2note(
            post[f"onset_{fam}"], post[f"offset_{fam}"], post[f"mpe_{fam}"],
            post[f"velocity_{fam}"], **decode_kwargs)
        if self._post_start:
            shift = self._post_start / self.config.feature.frames_per_sec
            out = [{**n, "onset": n["onset"] + shift,
                    "offset": n["offset"] + shift} for n in out]
        return out

    def stable_notes(self, guard_frames: int | None = None,
                     fam: str | None = None, **decode_kwargs) -> list[dict]:
        """Notes guaranteed not to change as more audio arrives: offset
        resolved more than ``guard_frames`` before the emitted head (default
        one block + offset tolerance). Suitable for live emission.

        Re-decodes the full history each call (O(stream length)); for
        unbounded streams use :meth:`pop_stable_notes`, which decodes only
        a bounded tail and prunes posteriors it no longer needs."""
        if guard_frames is None:
            guard_frames = self._n_frame + 8
        fps = self.config.feature.frames_per_sec
        horizon = (self.frames_emitted - guard_frames) / fps
        return [n for n in self.notes(fam=fam, **decode_kwargs)
                if n["offset"] < horizon]

    # -- unbounded-stream serving ----------------------------------------------

    def pop_stable_notes(self, guard_frames: int | None = None,
                         fam: str | None = None, final: bool = False,
                         prune: bool = True, **decode_kwargs) -> list[dict]:
        """Incremental serving decode: return ONLY the notes that became
        stable since the last call, then (by default) prune posterior blocks
        no future note can depend on.

        Per-call cost and retained memory are bounded by the decode tail —
        ``guard`` margin plus the span of still-sounding notes — instead of
        the whole stream, so a serving process can run indefinitely.
        Notes' times equal the full-history decode up to one float add
        (the tail decode computes ``t_local + post_start*hop_sec`` instead
        of ``t_global`` directly; error ~1 ulp of the absolute time).
        A still-sounding note pins its posteriors until it ends: stability
        of an onset requires seeing its offset, so the retention is
        inherent, not an implementation choice.

        ``final=True`` (after :meth:`flush`) releases the guard and returns
        every remaining note. Stick to ONE head family per transcriber when
        using this API (keys are deduplicated per family).
        """
        if guard_frames is None:
            guard_frames = self._n_frame + 8
        fps = self.config.feature.frames_per_sec
        horizon_f = self.frames_emitted - (0 if final else guard_frames)
        horizon = horizon_f / fps

        if fam is None:
            # Pick from the stored posterior keys, not the mode: a stage-1-
            # only model (cafreq ablation) emits only A heads even under
            # mode="combination" (accept_posteriors stores what the model
            # produced).
            fam = ("B" if self._posteriors and "onset_B" in self._posteriors[0]
                   else "A")
        # notes() decodes the retained tail and returns absolute times
        fresh, unstable_onsets = [], []
        for n in self.notes(fam=fam, **decode_kwargs):
            if n["offset"] < horizon or final:
                # Dedup key quantizes onset to 0.1 ms. The tail decode
                # recomputes absolute times as t_local + post_start/fps
                # (~1 ulp drift vs the full-history float), so a time at a
                # rounding boundary could requantize one bucket over —
                # also match the neighbor buckets (same-pitch re-onsets
                # are >= 1 frame = 16 ms apart, so neighbors are
                # unambiguous).
                q = round(n["onset"] * 1e4)
                if not any((fam, n["pitch"], q + d) in self._popped
                           for d in (0, -1, 1)):
                    self._popped.add((fam, n["pitch"], q))
                    fresh.append(n)
            else:
                unstable_onsets.append(n["onset"])

        if prune and not final:
            # keep everything any unstable note (or future peak near the
            # head) can reach, plus a block of locality margin for the
            # decoder's plateau scans / sub-frame interpolation
            keep_f = horizon_f
            if unstable_onsets:
                keep_f = min(keep_f, int(min(unstable_onsets) * fps))
            keep_f -= self._n_frame
            while (self._posteriors
                   and self._post_start + self._n_frame <= keep_f):
                self._posteriors.pop(0)
                self._post_start += self._n_frame
            if self._popped:
                # dedup keys for notes whose posteriors were pruned can
                # never be regenerated by a future tail decode — drop them
                # so retained memory stays bounded on endless streams
                # (one frame of slack for sub-frame onset interpolation)
                cutoff = (self._post_start - 1) / fps * 1e4
                self._popped = {k for k in self._popped if k[2] >= cutoff}
        return fresh
