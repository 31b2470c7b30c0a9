"""Batched sliding-window transcription.

The reference transcribes a full piece by looping 128-frame hops through the
model one window at a time with a host round-trip per chunk
(``model/amt.py:66-118``; half-window-stride center-crop variant
``:121-176``). On TPU that's dispatch-bound, so here all windows are built
on device in one gather and run through the model in fixed-size batches
(vmapped by the batch dimension), with posteriors stitched on device. The
padding geometry and output shapes match the reference exactly:

* plain mode: pad ``margin_b`` before; round frames up to a multiple of
  ``num_frame`` and pad ``margin_f`` after, all with ``min_value``; outputs
  have ``ceil(T / num_frame) * num_frame`` frames.
* stride mode: hop ``num_frame/2``, keep the centered
  ``[n_offset : n_offset + num_frame/2)`` slice of every window
  (``:121-132,162-171``).

Onset/offset/mpe posteriors are sigmoids of our logits; velocity is argmax
over the 128 classes as int8 (``:104-113``).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.ops.mel import MelFrontend
from nylon_amt_tpu.utils.wavio import load_mono

_POST_KEYS = ("onset", "offset", "mpe", "velocity")


class Transcriber:
    """High-level runtime mirroring the reference ``AMT`` class
    (``amt.py:9-31``): feature extraction + windowed transcription."""

    def __init__(self, config: Config, params: Any = None, model=None,
                 batch_windows: int = 8, use_engine: bool | None = None,
                 mesh=None, precision: str | None = None):
        self.config = config
        # Place params on device once up front: load_params returns host
        # arrays (journal-reset-safe), and feeding host leaves to the jitted
        # batch forward would re-upload the whole tree every call (one
        # tunnel RTT per transfer, plus journal growth).
        self.params = None if params is None else jax.device_put(params)
        self.precision = precision
        custom_model = model is not None
        if model is None:
            from nylon_amt_tpu.models.hft import build_model

            model = build_model(config)
        self.model = model
        self.frontend = MelFrontend(config.feature)
        self.batch_windows = batch_windows
        if use_engine is None:
            # Auto: the fused-layer engine replaces model.apply whenever it
            # covers the architecture and the Pallas path is selected.
            from nylon_amt_tpu.infer import engine
            from nylon_amt_tpu.models.hft import resolve_attention_impl

            use_engine = (not custom_model and engine.supports(config)
                          and resolve_attention_impl(
                              config.model.attention_impl) == "pallas")
        self.use_engine = use_engine
        if precision == "int8" and not use_engine:
            raise ValueError("precision='int8' requires the fused-layer "
                             "engine (engine.supports(config) must hold)")
        self.mesh = mesh
        n_data = 1
        if mesh is not None:
            from nylon_amt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                raise ValueError(
                    "Transcriber parallelism is data-only (the model is "
                    "<10 M params); build the mesh with n_model=1")
            n_data = mesh.shape.get(DATA_AXIS, 1)
        if n_data > 1:
            # Data-parallel transcription: the window batch is sharded over
            # the mesh's data axis and each chip runs the (Pallas or flax)
            # forward on its shard — same shard_map pattern as the DP train
            # step (Pallas kernels cannot be auto-partitioned by the SPMD
            # partitioner). Batches are padded up to a multiple of n_data.
            from jax.sharding import PartitionSpec as P

            from nylon_amt_tpu.parallel.mesh import DATA_AXIS

            self.batch_windows = -(-batch_windows // n_data) * n_data
            mapped = jax.shard_map(
                self._run_batch, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
                check_vma=False)  # pallas outputs carry no vma metadata
            self._jit_batch = jax.jit(mapped)
        else:
            self._jit_batch = jax.jit(self._run_batch)

    # -- tunnel hygiene --------------------------------------------------------

    def reset_transfer_journal(self) -> bool:
        """Carry this transcriber's device state (params + frontend
        constants) across a tunnel transfer-journal reset
        (``utils/tunnel.py``). Long-running serving sessions call this
        periodically — the journaling tunnel retains every uploaded audio
        segment, so an endless stream grows host RSS without bound.
        Returns False (no-op) off-tunnel. Only safe between forwards, with
        no other live device arrays."""
        from nylon_amt_tpu.utils.tunnel import (
            journal_reset_supported,
            reset_transfer_journal,
        )

        if not journal_reset_supported():
            return False
        tree = {"params": self.params,
                "mel": self.frontend.device_state()}
        tree = reset_transfer_journal(tree)
        self.params = tree["params"]
        self.frontend.restore_device_state(tree["mel"])
        return True

    # -- L1: features --------------------------------------------------------

    def wav2feature(self, path: str) -> np.ndarray:
        """WAV -> log-mel ``[n_frames, n_bins]`` (reference ``amt.py:34-63``)."""
        wav = load_mono(path, self.config.feature.sr)
        return np.asarray(self.frontend(wav))

    # -- L7: transcription -----------------------------------------------------

    def _run_batch(self, params, windows: jnp.ndarray) -> dict:
        """windows [N, n_bins, window_frames] -> posterior dict (device)."""
        if self.use_engine:
            from nylon_amt_tpu.infer import engine
            from nylon_amt_tpu.ops.attention import on_tpu

            out = engine.forward(params, windows, self.config,
                                 interpret=not on_tpu(),
                                 precision=self.precision)
        else:
            out = self.model.apply({"params": params}, windows,
                                   deterministic=True)
        post = {}
        # Stage-1-only models ("cafreq" ablation decoder) emit only A heads.
        for fam in ("A", "B") if "onset_B" in out else ("A",):
            post[f"onset_{fam}"] = jax.nn.sigmoid(out[f"onset_{fam}"])
            post[f"offset_{fam}"] = jax.nn.sigmoid(out[f"offset_{fam}"])
            post[f"mpe_{fam}"] = jax.nn.sigmoid(out[f"mpe_{fam}"])
            post[f"velocity_{fam}"] = jnp.argmax(
                out[f"velocity_{fam}"], axis=-1).astype(jnp.int8)
        if "string_B" in out:            # tablature head (ModelConfig.tab_head)
            post["string_B"] = jnp.argmax(
                out["string_B"], axis=-1).astype(jnp.int8)
        return post

    def _windows(self, feature: np.ndarray, starts: np.ndarray) -> np.ndarray:
        idx = starts[:, None] + np.arange(self.config.window_frames)
        return feature[idx].transpose(0, 2, 1)  # [N, n_bins, window]

    def _run_all(self, windows: np.ndarray) -> dict[str, np.ndarray]:
        """Run N windows through the model in fixed-size jitted batches.

        Two passes: dispatch every batch first (jax dispatch is async, so
        batch ``i+1`` computes while ``i``'s results transfer), then fetch.
        Each fetch is ONE batched D2H round trip for the whole posterior
        dict — per-key ``np.asarray`` would issue 8 sequential fetches
        (~244 ms vs ~35 ms through this environment's device tunnel).
        """
        N = windows.shape[0]
        bw = self.batch_windows
        pending: list[tuple[int, dict]] = []
        for i in range(0, N, bw):
            chunk = windows[i : i + bw]
            n = chunk.shape[0]
            if n < bw:  # pad to the static batch; extra rows discarded below
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bw - n, axis=0)])
            pending.append((n, self._jit_batch(self.params,
                                               jnp.asarray(chunk))))
        chunks = [{k: v[:n] for k, v in jax.device_get(out).items()}
                  for n, out in pending]
        return {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}

    def transcript(self, feature: np.ndarray, mode: str = "combination"
                   ) -> dict[str, np.ndarray]:
        """Full-piece transcription, plain hops (reference ``amt.py:66-118``).

        Returns ``{onset_A, offset_A, mpe_A, velocity_A[, *_B]}`` arrays of
        shape ``[ceil(T/num_frame)*num_frame, num_note]``.
        """
        cfg = self.config
        inp = cfg.input
        T = feature.shape[0]
        len_s = math.ceil(T / inp.num_frame) * inp.num_frame - T
        pad_val = np.float32(inp.min_value)
        padded = np.concatenate([
            np.full((inp.margin_b, cfg.feature.n_bins), pad_val),
            np.asarray(feature, np.float32),
            np.full((len_s + inp.margin_f, cfg.feature.n_bins), pad_val),
        ])
        starts = np.arange(0, T, inp.num_frame)
        post = self._run_all(self._windows(padded, starts))

        fams = ("A", "B") if mode == "combination" else ("A",)
        result = {}
        for fam in fams:
            for key in _POST_KEYS:
                # [N, num_frame, n_note] -> [N*num_frame, n_note]
                arr = post[f"{key}_{fam}"].reshape(-1, cfg.midi.num_note)
                result[f"{key}_{fam}"] = arr
        if "string_B" in post and "B" in fams:
            result["string_B"] = post["string_B"].reshape(
                -1, cfg.midi.num_note)
        return result

    def transcript_stride(self, feature: np.ndarray, n_offset: int,
                          mode: str = "combination") -> dict[str, np.ndarray]:
        """Half-window-hop overlap transcription with center crop
        (reference ``amt.py:121-176``)."""
        cfg = self.config
        inp = cfg.input
        half = inp.num_frame // 2
        T = feature.shape[0]
        tmp_len = T + inp.margin_b + inp.margin_f + half
        len_s = math.ceil(tmp_len / half) * half - tmp_len
        pad_val = np.float32(inp.min_value)
        padded = np.concatenate([
            np.full((inp.margin_b + n_offset, cfg.feature.n_bins), pad_val),
            np.asarray(feature, np.float32),
            np.full((len_s + inp.margin_f + (half - n_offset),
                     cfg.feature.n_bins), pad_val),
        ])
        starts = np.arange(0, T, half)
        post = self._run_all(self._windows(padded, starts))

        fams = ("A", "B") if mode == "combination" else ("A",)
        result = {}
        for fam in fams:
            for key in _POST_KEYS:
                arr = post[f"{key}_{fam}"][:, n_offset : n_offset + half, :]
                result[f"{key}_{fam}"] = arr.reshape(-1, cfg.midi.num_note)[
                    : T + len_s]
        if "string_B" in post and "B" in fams:
            arr = post["string_B"][:, n_offset : n_offset + half, :]
            result["string_B"] = arr.reshape(-1, cfg.midi.num_note)[: T + len_s]
        return result

    # -- decode + emit ---------------------------------------------------------

    def mpe2note(self, *args, **kwargs):
        from nylon_amt_tpu.infer.decode import mpe2note

        return mpe2note(self.config, *args, **kwargs)

    def note2midi(self, notes: list[dict], path: str) -> None:
        from nylon_amt_tpu.midi.smf import write_notes

        write_notes(path, notes)
