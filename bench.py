"""Headline benchmark: transcription throughput on one TPU chip.

Measures batched sliding-window inference on the paper-scale hFT model
(d=256, ff=512, 3+3 layers, 4+4 heads — the reference's parity target,
``m_training_ablation.py:50-57``) in bfloat16 compute through the
fused-layer inference engine (``infer/engine.py``), and reports transcribed
audio seconds per wall second per chip, plus diagnostics: forward
wall-time, model FLOPs, and MFU against the v5e bf16 peak.

Baseline: the driver's north-star target of 20x real time per chip
(BASELINE.json); ``vs_baseline`` = value / 20.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.infer import engine
from nylon_amt_tpu.models.hft import build_model, init_params

BASELINE_AUDIO_SEC_PER_SEC = 20.0  # north-star: 20x real time per chip
V5E_BF16_PEAK_TFLOPS = 197.0       # per-chip MXU peak (public v5e spec)


def model_forward_flops(config: Config, batch: int) -> float:
    """Matmul FLOPs of one deterministic forward (2*M*K*N per matmul):
    projections, attention scores/PV, FFNs, and output heads. The conv stem
    (~0.5%) is included; LayerNorm/softmax VPU work is not (MFU convention).
    """
    m = config.model
    hid, pf = m.hid_dim, m.pf_dim
    nf, nb = config.input.num_frame, config.feature.n_bins
    nn_, nv = config.midi.num_note, config.midi.num_velocity
    B = batch
    enc_tokens = B * nf * nb
    q_tokens = B * nf * nn_
    t_tokens = B * nn_ * nf

    def attn(n_seqs, lq, lk):
        return 2 * n_seqs * lq * lk * hid * 2

    # frequency encoder: QKVO + attention + FFN per layer
    enc_layer = (4 * 2 * enc_tokens * hid * hid + attn(B * nf, nb, nb)
                 + 2 * 2 * enc_tokens * hid * pf)
    # stage-1 decoder: layer 0 = q/kv/o + cross-attn + FFN; later layers add
    # self-attention on the 88 queries
    dec0 = (2 * q_tokens * hid * hid * 2 + 2 * enc_tokens * hid * hid * 2
            + attn(B * nf, nn_, nb) + 2 * 2 * q_tokens * hid * pf)
    dec_full = dec0 + 4 * 2 * q_tokens * hid * hid + attn(B * nf, nn_, nn_)
    # stage-2 time encoder
    t_layer = (4 * 2 * t_tokens * hid * hid + attn(B * nn_, nf, nf)
               + 2 * 2 * t_tokens * hid * pf)
    heads = 2 * q_tokens * hid * (3 + nv) * 2           # A + B head families
    stem = 2 * B * nb * nf * (2 * config.input.margin_b + 1) * hid
    return float(m.enc_layer * enc_layer + dec0 + (m.dec_layer - 1) * dec_full
                 + m.dec_layer * t_layer + heads + stem)


def train_throughput(iters: int = 5, repeats: int = 3) -> dict:
    """Training-step throughput at the reference recipe's batch size
    (8, dropout 0.1 — ``EXE-TRAINING-MAESTRO.sh``): full fwd+bwd+Adam
    production steps, ``repeats`` timed windows of ``iters`` steps each
    (min = best-case device time, median = what a run actually sees;
    the tunnel adds ~5% session-to-session drift — PERF.md).
    fwd+bwd+update ~= 3x forward FLOPs (standard convention), so
    ``train_mfu`` is directly comparable to the inference MFU."""
    from nylon_amt_tpu.config import TrainConfig
    from nylon_amt_tpu.train.step import create_train_state, make_train_step

    B = 8
    config = Config(
        model=ModelConfig(hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3,
                          enc_head=4, dec_head=4, dropout=0.1,
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=B))
    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.standard_normal((B, 256, 192)), jnp.float32),
        "onset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "offset": jnp.asarray(rng.random((B, 128, 88)) > 0.97, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, 128, 88)) > 0.9, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, 128, (B, 128, 88)), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    state = create_train_state(config, jax.random.key(0), batch_size=B)
    # The PRODUCTION step (fused-layer custom-VJP path on TPU), not a
    # hand-rolled loss/grad — this is what Trainer.fit runs.
    step = make_train_step(config)

    state, metrics = step(state, batch, jax.random.key(1))
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.key(2))
    float(metrics["loss"])  # fence (block_until_ready lies via the tunnel)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, jax.random.key(3))
        float(metrics["loss"])
        times.append((time.perf_counter() - t0) / iters)
    dt, dt_med = min(times), sorted(times)[len(times) // 2]
    sec_per_window = (config.input.num_frame * config.feature.hop_sample
                      / config.feature.sr)
    train_flops = 3.0 * model_forward_flops(config, B)
    return {"train_audio_sec_per_sec_per_chip": round(
                B * sec_per_window / dt, 2),
            "train_step_ms_batch8": round(dt * 1e3, 2),
            "train_step_ms_batch8_median": round(dt_med * 1e3, 2),
            "train_mfu_vs_v5e_bf16_peak": round(
                train_flops / dt / 1e12 / V5E_BF16_PEAK_TFLOPS, 3)}


def main() -> None:
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = 32
    warmup, iters = 3, 10

    config = Config(model=ModelConfig(
        hid_dim=256, pf_dim=512, enc_layer=3, dec_layer=3, enc_head=4,
        dec_head=4, dropout=0.0, compute_dtype="bfloat16"))
    model = build_model(config)
    params = init_params(config, jax.random.key(0))

    # Seconds of audio each window advances: num_frame hops.
    sec_per_window = (config.input.num_frame * config.feature.hop_sample
                      / config.feature.sr)  # 2.048 s

    def make_forward_n(precision):
        def posteriors(spec):
            out = engine.forward(params, spec, config, precision=precision)
            # Posterior outputs exactly as transcription consumes them.
            return (jax.nn.sigmoid(out["onset_B"]),
                    jax.nn.sigmoid(out["offset_B"]),
                    jax.nn.sigmoid(out["mpe_B"]),
                    jnp.argmax(out["velocity_B"], axis=-1).astype(jnp.int8),
                    jax.nn.sigmoid(out["onset_A"]),
                    jax.nn.sigmoid(out["offset_A"]),
                    jax.nn.sigmoid(out["mpe_A"]),
                    jnp.argmax(out["velocity_A"], axis=-1).astype(jnp.int8))

        # Timing methodology: this environment reaches the chip through a
        # tunnel whose block_until_ready is unreliable (returns before
        # execution ends), so the measured region is a device-side lax.scan
        # of `iters` forwards inside ONE jit, closed by a host fetch of a
        # scalar checksum. That times pure steady-state device compute,
        # which is the honest definition of audio-sec/sec/chip (the input
        # pipeline overlaps in production).
        @jax.jit
        def forward_n(spec):
            def body(carry, _):
                outs = posteriors(spec + carry * 1e-20)  # defeat CSE
                return carry + outs[0][0, 0, 0].astype(jnp.float32), None
            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return carry

        return forward_n

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal(
        (batch, config.feature.n_bins, config.window_frames)) * 2.0 - 8.0,
        jnp.float32)

    def measure(precision, repeats=3):
        """(min, median) per-forward seconds over `repeats` timed scans —
        the spread makes tunnel drift (~5% session to session) visible so
        a regression gate on this JSON doesn't false-fire."""
        forward_n = make_forward_n(precision)
        for _ in range(warmup):
            float(forward_n(spec))
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(forward_n(spec))
            times.append((time.perf_counter() - t0) / iters)
        return min(times), sorted(times)[len(times) // 2]

    dt, dt_med = measure(None)               # bf16 exact-parity path
    dt_q8, _ = measure("int8")               # W8A8 quantized path
    audio_sec_per_sec = batch * sec_per_window / dt
    flops = model_forward_flops(config, batch)
    record = {
        "metric": "transcribe_audio_sec_per_sec_per_chip",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(audio_sec_per_sec / BASELINE_AUDIO_SEC_PER_SEC, 3),
        "ms_per_batch32_forward": round(dt * 1e3, 2),
        "ms_per_batch32_forward_median": round(dt_med * 1e3, 2),
        "model_tflops_per_forward": round(flops / 1e12, 3),
        "mfu_vs_v5e_bf16_peak": round(flops / dt / 1e12
                                      / V5E_BF16_PEAK_TFLOPS, 3),
        "int8_audio_sec_per_sec_per_chip": round(
            batch * sec_per_window / dt_q8, 2),
        "ms_per_batch32_forward_int8": round(dt_q8 * 1e3, 2),
    }
    record.update(train_throughput())
    print(json.dumps(record))


if __name__ == "__main__":
    main()
