"""Per-stage fwd+bwd accounting of the fused training step (PERF.md).

Times each training-path stage in isolation on the TPU — stem, the three
fused layer kernels at their production shapes, heads+loss (as the
residual), Adam — and prints a roofline table: measured ms vs the
compute-bound (197 bf16 TFLOP/s on v5e) and HBM-bound (819 GB/s) floors.
This is the training companion of PERF.md's inference per-stage table and
the evidence behind the train-MFU number in BENCH (the training loop is
``training/train.py:63-162`` in the reference; it has no such accounting).

FLOP conventions:
* ``model`` FLOPs = 3x the forward matmul FLOPs (fwd + 2x for bwd) — the
  numerator of MFU;
* ``executed`` FLOPs = 4x (the bwd kernels recompute the forward to avoid
  materializing intermediates in HBM — the standard remat trade).

Usage:
  python scripts/bench_train_stages.py            # per-stage table
  python scripts/bench_train_stages.py --ladder   # block-budget sweep
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = 197e12      # v5e bf16
PEAK_HBM = 819e9          # v5e HBM GB/s


def fence(x):
    """Host-fetch fence (block_until_ready returns early through the
    tunnel — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.reshape(-1)[:1].astype(np.float32)))


def time_carry(step, carry, iters, warmup=2, donate=True):
    """Median-of-3 timing of an eager loop ``carry = step(carry)`` of a
    donated jitted step (the methodology of ``bench_train.py`` — a
    ``lax.scan`` wrapper would lose buffer donation and time full
    state/activation copies instead). Async dispatch pipelines the calls;
    only the final host fetch pays the tunnel RTT."""
    import jax
    import jax.numpy as jnp

    if donate:   # don't donate the CALLER's buffers, only our copy
        carry = jax.tree_util.tree_map(jnp.copy, carry)
    jstep = jax.jit(step, donate_argnums=(0,) if donate else ())
    for _ in range(warmup):
        carry = jstep(carry)
    fence(carry)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = jstep(carry)
        fence(carry)
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(best))


def enc_flops_fwd(n, l, d, pf):
    """Forward matmul FLOPs of one self-attention encoder layer."""
    return 2 * n * (l * d * 3 * d + 2 * l * l * d + l * d * d
                    + l * d * pf + l * pf * d)


def dec_flops_fwd(n, lq, lk, d, pf, with_self):
    f = 2 * n * (lq * d * d + lk * d * 2 * d + 2 * lq * lk * d + lq * d * d
                 + lq * d * pf + lq * pf * d)
    if with_self:
        f += 2 * n * (lq * d * 3 * d + 2 * lq * lq * d + lq * d * d)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ladder", action="store_true",
                    help="sweep NYLON_BLOCK_BUDGET_MB over the three "
                         "kernel shapes instead of the stage table")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nylon_amt_tpu.config import Config, ModelConfig, TrainConfig
    from nylon_amt_tpu.models import fused_train
    from nylon_amt_tpu.models.hft import fused_stem
    from nylon_amt_tpu.ops.layer_fused_train import (
        decoder_layer_train, decoder_layer_zero_train, encoder_layer_train)
    from nylon_amt_tpu.train.step import (create_train_state, loss_fn,
                                          make_train_step)

    print("backend:", jax.default_backend(), flush=True)
    cfg = Config(model=ModelConfig.paper_scale(),
                 train=TrainConfig(batch_size=args.batch))
    m = cfg.model
    B, F, NB = args.batch, cfg.input.num_frame, cfg.feature.n_bins
    NN, NV = cfg.midi.num_note, cfg.midi.num_velocity
    d, pf, rate = m.hid_dim, m.pf_dim, m.dropout
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    seed = jnp.int32(1234)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, dt)

    from nylon_amt_tpu.models.hft import init_params
    params = init_params(cfg, jax.random.key(0), batch_size=B)
    enc_freq_p = fused_train._pack_enc(params["encoder"]["layers_freq_0"])
    dec_zero_p = fused_train._pack_dec(params["decoder"]["layer_zero_freq"],
                                       False)
    dec_self_p = fused_train._pack_dec(params["decoder"]["layers_freq_0"],
                                       True)
    enc_time_p = fused_train._pack_enc(params["decoder"]["layers_time_0"])
    cast = lambda p: type(p)(*[w.astype(dt) if w.ndim > 0 else w
                               for w in p])
    enc_freq_p, dec_zero_p, dec_self_p, enc_time_p = map(
        cast, (enc_freq_p, dec_zero_p, dec_self_p, enc_time_p))

    shapes = {
        "enc_freq": (B * F, NB, d),          # (1024, 256, 256)
        "enc_time": (B * NN, F, d),          # (704, 128, 256)
    }
    x_freq = arr(*shapes["enc_freq"])
    x_time = arr(*shapes["enc_time"])
    trg = arr(B * F, NN, d)
    EPS = 1e-8

    def kernel_rows(name, fn, x, fwd_flops, extra_bytes=0.0):
        """Measure fwd and fwd+bwd of a layer kernel; return table rows."""
        ms_f = time_carry(fn, x, args.iters)

        def step_bwd(x):
            y, vjp = jax.vjp(fn, x)
            dx = vjp(jnp.ones_like(y))[0]
            return (x + EPS * dx).astype(x.dtype)

        ms_fb = time_carry(step_bwd, x, args.iters)
        n_el = float(np.prod(x.shape))
        bytes_f = 2 * n_el * 2 + extra_bytes              # x in + y out, bf16
        bytes_fb = bytes_f + 3 * n_el * 2 + extra_bytes   # + dz in, dx out, recompute x
        return [(name + " fwd", ms_f, fwd_flops, fwd_flops, bytes_f),
                (name + " fwd+bwd", ms_fb, 3 * fwd_flops, 4 * fwd_flops,
                 bytes_fb)]

    if args.ladder:
        print("block-budget ladder (fwd+bwd ms per kernel):")
        results = {}
        for budget in ("2", "4", "8", "12"):
            os.environ["NYLON_BLOCK_BUDGET_MB"] = budget
            row = {}
            for name, fn, x in (
                ("enc_freq", lambda x: encoder_layer_train(
                    x, enc_freq_p, seed, m.enc_head, rate), x_freq),
                ("dec_self", lambda t: decoder_layer_train(
                    t, x_freq, dec_self_p, seed, m.dec_head, rate), trg),
                ("enc_time", lambda x: encoder_layer_train(
                    x, enc_time_p, seed, m.dec_head, rate), x_time),
            ):
                def step_bwd(x, fn=fn):
                    y, vjp = jax.vjp(fn, x)
                    return (x + EPS * vjp(jnp.ones_like(y))[0]).astype(x.dtype)
                row[name] = round(time_carry(step_bwd, x, args.iters), 2)
            results[budget] = row
            print(f"  budget {budget:>2} MB: {row}", flush=True)
        print(json.dumps({"ladder": results}))
        return

    rows = []

    # ---- full step + fwd-only reference -----------------------------------
    batch = {
        "spec": jnp.asarray(rng.standard_normal((B, NB, cfg.window_frames)),
                            jnp.float32),
        "onset": jnp.asarray(rng.random((B, F, NN)) > 0.97, jnp.float32),
        "offset": jnp.asarray(rng.random((B, F, NN)) > 0.97, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, F, NN)) > 0.9, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, NV, (B, F, NN)), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    fused_apply = fused_train.make_fused_apply(cfg)
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)
    step = make_train_step(cfg, fused_apply=fused_apply)
    key = jax.random.key(1)

    # full step: make_train_step's own jitted+donated fn, eager loop (the
    # exact bench_train.py methodology)
    s = state
    for _ in range(3):
        s, metrics = step(s, batch, key)
    fence(metrics["loss"])
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, metrics = step(s, batch, key)
        fence(metrics["loss"])
        best.append((time.perf_counter() - t0) / args.iters * 1e3)
    ms_full = float(np.median(best))
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)

    params_f = state.params

    def fwd_only(carry):
        loss, _ = loss_fn(cfg, fused_apply, params_f, batch,
                          jax.random.fold_in(key, carry.astype(jnp.int32)))
        return carry + EPS * loss

    ms_fwd_only = time_carry(fwd_only, jnp.float32(0), args.iters,
                             donate=False)

    # ---- adam in isolation -------------------------------------------------
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-9),
                                   state.params)

    def adam_step(state):
        return state.apply_gradients(grads=grads)

    ms_adam = time_carry(adam_step, state, args.iters)
    state = create_train_state(cfg, jax.random.key(0), batch_size=B)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    adam_bytes = 7 * 4 * n_params          # read p,m,v,g; write p,m,v (f32)
    rows.append(("adam update", ms_adam, 0, 0, adam_bytes))

    # ---- stem (XLA conv + tok embedding) -----------------------------------
    stem_args = (params["encoder"]["conv_kernel"],
                 params["encoder"]["conv_bias"],
                 params["encoder"]["tok_embedding_kernel"],
                 params["encoder"]["tok_embedding_bias"])

    def stem_bwd(carry):
        # grads wrt the stem WEIGHTS only — training never computes dspec
        # (the spectrogram is an input); an earlier version differentiated
        # wrt spec and overstated the stem 5x (10.3 vs ~2 ms).
        def loss(ws):
            y = fused_stem(batch["spec"], *ws, cnn_channel=m.cnn_channel,
                           cnn_kernel=m.cnn_kernel, hid_dim=d,
                           n_margin=cfg.input.margin_b, dtype=dt)
            return jnp.sum(y.astype(jnp.float32) * 1e-6)

        g = jax.grad(loss)(stem_args)
        return carry + EPS * g[1][0]

    ms_stem = time_carry(stem_bwd, jnp.float32(0), args.iters, donate=False)
    stem_flops = 2 * B * F * NB * (m.cnn_kernel * 5 * m.cnn_channel
                                   + m.cnn_channel * 5 * d) * 3
    rows.append(("stem fwd+bwd", ms_stem, stem_flops, stem_flops, 0))

    # ---- the three layer kernels at production shapes ----------------------
    n1, l1, _ = shapes["enc_freq"]
    rows += kernel_rows(
        "enc_freq x1", lambda x: encoder_layer_train(
            x, enc_freq_p, seed, m.enc_head, rate), x_freq,
        enc_flops_fwd(n1, l1, d, pf))

    def dec0_fn(t):
        return decoder_layer_zero_train(t, x_freq, dec_zero_p, seed,
                                        m.dec_head, rate)

    def dec1_fn(t):
        return decoder_layer_train(t, x_freq, dec_self_p, seed,
                                   m.dec_head, rate)

    enc_bytes = float(np.prod(shapes["enc_freq"])) * 2
    rows += kernel_rows("dec_zero x1", dec0_fn, trg,
                        dec_flops_fwd(B * F, NN, NB, d, pf, False),
                        extra_bytes=enc_bytes)
    rows += kernel_rows("dec_self x1", dec1_fn, trg,
                        dec_flops_fwd(B * F, NN, NB, d, pf, True),
                        extra_bytes=enc_bytes)

    n2, l2, _ = shapes["enc_time"]
    rows += kernel_rows(
        "enc_time x1", lambda x: encoder_layer_train(
            x, enc_time_p, seed, m.dec_head, rate), x_time,
        enc_flops_fwd(n2, l2, d, pf))

    # ---- heads + loss + embedding dropout = residual -----------------------
    by_name = {r[0]: r for r in rows}
    kernels_fb = (m.enc_layer * by_name["enc_freq x1 fwd+bwd"][1]
                  + by_name["dec_zero x1 fwd+bwd"][1]
                  + (m.dec_layer - 1) * by_name["dec_self x1 fwd+bwd"][1]
                  + m.dec_layer * by_name["enc_time x1 fwd+bwd"][1])
    residual = ms_full - kernels_fb - ms_stem - ms_adam
    head_flops = 3 * 2 * (B * F * NN * d * (3 + NV) + B * NN * F * d * (3 + NV))
    rows.append(("heads+loss+emb (residual)", residual, head_flops,
                 head_flops, 0))

    # ---- table -------------------------------------------------------------
    total_model_flops = (
        3 * (m.enc_layer * enc_flops_fwd(n1, l1, d, pf)
             + dec_flops_fwd(B * F, NN, NB, d, pf, False)
             + (m.dec_layer - 1) * dec_flops_fwd(B * F, NN, NB, d, pf, True)
             + m.dec_layer * enc_flops_fwd(n2, l2, d, pf))
        + stem_flops + head_flops)
    print(f"\nfull fused train step (batch {B}): {ms_full:.2f} ms  "
          f"| fwd-only: {ms_fwd_only:.2f} ms "
          f"| bwd+opt: {ms_full - ms_fwd_only:.2f} ms")
    print(f"model FLOPs/step {total_model_flops / 1e9:.1f} GF  ->  MFU "
          f"{total_model_flops / (ms_full / 1e3) / PEAK_TFLOPS:.3f}\n")
    hdr = (f"{'stage':<28}{'ms':>8}{'modelGF':>9}{'execGF':>8}"
           f"{'exec TF/s':>10}{'%peak':>7}{'GB/s':>8}{'bound':>7}")
    print(hdr)
    print("-" * len(hdr))
    for name, ms, fl_model, fl_exec, byt in rows:
        if ms <= 0:
            continue
        tfs = fl_exec / (ms / 1e3) / 1e12
        gbs = byt / (ms / 1e3) / 1e9
        t_c = fl_exec / PEAK_TFLOPS * 1e3
        t_m = byt / PEAK_HBM * 1e3
        bound = "MXU" if t_c > t_m else "HBM"
        print(f"{name:<28}{ms:>8.2f}{fl_model / 1e9:>9.1f}{fl_exec / 1e9:>8.1f}"
              f"{tfs:>10.1f}{100 * fl_exec / (ms / 1e3) / PEAK_TFLOPS:>6.1f}%"
              f"{gbs:>8.0f}{bound:>7}")
    print()
    print(json.dumps({
        "train_step_ms": round(ms_full, 2),
        "fwd_only_ms": round(ms_fwd_only, 2),
        "adam_ms": round(ms_adam, 2),
        "stem_ms": round(ms_stem, 2),
        "residual_ms": round(residual, 2),
        "train_mfu": round(
            total_model_flops / (ms_full / 1e3) / PEAK_TFLOPS, 4),
    }))


if __name__ == "__main__":
    main()
