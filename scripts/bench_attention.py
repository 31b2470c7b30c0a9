"""Attention kernel microbenchmark at the hFT model's three shapes.

Measures the fused Pallas kernel (fwd, fwd+bwd, dropout) against the XLA
path and against the matmul-FLOPs roofline, per attention site:

* encoder self-attn:  N = B*128 frames, L = 256 mel bins
* decoder cross-attn: N = B*128,       Lq = 88 notes, Lk = 256
* decoder self-attn:  N = B*88 notes,  L = 128 frames

Prints one JSON line per (site, variant).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def flops(n, lq, lk, hid):
    # QK^T + PV, fwd only (projections are not part of the kernel)
    return 2 * n * lq * lk * hid * 2


def scan_time(step_fn, init, consts, iters=20):
    """Time a device-side scan of ``step_fn(x, *consts)`` chained through
    its output, closed by a host scalar fetch (block_until_ready returns
    early through the TPU tunnel — the fetch is the only reliable fence).

    ``consts`` MUST be passed as arguments, not closed over: closure
    constants are embedded in the HLO and the tunnel's remote-compile
    service rejects multi-hundred-MB payloads (HTTP 413).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *cs):
        def body(c, _):
            nxt = step_fn(c, *cs)
            return nxt, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.float32(out.astype(jnp.float32).sum())

    float(run(init, *consts))  # compile + warm
    t0 = time.perf_counter()
    float(run(init, *consts))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--hid", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--site", choices=["enc_sa", "dec_ca", "dec_sa"])
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nylon_amt_tpu.ops.attention import fused_mha
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, H, hid = args.batch, args.heads, args.hid
    scale = 1.0 / (hid // H) ** 0.5
    sites = {
        "enc_sa": (B * 128, 256, 256),
        "dec_ca": (B * 128, 88, 256),
        "dec_sa": (B * 88, 128, 128),
    }
    rng = np.random.default_rng(0)

    for name, (n, lq, lk) in sites.items():
        if args.site and name != args.site:
            continue
        q = jnp.asarray(rng.standard_normal((n, lq, hid)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((n, lk, hid)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((n, lk, hid)), jnp.bfloat16)

        t_fwd = scan_time(lambda x, k, v: fused_mha(x, k, v, H, scale), q,
                          (k, v), iters=args.iters)

        def grad_step(x, k, v):
            def loss(x):
                return fused_mha(x, k, v, H, scale).astype(jnp.float32).sum()

            return jax.grad(loss)(x)

        t_bwd = scan_time(grad_step, q, (k, v), iters=args.iters)

        def xla(x, k, v):
            qh = x.reshape(n, lq, H, hid // H)
            kh = k.reshape(n, lk, H, hid // H)
            vh = v.reshape(n, lk, H, hid // H)
            s = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p.astype(x.dtype), vh,
                           preferred_element_type=jnp.float32)
            return o.astype(x.dtype).reshape(n, lq, hid)

        t_xla = scan_time(xla, q, (k, v), iters=args.iters) \
            if not args.skip_xla else float("nan")

        f = flops(n, lq, lk, hid)
        gb = n * (lq * 2 + lk * 2) * hid * 2 / 1e9  # q+o+k+v, bf16
        print(json.dumps({
            "site": name, "shape": [n, lq, lk, hid],
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_tflops": round(f / t_fwd / 1e12, 1),
            "fwd_gbps": round(gb / t_fwd, 0),
            "bwd_ms": round(t_bwd * 1e3, 3),
            "xla_fwd_ms": round(t_xla * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
