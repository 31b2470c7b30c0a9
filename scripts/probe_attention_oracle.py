"""Measure fused-attention accuracy against an f64 oracle at the real
activations of the worst-conditioned model site.

Reproduces the numbers in ``docs/pallas_grad_tolerance.md``: captures the
q/k/v entering the freq-encoder self-attention of the grad-parity test's
exact config (where the reference's sqrt(hid)-scaled, pre-LN-free embeddings
saturate the softmax at init), then compares dq/dk/dv of the Pallas kernel
(interpret mode) and the XLA einsum path against an XLA float64 oracle.

Usage: python scripts/probe_attention_oracle.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp

from nylon_amt_tpu.config import Config, ModelConfig
from nylon_amt_tpu.models.hft import HFT
from nylon_amt_tpu.ops import attention as att


def main() -> None:
    base = Config(model=ModelConfig(hid_dim=16, pf_dim=32, enc_layer=1,
                                    dec_layer=1, enc_head=2, dec_head=2,
                                    dropout=0.0, attention_impl="xla"))
    rng = np.random.default_rng(1234)  # the test fixture's seed
    spec = rng.standard_normal((1, 256, 192)).astype(np.float32)
    params = HFT(config=base).init({"params": jax.random.key(0)},
                                   spec)["params"]
    cfg_p = dataclasses.replace(
        base, model=dataclasses.replace(base.model, attention_impl="pallas"))

    real_mha, cap = att.fused_mha, {}

    def capture(q, k, v, n_heads, scale, interpret=False):
        if "q" not in cap:  # first site = freq-encoder self-attention
            cap.update(q=np.asarray(q), k=np.asarray(k), v=np.asarray(v),
                       h=n_heads, s=scale)
        return real_mha(q, k, v, n_heads, scale, interpret)

    att.fused_mha = capture
    try:
        HFT(config=cfg_p).apply({"params": params}, spec)
    finally:
        att.fused_mha = real_mha

    q, k, v, heads, scale = cap["q"], cap["k"], cap["v"], cap["h"], cap["s"]
    n, lseq, hid = q.shape
    d = hid // heads

    def xla_attn(q, k, v):
        qh = q.reshape(n, lseq, heads, d)
        kh = k.reshape(n, lseq, heads, d)
        vh = v.reshape(n, lseq, heads, d)
        s = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", a.astype(q.dtype), vh,
                       preferred_element_type=jnp.float32)
        return o.astype(q.dtype).reshape(n, lseq, hid)

    s = np.einsum("nqhd,nkhd->nhqk", q.reshape(n, lseq, heads, d),
                  k.reshape(n, lseq, heads, d)) * scale
    print(f"site shapes q{q.shape}, scores span {s.min():.1f}..{s.max():.1f}")

    do = np.random.default_rng(7).standard_normal(q.shape).astype(np.float32)

    _, pull = jax.vjp(xla_attn, q, k, v)
    g_x = jax.tree.map(np.asarray, pull(do))
    _, pull = jax.vjp(lambda a, b, c: real_mha(a, b, c, heads, scale, True),
                      q, k, v)
    g_p = jax.tree.map(np.asarray, pull(do))

    jax.config.update("jax_enable_x64", True)
    q64, k64, v64, do64 = (x.astype(np.float64) for x in (q, k, v, do))
    _, pull = jax.vjp(xla_attn, q64, k64, v64)
    g_64 = jax.tree.map(np.asarray, pull(do64))

    for name, a, b, o in zip("qkv", g_x, g_p, g_64):
        print(f"d{name}: xla-f32 vs f64 {np.abs(a - o).max():.3e}   "
              f"pallas vs f64 {np.abs(b - o).max():.3e}   "
              f"|g|max {np.abs(o).max():.3e}")


if __name__ == "__main__":
    main()
