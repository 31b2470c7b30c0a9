"""Hardware validation of the fused training kernels' dropout gradients.

With a FIXED seed, the dropped forward is a deterministic function of the
inputs, so its custom-VJP gradient must satisfy the finite-difference
identity  (f(p + eps*v) - f(p - eps*v)) / (2 eps) ~= <grad f, v>.
This catches fwd/bwd PRNG-stream misalignment (e.g. differing grid block
sizes regenerating different masks in the backward — a bug this script was
written to guard after it produced silently-wrong gradients), which the
CPU test suite cannot: the Pallas PRNG has no interpreter support.

Run on a real TPU: python scripts/validate_fused_train_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name, f, primals, eps=3e-2, tol=1.2e-1):
    """Noise-aware finite-difference check.

    On TPU, f32 matmuls lower to decomposed-bf16 MXU passes (~1e-3 relative
    noise); at eps=1e-3 the FD quotient's noise term (|f|*1e-3 / 2eps)
    swamps the directional derivative, so eps must be large enough that the
    signal dominates while staying inside the linear regime. CPU-interpret
    runs get the exact check from the pytest suite
    (tests/test_layer_fused_train.py::test_dropout_grad_finite_difference).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vs = [jnp.asarray(rng.standard_normal(np.shape(p)) * 1.0,
                      jnp.float32).reshape(jnp.shape(p))
          for p in jax.tree_util.tree_leaves(primals)]
    treedef = jax.tree_util.tree_structure(primals)
    v = jax.tree_util.tree_unflatten(treedef, vs)

    val, grad = jax.value_and_grad(f)(primals)
    directional = sum(
        float(jnp.vdot(g, vv)) for g, vv in
        zip(jax.tree_util.tree_leaves(grad), jax.tree_util.tree_leaves(v)))

    plus = jax.tree_util.tree_map(lambda p, vv: p + eps * vv, primals, v)
    minus = jax.tree_util.tree_map(lambda p, vv: p - eps * vv, primals, v)
    fd = (float(f(plus)) - float(f(minus))) / (2 * eps)
    rel = abs(fd - directional) / max(1e-6, abs(fd))
    ok = rel < tol
    print(json.dumps({"check": name, "fd": fd, "directional": directional,
                      "rel_err": rel, "ok": ok}), flush=True)
    return ok


def main():
    import jax
    import jax.numpy as jnp

    from nylon_amt_tpu.ops.layer_fused import EncoderLayerParams
    from nylon_amt_tpu.ops.layer_fused_train import (
        DecLayerParams,
        decoder_layer_train,
        encoder_layer_train,
    )
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "hardware validation needs a TPU"
    rng = np.random.default_rng(1)
    N, L, LQ, HID, PF, HEADS = 64, 128, 24, 128, 256, 4
    RATE = 0.1
    seed = jnp.int32(1234)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    x = arr(N, L, HID)
    p_enc = EncoderLayerParams(
        wqkv=arr(HID, 3 * HID), bqkv=arr(3 * HID), wo=arr(HID, HID),
        bo=arr(HID), g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID),
        w1=arr(HID, PF), b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    co = arr(N, L, HID)

    @jax.jit
    def f_enc(p):
        return jnp.sum(encoder_layer_train(x, p, seed, HEADS, RATE, False)
                       * co)

    # determinism: same seed -> identical value
    a, b = float(f_enc(p_enc)), float(f_enc(p_enc))
    print(json.dumps({"check": "enc_deterministic", "ok": a == b}),
          flush=True)
    ok = a == b
    ok &= check("enc_dropout_grad_fd", f_enc, p_enc)

    trg = arr(N, LQ, HID)
    enc = arr(N, L, HID)
    p_dec = DecLayerParams(
        wsqkv=arr(HID, 3 * HID), bsqkv=arr(3 * HID), wso=arr(HID, HID),
        bso=arr(HID), wq=arr(HID, HID), bq=arr(HID), wkv=arr(HID, 2 * HID),
        bkv=arr(2 * HID), wo=arr(HID, HID), bo=arr(HID),
        g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID), w1=arr(HID, PF),
        b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    co2 = arr(N, LQ, HID)

    @jax.jit
    def f_dec(p):
        return jnp.sum(decoder_layer_train(trg, enc, p, seed, HEADS, RATE,
                                           False) * co2)

    ok &= check("dec_dropout_grad_fd", f_dec, p_dec)
    print(json.dumps({"result": "PASS" if ok else "FAIL"}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
