"""Hardware validation of the fused training kernels (incl. dropout).

Method: compare the custom-VJP kernels' forward value and analytic
gradients against **XLA autodiff of a pure-jnp replica of the same math**,
running on the same TPU. The replica applies bit-identical dropout using
the same global-index hash (:func:`layer_fused_train._keep_mask` is plain
jnp and runs outside Pallas), so any fwd/bwd mask misalignment inside the
kernels — the bug class this script guards — shows up as a gross gradient
divergence from the replica (masks are 0/1 at rate 0.1: a misaligned site
perturbs ~10% of a layer's activations).

Why not finite differences? A central-difference quotient is unusable for
this function on TPU hardware: at small eps the bf16 operand rounding of
the MXU quantizes the perturbation away (params ~0.3, bf16 relative step
~0.4%), and by eps ~3e-2 the softmax curvature dominates. Measured on
hardware: XLA autodiff itself — unquestionably correct — "fails" the FD
check with dir=-495 vs fd=+60 at eps 3e-2, and fd=-198 at eps 3e-3. There
is no valid eps window; the check below validates against autodiff
instead, which has no step-size parameter.

Checks per layer kind (encoder self-attn block, decoder self+cross block):
  1. determinism — same seed => bit-identical forward;
  2. forward value matches the replica to MXU-noise tolerance;
  3. per-tensor gradient cosine similarity vs the replica > 0.999;
  4. total directional-derivative agreement within 2%.

Run on a real TPU: python scripts/validate_fused_train_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Hardware noise floor (measured): the replica runs XLA HIGHEST-precision
# matmuls, the kernel runs Mosaic's f32 path (which this environment's
# --xla_allow_excess_precision lowers through the MXU's reduced-precision
# passes) — elementwise grad deltas reach ~1% of tensor norm on small-norm
# bias tensors (worst cos 0.9916 on `bso`), and the DEEP decoder block's
# forward sits at ~1.0% array-norm deviation **at rate 0, with no masks in
# play at all** (r5 measurement: dec_rate0 0.98%, dec_rate0.1 1.02% — the
# same floor). Directional agreement stays under 0.4% throughout. A
# fwd/bwd mask misalignment at rate 0.1 perturbs ~10% of a site's
# activations — fwd_rel jumps to tens of percent and dir_rel craters, far
# beyond these bounds.
COS_TOL = 0.99
DIR_TOL = 0.02
VAL_TOL = 0.02


def main():
    import jax
    import jax.numpy as jnp

    import nylon_amt_tpu.ops.layer_fused_train as ft
    from nylon_amt_tpu.ops.layer_fused import _LN_EPS, EncoderLayerParams
    from nylon_amt_tpu.ops.layer_fused_train import DecLayerParams
    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "hardware validation needs a TPU"
    rng = np.random.default_rng(1)
    N, L, LQ, HID, PF, HEADS = 64, 128, 24, 128, 256, 4
    seed = jnp.int32(1234)
    scale = 1.0 / float(HID // HEADS) ** 0.5

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    # ---- pure-jnp replica (XLA autodiff ground truth) ----------------------
    hi = jax.lax.Precision.HIGHEST

    def ln(z, g, b):
        zf = z.astype(jnp.float32)
        mu = jnp.mean(zf, -1, keepdims=True)
        var = jnp.mean(jnp.square(zf), -1, keepdims=True) - jnp.square(mu)
        return ((zf - mu) * jax.lax.rsqrt(var + _LN_EPS) * g + b).astype(
            z.dtype)

    def attention(q, k, v, rate, tag_base):
        """Per-head attention with the kernels' hash-mask dropout on the
        normalized weights (global shapes => row0 = 0)."""
        d = HID // HEADS
        outs = []
        for h in range(HEADS):
            sl = slice(h * d, (h + 1) * d)
            s = jnp.einsum("nld,nmd->nlm", q[..., sl], k[..., sl],
                           precision=hi) * scale
            a = jax.nn.softmax(s, axis=-1)
            if rate > 0.0:
                a = a * ft._keep_mask(seed, ft._head_tag(tag_base, h), 0,
                                      a.shape, rate)
            outs.append(jnp.einsum("nlm,nmd->nld", a, v[..., sl],
                                   precision=hi))
        return jnp.concatenate(outs, -1)

    def mm(x, w, b):
        return jnp.einsum("nld,dk->nlk", x, w, precision=hi) + b

    def site(z, tag, rate):
        if rate > 0.0:
            z = z * ft._keep_mask(seed, tag, 0, z.shape, rate)
        return z

    def ref_encoder(x, p, rate, emb_drop=False):
        if emb_drop and rate > 0.0:
            x = x * ft._keep_mask(seed, ft._SITE_EMB, 0, x.shape, rate)
        qkv = mm(x, p.wqkv, p.bqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = mm(attention(q, k, v, rate, ft._SITE_ATTN), p.wo, p.bo)
        y = ln(x + site(attn, ft._SITE_ATTN_OUT, rate), p.g, p.b)
        mid = site(jnp.maximum(mm(y, p.w1, p.b1), 0), ft._SITE_FFN_MID, rate)
        ff = site(mm(mid, p.w2, p.b2), ft._SITE_FFN_OUT, rate)
        return ln(y + ff, p.g, p.b)

    def ref_decoder(trg, enc, p, rate):
        sqkv = mm(trg, p.wsqkv, p.bsqkv)
        sq, sk, sv = jnp.split(sqkv, 3, axis=-1)
        sa = mm(attention(sq, sk, sv, rate, ft._SITE_SA), p.wso, p.bso)
        t1 = ln(trg + site(sa, ft._SITE_SA_OUT, rate), p.g, p.b)
        q = mm(t1, p.wq, p.bq)
        kv = mm(enc, p.wkv, p.bkv)
        k, v = jnp.split(kv, 2, axis=-1)
        attn = mm(attention(q, k, v, rate, ft._SITE_ATTN), p.wo, p.bo)
        y = ln(t1 + site(attn, ft._SITE_ATTN_OUT, rate), p.g, p.b)
        mid = site(jnp.maximum(mm(y, p.w1, p.b1), 0), ft._SITE_FFN_MID, rate)
        ff = site(mm(mid, p.w2, p.b2), ft._SITE_FFN_OUT, rate)
        return ln(y + ff, p.g, p.b)

    # ---- comparison harness ------------------------------------------------
    ok = True

    def compare(name, f_ker, f_ref, primals, z_ker=None, z_ref=None):
        nonlocal ok
        vk, gk = jax.value_and_grad(f_ker)(primals)
        vr, gr = jax.value_and_grad(f_ref)(primals)
        vk, vr = float(vk), float(vr)
        if z_ker is not None:
            # Forward check on the OUTPUT ARRAYS: the scalar loss is a
            # ~200k-element signed sum whose massive cancellation makes a
            # relative tolerance on it a coin flip (measured: |loss| ~ 40
            # from O(1) elements — r5's dec_rate0.1 draw tripped 1.02% vs
            # the 1% gate with grad cos 0.994 and dir_rel 0.3%).
            a = np.asarray(z_ker(primals), np.float64)
            b = np.asarray(z_ref(primals), np.float64)
            dval = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))
        else:
            dval = abs(vk - vr) / max(1.0, abs(vr))
        worst_cos, worst_t = 1.0, ""
        dirs_k = dirs_r = 0.0
        for t, (a, b) in zip(
                primals._fields,
                zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr))):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            cos = float((a * b).sum()
                        / max(1e-12, np.linalg.norm(a) * np.linalg.norm(b)))
            if cos < worst_cos:
                worst_cos, worst_t = cos, t
            dirs_k += float((a * b).sum())
            dirs_r += float((b * b).sum())
        # <gk, gr> / <gr, gr> == 1 iff gk == gr along gr; scale + direction
        ddir = abs(dirs_k - dirs_r) / max(1e-12, abs(dirs_r))
        passed = (dval < VAL_TOL and worst_cos > COS_TOL and ddir < DIR_TOL)
        ok &= passed
        print(json.dumps({"check": name, "value_ker": vk, "value_ref": vr,
                          "value_rel": dval, "worst_grad_cos": worst_cos,
                          "worst_tensor": worst_t, "dir_rel": ddir,
                          "ok": passed}), flush=True)

    # ---- encoder -----------------------------------------------------------
    x = arr(N, L, HID)
    p_enc = EncoderLayerParams(
        wqkv=arr(HID, 3 * HID), bqkv=arr(3 * HID), wo=arr(HID, HID),
        bo=arr(HID), g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID),
        w1=arr(HID, PF), b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    co = arr(N, L, HID)

    for rate in (0.0, 0.1):
        @jax.jit
        def f_ker(p, rate=rate):
            return jnp.sum(ft.encoder_layer_train(x, p, seed, HEADS, rate,
                                                  False) * co)

        @jax.jit
        def f_ref(p, rate=rate):
            return jnp.sum(ref_encoder(x, p, rate) * co)

        if rate > 0.0:
            a, b = float(f_ker(p_enc)), float(f_ker(p_enc))
            print(json.dumps({"check": "enc_deterministic", "ok": a == b}),
                  flush=True)
            ok &= a == b
        compare(f"enc_rate{rate:g}", f_ker, f_ref, p_enc,
                z_ker=jax.jit(lambda p, rate=rate: ft.encoder_layer_train(
                    x, p, seed, HEADS, rate, False)),
                z_ref=jax.jit(lambda p, rate=rate: ref_encoder(x, p, rate)))

    # embedding-dropout site (emb_drop=True fuses the reference's
    # dropout-on-embeddings into the first layer's kernels)
    @jax.jit
    def f_ker_emb(p):
        return jnp.sum(ft.encoder_layer_train(x, p, seed, HEADS, 0.1,
                                              False, True) * co)

    @jax.jit
    def f_ref_emb(p):
        return jnp.sum(ref_encoder(x, p, 0.1, emb_drop=True) * co)

    compare("enc_rate0.1_embdrop", f_ker_emb, f_ref_emb, p_enc,
            z_ker=jax.jit(lambda p: ft.encoder_layer_train(
                x, p, seed, HEADS, 0.1, False, True)),
            z_ref=jax.jit(lambda p: ref_encoder(x, p, 0.1, emb_drop=True)))

    # ---- decoder (self + cross) --------------------------------------------
    trg = arr(N, LQ, HID)
    enc = arr(N, L, HID)
    p_dec = DecLayerParams(
        wsqkv=arr(HID, 3 * HID), bsqkv=arr(3 * HID), wso=arr(HID, HID),
        bso=arr(HID), wq=arr(HID, HID), bq=arr(HID), wkv=arr(HID, 2 * HID),
        bkv=arr(2 * HID), wo=arr(HID, HID), bo=arr(HID),
        g=1.0 + 0.1 * arr(HID), b=0.1 * arr(HID), w1=arr(HID, PF),
        b1=arr(PF), w2=arr(PF, HID), b2=arr(HID))
    co2 = arr(N, LQ, HID)

    for rate in (0.0, 0.1):
        @jax.jit
        def f_ker(p, rate=rate):
            return jnp.sum(ft.decoder_layer_train(trg, enc, p, seed, HEADS,
                                                  rate, False) * co2)

        @jax.jit
        def f_ref(p, rate=rate):
            return jnp.sum(ref_decoder(trg, enc, p, rate) * co2)

        compare(f"dec_rate{rate:g}", f_ker, f_ref, p_dec,
                z_ker=jax.jit(lambda p, rate=rate: ft.decoder_layer_train(
                    trg, enc, p, seed, HEADS, rate, False)),
                z_ref=jax.jit(lambda p, rate=rate: ref_decoder(
                    trg, enc, p, rate)))

    print(json.dumps({"result": "PASS" if ok else "FAIL"}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
