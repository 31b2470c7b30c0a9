"""Decompose the train step's non-kernel residual (heads + loss + misc).

The per-stage table (bench_train_stages.py) attributes ~13-14 ms/step to
"heads+loss+emb (residual)" by subtraction. This probe times the pieces
directly, each as fwd+bwd at production shapes (batch 8, paper scale):

  heads_A      the four stage-1 output projections from trg [1024, 88, 256]
  stage2_glue  the [B,F,N,h]->[B*N,F,h] transpose + its inverse on heads_B
  heads_B      the four stage-2 projections from t [704, 128, 256]
  loss         8-criterion masked loss on fixed logits (BCE x6 + CE x2)
  seeds        the 9 fold_in+randint dropout-seed derivations

Run on a real TPU: python scripts/probe_residual.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.asarray(leaf).reshape(-1)[:1].astype(jnp.float32)))


def timeit(fn, args, iters=30):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    fence(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        fence(out)
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(best))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nylon_amt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    B, F, NN, NV, HID = 8, 128, 88, 128, 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dtype)

    trg = arr(B * F, NN, HID)
    t2 = arr(B * NN, F, HID)
    heads_w = {k: (arr(HID, n, dtype=jnp.float32), arr(n, dtype=jnp.float32))
               for k, n in (("onset", 1), ("offset", 1), ("mpe", 1),
                            ("velocity", NV))}

    def dense(x, w, b):
        y = jnp.dot(x, w.astype(dt), preferred_element_type=jnp.float32)
        return y.astype(dt) + b.astype(dt)

    def heads_A(trg, ws):
        out = {k: dense(trg, *ws[k]) for k in ws}
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    def heads_A_bwd(trg, ws):
        g = jax.grad(lambda w: heads_A(trg, w))(ws)
        return g

    def heads_B(t2, ws):
        out = {k: dense(t2, *ws[k]) for k in ws}
        # reference layout fixup: [B, NN, F, .] -> [B, F, NN, .]
        tot = 0.0
        for k, v in out.items():
            v = v.reshape(B, NN, F, -1).transpose(0, 2, 1, 3)
            tot += jnp.sum(v.astype(jnp.float32))
        return tot

    def heads_B_bwd(t2, ws):
        return jax.grad(lambda w: heads_B(t2, w))(ws)

    def glue(trg):
        t = trg.reshape(B, F, NN, HID).transpose(0, 2, 1, 3)
        return t.reshape(B * NN, F, HID) * 1.0001

    def glue_bwd(trg):
        return jax.grad(lambda x: jnp.sum(glue(x).astype(jnp.float32) ** 2))(trg)

    batch = {
        "onset": jnp.asarray(rng.random((B, F, NN)) > 0.97, jnp.float32),
        "offset": jnp.asarray(rng.random((B, F, NN)) > 0.97, jnp.float32),
        "mpe": jnp.asarray(rng.random((B, F, NN)) > 0.9, jnp.float32),
        "velocity": jnp.asarray(rng.integers(0, NV, (B, F, NN)), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    logits = {f"{k}_{fam}": arr(B, F, NN) for fam in ("A", "B")
              for k in ("onset", "offset", "mpe")}
    logits.update({f"velocity_{fam}": arr(B, F, NN, NV)
                   for fam in ("A", "B")})

    def loss(logits, batch):
        valid = batch["valid"]
        denom = jnp.maximum(valid.sum(), 1.0)

        def bce(lg, tg):
            per = optax.sigmoid_binary_cross_entropy(lg, tg)
            per = per.mean(axis=tuple(range(1, per.ndim)))
            return (per * valid).sum() / denom

        def ce(lg, lab):
            per = optax.softmax_cross_entropy_with_integer_labels(lg, lab)
            per = per.mean(axis=tuple(range(1, per.ndim)))
            return (per * valid).sum() / denom

        tot = 0.0
        for fam in ("A", "B"):
            tot += bce(logits[f"onset_{fam}"], batch["onset"])
            tot += bce(logits[f"offset_{fam}"], batch["offset"])
            tot += bce(logits[f"mpe_{fam}"], batch["mpe"])
            tot += ce(logits[f"velocity_{fam}"], batch["velocity"])
        return tot

    def loss_bwd(logits, batch):
        return jax.grad(loss)(logits, batch)

    def seeds(key):
        outs = []
        for i in range(9):
            outs.append(jax.random.randint(
                jax.random.fold_in(key, 1000 + i), (), 0, 2 ** 31 - 1,
                dtype=jnp.int32))
        return jnp.stack(outs)

    key = jax.random.key(3)

    results = {
        "heads_A_fwd": timeit(heads_A, (trg, heads_w)),
        "heads_A_fwd+bwd": timeit(heads_A_bwd, (trg, heads_w)),
        "heads_B_fwd": timeit(heads_B, (t2, heads_w)),
        "heads_B_fwd+bwd": timeit(heads_B_bwd, (t2, heads_w)),
        "glue_fwd": timeit(glue, (trg,)),
        "glue_fwd+bwd": timeit(glue_bwd, (trg,)),
        "loss_fwd": timeit(loss, (logits, batch)),
        "loss_fwd+bwd": timeit(loss_bwd, (logits, batch)),
        "seeds": timeit(seeds, (key,)),
    }
    for k, v in results.items():
        print(f"{k:>16}: {v:7.2f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
