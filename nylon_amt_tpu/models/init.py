"""From-scratch weight initialization matching the reference recipe.

The reference starts every from-scratch training run with
``model.apply(initialize_weights)`` (``m_training.py:141``), where

    def initialize_weights(m):                      # m_training.py:31-33
        if hasattr(m, 'weight') and m.weight.dim() > 1:
            nn.init.xavier_uniform_(m.weight.data)

i.e. **xavier_uniform on every parameter tensor whose torch shape has
dim > 1** — all Linears (FFN ``fc_1``/``fc_2``, every attention projection,
all eight output heads, ``fc_convert``), every ``nn.Embedding`` table
(``pos_embedding_freq/time`` and the note queries), and every Conv2d —
while **biases keep torch's module defaults**: ``U(±1/sqrt(fan_in))`` for
Linear/Conv2d (``torch.nn.Linear.reset_parameters``), zeros for LayerNorm.
LayerNorm/BatchNorm weights are dim-1 and stay at their default of ones.

Flax's defaults differ on both counts (Dense kernels are lecun_normal,
``nn.Embed`` tables fan-in normal, Dense biases zeros), so a "same recipe"
from-scratch run would start from a measurably different distribution —
e.g. at hid 256 the time/freq position embeddings get xavier bound ≈ 0.19
vs flax's fan-in σ ≈ 0.06. :func:`reference_initialize` resamples a flax
param tree to the reference's exact per-tensor distributions, computing
fans from the **torch** layout of each tensor (our stem conv is stored
``[C, k]`` for torch's ``[C, 1, 1, k]``; Dense kernels are ``weight.T`` —
xavier's fan-avg bound is transpose-invariant, conv fans are not).

Torch fan rules (``torch.nn.init._calculate_fan_in_and_fan_out``):

* Linear ``[out, in]``: fan_in = in, fan_out = out.
* Embedding ``[num, dim]``: fan_in = dim, fan_out = num (bound symmetric).
* ConvNd ``[O, I, *k]``: fan_in = I*prod(k), fan_out = O*prod(k).

xavier_uniform bound = sqrt(6 / (fan_in + fan_out)); bias bound =
1/sqrt(fan_in) of the owning layer's weight.
"""

from __future__ import annotations

import zlib

import jax
import numpy as np


def torch_fans(path: tuple[str, ...], shape: tuple[int, ...]):
    """(fan_in, fan_out) of the torch-layout tensor behind a flax leaf.

    Returns ``None`` for leaves the reference's ``initialize_weights``
    skips (LayerNorm/BatchNorm scale — torch dim 1) and for biases.
    """
    name = path[-1]
    if name == "embedding":                      # nn.Embedding [num, dim]
        return shape[1], shape[0]
    if name == "conv_kernel":                    # stem Conv2d(1,C,(1,k)) as [C,k]
        c, k = shape
        return k, c * k
    if name.endswith("kernel"):
        if len(shape) == 4:                      # nn.Conv HWIO <- torch OIHW
            kh, kw, i, o = shape
            return i * kh * kw, o * kh * kw
        if len(shape) == 2:                      # Dense kernel = Linear w.T
            return shape[0], shape[1]
    return None


def reference_initialize(params, rng: jax.Array):
    """Resample ``params`` per the reference's from-scratch recipe.

    Every leaf whose torch counterpart has dim > 1 gets
    ``xavier_uniform`` (torch fans); every Linear/Conv bias gets torch's
    module default ``U(±1/sqrt(fan_in))``; LayerNorm/BatchNorm leaves are
    left untouched (ones/zeros — identical in torch and flax). Per-leaf
    streams are seeded by (path hash, key data), so the result is
    deterministic in ``rng``, independent of traversal order and of model
    topology elsewhere in the tree — and identical across multi-host
    processes. Sampling runs HOST-SIDE (numpy Philox): ~200 eager per-leaf
    device ops would each pay a tunnel round trip + remote compile here,
    turning init into minutes on TPU.
    """
    key_data = np.asarray(jax.random.key_data(rng)).ravel()
    seeds = [int(x) for x in key_data]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    # Map each node dict path -> fan_in of its kernel, so biases can find
    # their owning layer's fans without relying on traversal order.
    fans_by_path: dict[tuple, tuple] = {}
    for kp, leaf in flat:
        path = tuple(str(k.key) for k in kp)
        f = torch_fans(path, np.shape(leaf))
        if f is not None:
            fans_by_path[path] = f

    def sample(path, shape, bound):
        gen = np.random.default_rng(
            [zlib.crc32("/".join(path).encode()), *seeds])
        return gen.uniform(-bound, bound, size=shape).astype(np.float32)

    out = []
    for kp, leaf in flat:
        path = tuple(str(k.key) for k in kp)
        shape = np.shape(leaf)
        fans = fans_by_path.get(path)
        if fans is not None:                                  # weight, dim>1
            out.append(sample(path, shape,
                              float(np.sqrt(6.0 / (fans[0] + fans[1])))))
            continue
        name = path[-1]
        if name.endswith("bias"):
            kernel_path = path[:-1] + (name[: -len("bias")] + "kernel",)
            kfans = fans_by_path.get(kernel_path)
            if kfans is not None:                             # Linear/Conv bias
                out.append(sample(path, shape,
                                  float(1.0 / np.sqrt(kfans[0]))))
                continue
        out.append(leaf)                    # LayerNorm/BatchNorm scale+bias
    return jax.tree_util.tree_unflatten(treedef, out)
