"""Jitted train/eval steps and the loss.

Loss composition mirrors the reference (``training/train.py:141-153`` +
``m_training.py:149-157``): per head family (A = stage-1 "freq", B = stage-2
"time"), BCE on onset/offset/mpe plus cross-entropy on the 128-class velocity,
summed, then ``weight_A * loss_A + weight_B * loss_B``.

Documented divergence: the reference applies ``nn.BCELoss`` to sigmoid
outputs; we keep the heads as logits and use sigmoid-BCE-with-logits (optax)
— same optimum, numerically stable on TPU (SURVEY.md §7 hard-part 3).

Batches may carry a ``valid`` row mask (static-shape padding of the last
batch); masked rows contribute zero loss and the mean divides by the number
of valid rows only.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nylon_amt_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # BatchNorm running stats (cnnblock_safreq ablation encoder); None for
    # the main model.
    batch_stats: Any = None

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state)


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Adam (torch defaults: b1=.9 b2=.999 eps=1e-8 — ``m_training.py:146``),
    with a runtime-adjustable learning rate for the plateau scheduler and
    optional global-norm clipping (the reference parses ``-clip`` but never
    uses it; we implement it for real, default off).

    The Adam update runs on the FLATTENED parameter vector
    (``optax.flatten``): per-leaf updates over the model's 165 small
    tensors cost ~6.5 ms/step in per-fusion launch overhead on the v5e vs
    ~2.6 ms flattened (the elementwise math is identical, so training
    trajectories are unchanged; only the opt-state layout differs —
    ``mu``/``nu`` are stored as one flat f32 vector each)."""
    t = config.train

    def make(learning_rate):
        parts = []
        if t.clip is not None:
            parts.append(optax.clip_by_global_norm(t.clip))
        parts.append(optax.flatten(optax.adam(learning_rate, eps=1e-8)))
        return optax.chain(*parts)

    return optax.inject_hyperparams(make)(learning_rate=t.lr)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate (used on plateau reductions)."""
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams,
                     "learning_rate": jnp.asarray(lr, jnp.float32)})


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def loss_fn(
    config: Config,
    apply_fn: Callable,
    params: Any,
    batch: dict,
    dropout_rng: jax.Array | None = None,
    batch_stats: Any = None,
    denom: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Compute the weighted loss. Returns ``(loss, (metrics, new_stats))``
    when batch_stats is given (training a BatchNorm model), else
    ``(loss, metrics)``.

    Models without a second stage ("cafreq" ablation decoder) emit only the
    A heads; the B terms are skipped then (reference ``train_ablation.py``
    single-mode loss)."""
    deterministic = dropout_rng is None
    rngs = None if deterministic else {"dropout": dropout_rng}
    new_stats = None
    if batch_stats is not None and not deterministic:
        out, updates = apply_fn(
            {"params": params, "batch_stats": batch_stats}, batch["spec"],
            deterministic=deterministic, rngs=rngs, mutable=["batch_stats"])
        new_stats = updates["batch_stats"]
    elif batch_stats is not None:
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       batch["spec"], deterministic=deterministic, rngs=rngs)
    else:
        out = apply_fn({"params": params}, batch["spec"],
                       deterministic=deterministic, rngs=rngs)

    valid = batch.get("valid")
    B = batch["spec"].shape[0]
    if valid is None:
        valid = jnp.ones((B,), jnp.float32)
    # Per-row weights; normalizer counts valid rows (matching per-element
    # mean over valid rows). A caller running data-parallel shards passes
    # the GLOBAL valid count so per-shard partial losses psum to the exact
    # single-device loss.
    if denom is None:
        denom = jnp.maximum(valid.sum(), 1.0)

    def bce(logits, targets):
        per = optax.sigmoid_binary_cross_entropy(logits, targets)
        per = per.mean(axis=tuple(range(1, per.ndim)))        # mean per row
        return (per * valid).sum() / denom

    def ce(logits, labels):
        # Same math as optax.softmax_cross_entropy_with_integer_labels
        # (bit-identical values), but the label logit is extracted with a
        # lane-wise masked reduce instead of take_along_axis: a gather
        # along the 128-lane class axis (and its scatter-add transpose in
        # the backward) defeats XLA fusion on TPU — measured 3.4 ms/step on
        # the two [B,128,88,128] velocity CE terms vs ~1 ms fused.
        lg = logits.astype(jnp.float32)
        shifted = lg - jax.lax.stop_gradient(
            jnp.max(lg, axis=-1, keepdims=True))
        lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
        onehot = labels[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, lg.shape, lg.ndim - 1)
        label_logit = jnp.sum(jnp.where(onehot, shifted, 0.0), axis=-1)
        per = lse - label_logit
        per = per.mean(axis=tuple(range(1, per.ndim)))
        return (per * valid).sum() / denom

    metrics = {}
    totals = {}
    fams = ("A", "B") if "onset_B" in out else ("A",)
    for fam in fams:
        l_on = bce(out[f"onset_{fam}"], batch["onset"])
        l_off = bce(out[f"offset_{fam}"], batch["offset"])
        l_mpe = bce(out[f"mpe_{fam}"], batch["mpe"])
        l_vel = ce(out[f"velocity_{fam}"], batch["velocity"])
        totals[fam] = l_on + l_off + l_mpe + l_vel
        metrics.update({f"loss_onset_{fam}": l_on, f"loss_offset_{fam}": l_off,
                        f"loss_mpe_{fam}": l_mpe, f"loss_velocity_{fam}": l_vel})
        # Tab head (ModelConfig.tab_head): string-class CE over the same
        # time-pitch grid, velocity-style (class 0 dominates off-onset cells).
        # Trained only when the batch carries string labels — a tab-head
        # model fine-tuning on unannotated (piano) data skips the term.
        if f"string_{fam}" in out and "string" in batch:
            l_str = ce(out[f"string_{fam}"], batch["string"])
            totals[fam] = totals[fam] + l_str
            metrics[f"loss_string_{fam}"] = l_str

    loss = config.train.weight_A * totals["A"]
    if "B" in totals:
        loss = loss + config.train.weight_B * totals["B"]
    metrics["loss"] = loss
    if batch_stats is not None:
        return loss, (metrics, new_stats)
    return loss, metrics


def make_train_step(config: Config, mesh=None, fused_apply: Callable | None
                    = None):
    """Build the jitted train step: ``(state, batch, dropout_rng) -> (state,
    metrics)``.

    On TPU with the Pallas path and a covered architecture, the forward/
    backward run through the whole-layer fused training kernels
    (``models/fused_train.py``) — one fwd + one analytic bwd kernel per
    layer, dropout on the in-kernel PRNG — instead of the XLA autodiff
    graph.

    Multi-device: pass the Trainer's ``mesh``. The flax path relies on
    jit + NamedSharding (XLA inserts the gradient psums). Pallas kernels
    cannot be auto-partitioned by the SPMD partitioner, so the fused path
    under a DP mesh runs inside ``shard_map``: each device computes grads
    for its batch shard against the GLOBAL valid-count denominator and the
    grads/metrics are psum'd — exactly the single-device math. With tensor
    parallelism (model axis > 1) the fused path is disabled and the flax
    jit-sharding path is used.

    ``fused_apply`` overrides the auto-selection (tests pass an
    interpret-mode apply to exercise the shard_map path on the CPU mesh).
    """
    from nylon_amt_tpu.models import fused_train
    from nylon_amt_tpu.models.hft import resolve_attention_impl
    from nylon_amt_tpu.ops.attention import on_tpu
    from nylon_amt_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if fused_apply is None and (
            fused_train.supports(config) and on_tpu()
            and resolve_attention_impl(
                config.model.attention_impl) == "pallas"):
        fused_apply = fused_train.make_fused_apply(config)
    if fused_apply is not None and mesh is not None \
            and mesh.shape.get(MODEL_AXIS, 1) > 1:
        fused_apply = None              # TP: use the flax jit-sharding path

    if fused_apply is not None and mesh is not None:
        from jax.sharding import PartitionSpec as P

        def shard_grads(params, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            valid = batch.get("valid")
            local = (valid.sum() if valid is not None
                     else jnp.float32(batch["spec"].shape[0]))
            denom = jnp.maximum(
                jax.lax.psum(local, DATA_AXIS), 1.0)
            grad_fn = jax.value_and_grad(
                lambda p: loss_fn(config, fused_apply, p, batch, rng,
                                  denom=denom), has_aux=True)
            (_, metrics), grads = grad_fn(params)
            grads = jax.lax.psum(grads, DATA_AXIS)
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.psum(m, DATA_AXIS), metrics)
            return grads, metrics

        mapped = jax.shard_map(
            shard_grads, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()), out_specs=(P(), P()),
            check_vma=False)  # pallas_call outputs carry no vma metadata

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: dict,
                       dropout_rng: jax.Array):
            rng = jax.random.fold_in(dropout_rng, state.step)
            grads, metrics = mapped(state.params, batch, rng)
            return state.apply_gradients(grads), metrics

        return train_step

    body = _make_step_body(config, fused_apply)
    train_step = functools.partial(jax.jit, donate_argnums=(0,))(body)
    return train_step


def _make_step_body(config: Config, fused_apply: Callable | None):
    """The unjitted single-device step body — shared by the eager jitted
    step and the Trainer's device-side epoch scan (``lax.scan`` over the
    whole epoch inlines this body once per trace)."""

    def step_body(state: TrainState, batch: dict, dropout_rng: jax.Array):
        rng = jax.random.fold_in(dropout_rng, state.step)
        apply_fn = fused_apply or state.apply_fn
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(config, apply_fn, p, batch, rng,
                              state.batch_stats),
            has_aux=True)
        (_, aux), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads)
        if state.batch_stats is not None:
            metrics, new_stats = aux
            new_state = new_state.replace(batch_stats=new_stats)
        else:
            metrics = aux
        return new_state, metrics

    return step_body


def make_epoch_scan(config: Config, gather_fn: Callable,
                    fused_apply: Callable | None = None):
    """Device-side epoch executor: ONE jitted ``lax.scan`` over every train
    step of an epoch, with window gathers in-graph.

    ``gather_fn(dev, starts) -> batch`` is the device dataset's gather
    (``data/device_windows.py``); the scan consumes ``starts [n_steps, B]``
    + ``valid [n_steps, B]`` and returns the post-epoch state plus the
    per-step loss vector. Host<->device traffic per epoch: one int32
    positions upload and one loss-vector fetch — the per-step dispatch and
    H2D transfer that dominate small-model training through the tunnel
    (measured 169 -> 84 -> ~25 ms/step host-loop vs scan) disappear.

    Numerics are identical to the eager step loop: the same step body, the
    same per-step ``fold_in(dropout_rng, state.step)`` stream, the same
    valid-mask denominators (pinned by ``tests/test_train.py``).
    """
    from nylon_amt_tpu.models import fused_train
    from nylon_amt_tpu.models.hft import resolve_attention_impl
    from nylon_amt_tpu.ops.attention import on_tpu

    if fused_apply is None and (
            fused_train.supports(config) and on_tpu()
            and resolve_attention_impl(
                config.model.attention_impl) == "pallas"):
        fused_apply = fused_train.make_fused_apply(config)
    body = _make_step_body(config, fused_apply)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_scan(state: TrainState, dev: dict, starts, valid,
                   dropout_rng: jax.Array):
        def scan_body(state, xs):
            st, v = xs
            batch = dict(gather_fn(dev, st))
            batch["valid"] = v
            state, metrics = body(state, batch, dropout_rng)
            return state, metrics["loss"]

        return jax.lax.scan(scan_body, state, (starts, valid))

    return epoch_scan


def make_eval_step(config: Config, mesh=None):
    """Build the jitted validation-loss step.

    Deterministic forwards route through the fused-layer inference engine
    (``infer/engine.py``) when it covers the architecture and the Pallas
    path is active — validation epochs then run at transcription speed.
    Under a mesh the flax path is used (Pallas kernels cannot be
    auto-partitioned; eval throughput is not the bottleneck there)."""
    from nylon_amt_tpu.infer import engine
    from nylon_amt_tpu.models.hft import resolve_attention_impl
    from nylon_amt_tpu.ops.attention import on_tpu

    use_engine = (engine.supports(config) and on_tpu() and mesh is None
                  and resolve_attention_impl(
                      config.model.attention_impl) == "pallas")

    def engine_apply(variables, spec, deterministic=True, rngs=None):
        return engine.forward(variables["params"], spec, config)

    @jax.jit
    def eval_step(state: TrainState, batch: dict) -> dict:
        apply_fn = engine_apply if use_engine else state.apply_fn
        _, aux = loss_fn(config, apply_fn, state.params, batch,
                         batch_stats=state.batch_stats)
        return aux[0] if state.batch_stats is not None else aux

    return eval_step


def create_train_state(config: Config, rng: jax.Array,
                       batch_size: int = 1) -> TrainState:
    from nylon_amt_tpu.models.hft import build_model

    model = build_model(config)
    spec = jnp.zeros((batch_size, config.feature.n_bins, config.window_frames),
                     jnp.float32)
    variables = model.init({"params": rng}, spec, deterministic=True)
    # From-scratch init parity: the reference applies initialize_weights
    # (xavier_uniform on every torch-dim>1 weight; torch-default biases)
    # before training (m_training.py:141). See models/init.py.
    from nylon_amt_tpu.models.init import reference_initialize

    params = reference_initialize(variables["params"], rng)
    tx = make_optimizer(config)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
                      batch_stats=variables.get("batch_stats"))
