"""Train state + pjit data-parallel train step.

Reference parity: the optimizer/driver part of ``train.py`` (recon) —
SGD-family optimizer with warmup schedule, per-iteration loss, checkpointing
hooks. TPU-native: one jitted `train_step` (forward S-step scan + backward +
optimizer update compiled together), sharded over the mesh with batch on the
'data' axis and state replicated — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector
from step_tpu.parallel.mesh import batch_sharding, replicated_sharding
from step_tpu.train.losses import step_losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_schedule(cfg: StepConfig) -> optax.Schedule:
    """LR schedule per cfg.lr_schedule: warmup-cosine (default) or the
    reference's MultiStepLR shape — linear warmup into a constant LR with
    multiplicative `lr_decay_rate` drops at `lr_decay_milestones`."""
    if cfg.lr_schedule == "step":
        milestones = tuple(int(m) for m in cfg.lr_decay_milestones)

        def sched(step):
            step = jnp.asarray(step)
            warm = (jnp.minimum(step / cfg.warmup_steps, 1.0)
                    if cfg.warmup_steps else 1.0)
            # milestones are ABSOLUTE steps (join_schedules would re-base
            # them after warmup — torch MultiStepLR semantics kept instead)
            drops = sum((step >= m).astype(jnp.float32) for m in milestones)
            return cfg.learning_rate * warm * cfg.lr_decay_rate ** drops

        return sched
    if cfg.lr_schedule != "warmup_cosine":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )


def make_optimizer(cfg: StepConfig) -> optax.GradientTransformation:
    """`make_schedule` with AdamW (default) or SGD+momentum (the
    reference's optimizer, `cfg.optimizer="sgd"`)."""
    schedule = make_schedule(cfg)
    if cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    elif cfg.adam_moments == "int8":
        from step_tpu.train.optim_int8 import adamw_int8

        # int8 blockwise moments: ~2.03 bytes/param resident optimizer
        # state vs 8 (the single-chip HBM lever — see optim_int8.py)
        opt = adamw_int8(schedule, weight_decay=cfg.weight_decay)
    else:
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay,
                          mu_dtype=jnp.dtype(cfg.adam_mu_dtype))
    opt = optax.chain(optax.clip_by_global_norm(10.0), opt)
    if cfg.freeze_submodules:
        # Finetune policy: frozen top-level subtrees get set_to_zero
        # updates (optax.masked would pass their RAW gradients through
        # unchanged — not freezing); the trainable partition runs the full
        # chain, so the global-norm clip sees only trainable params.
        frozen = frozenset(cfg.freeze_submodules)
        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()},
            lambda params: {k: ("frozen" if k in frozen else "train")
                            for k in params})
    return opt


def create_train_state(
    cfg: StepConfig, rng: jax.Array, model: Optional[STEPDetector] = None
) -> TrainState:
    model = model or STEPDetector(cfg)
    # Init on CPU unconditionally: on-device init of the full detector
    # costs minutes of remote compile on the relay-tunneled TPU
    # (utils/init.py); the first jitted train step moves the CPU-resident
    # state to its device sharding anyway.
    from step_tpu.utils.init import init_detector_cpu

    variables = init_detector_cpu(cfg, rng, model)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def train_step(state: TrainState, batch: dict, rng: jax.Array,
               cfg: StepConfig, model: STEPDetector):
    """One optimizer step. `batch` keys: rgb, (flow), proposals, prop_mask,
    gt_tubes, gt_labels, gt_mask.

    With ``cfg.grad_accum_steps = k > 1`` the batch (still the EFFECTIVE
    batch) is split into k equal micro-batches and scanned, accumulating
    the micro-mean gradient and batch-stats update into ONE optimizer step
    (reference multi-GPU DataParallel effective batch (recon §3.1),
    single-chip analogue) — memory scales with the micro-batch. Semantics
    documented on the config field."""

    dropout_rng = jax.random.fold_in(rng, state.step)
    # flow-stream detectors (late-fusion protocol) train on the flow tensor
    # as the primary input; the secondary flow arg is only for two_stream
    if cfg.input_stream != "rgb" and "flow" not in batch:
        raise ValueError(
            f"input_stream={cfg.input_stream!r} training needs a "
            "flow-enabled dataset (batch has no 'flow'; use "
            "UCFDataset(with_flow=True) — synthetic/AVA carry no flow)")

    # Finetune policy: differentiate ONLY the trainable partition — with
    # frozen params held as constants, XLA stops the backward pass at the
    # frozen subtree's boundary (e.g. a frozen trunk skips the whole
    # backbone backward, the torch requires_grad_(False) saving), instead
    # of computing gradients that set_to_zero would discard.
    frozen_names = frozenset(cfg.freeze_submodules)
    frozen_params = {k: v for k, v in state.params.items()
                     if k in frozen_names}

    def loss_fn(trainable, mb, drng):
        params = {**trainable, **frozen_params}
        primary = mb["rgb"] if cfg.input_stream == "rgb" else mb["flow"]
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            primary,
            mb["proposals"],
            mb.get("flow") if cfg.two_stream else None,
            train=True,
            rngs={"dropout": drng},
            mutable=["batch_stats"],
        )
        loss, metrics = step_losses(
            outputs,
            mb["gt_tubes"],
            mb["gt_labels"],
            mb["gt_mask"],
            mb["prop_mask"],
            cfg,
        )
        return loss, (metrics, mutated["batch_stats"])

    trainable = {k: v for k, v in state.params.items()
                 if k not in frozen_names}
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = cfg.grad_accum_steps
    if accum == 1:
        (loss, (metrics, new_bs)), grads = grad_fn(
            trainable, batch, dropout_rng)
    else:
        B = batch["rgb"].shape[0]
        if B % accum:
            raise ValueError(f"batch dim {B} not divisible by "
                             f"grad_accum_steps={accum}")

        def _split(x):
            return x.reshape((accum, B // accum) + x.shape[1:])

        micro = jax.tree_util.tree_map(_split, dict(batch))
        drngs = jax.random.split(dropout_rng, accum)

        def _body(acc, xs):
            mb, drng = xs
            (_, (m, bs)), g = grad_fn(trainable, mb, drng)
            acc_g, acc_bs, acc_m = acc
            add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
            return (add(acc_g, g), add(acc_bs, bs), add(acc_m, m)), None

        # zero accumulators with EXACTLY grad_fn's output pytree structure
        # (incl. FrozenDict-vs-dict node types) via eval_shape — no FLOPs
        (_, (m_s, bs_s)), g_s = jax.eval_shape(
            grad_fn, trainable,
            jax.tree_util.tree_map(lambda x: x[0], micro), drngs[0])
        zeros = lambda t: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), t)
        init = (zeros(g_s), zeros(bs_s), zeros(m_s))
        (g_sum, bs_sum, m_sum), _ = jax.lax.scan(
            _body, init, (micro, drngs))
        inv = 1.0 / accum
        scale = lambda t: jax.tree_util.tree_map(lambda x: x * inv, t)
        grads = scale(g_sum)
        # mean-semantics metrics (losses) scale by 1/k so they match the
        # equivalent one-big-step values; SUM-semantics metrics keep the
        # sum over all k micro-batches (num_positive_per_step counts
        # matched positives across the EFFECTIVE batch — averaging would
        # report k-fold fewer positives than an accum=1 step on the same
        # effective batch).
        metrics = {k: (v if k == "num_positive_per_step" else v * inv)
                   for k, v in m_sum.items()}
        # mean of the k one-step updates == the one-big-step update for
        # running means (linear in the batch statistic); see config note.
        new_bs = scale(bs_sum)
    metrics["grad_norm"] = optax.global_norm(grads)  # trainable-only norm
    if frozen_params:
        # shape-completing zeros for tx.update; set_to_zero never reads them
        grads = {**grads, **jax.tree_util.tree_map(jnp.zeros_like,
                                                   frozen_params)}
    if isinstance(state.params, FrozenDict):
        grads = FrozenDict(grads)  # match the params pytree type
    new_state = state.apply_gradients(grads, new_bs)
    return new_state, metrics


def make_parallel_train_step(cfg: StepConfig, model: STEPDetector, mesh: Mesh,
                             donate_batch: bool = False):
    """jit `train_step` with batch sharded over 'data', state replicated.

    XLA/GSPMD inserts the gradient all-reduce over ICI — the TPU-native
    replacement for the reference's DataParallel scatter/gather.

    `donate_batch`: also donate the batch buffers (each batch is consumed
    once per step in every driver) so XLA may reuse the rgb upload buffer
    as scratch. A/B knob — see VALIDATION.md before changing the default.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def _step(state, batch, rng):
        return train_step(state, batch, rng, cfg, model)

    return jax.jit(
        _step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0, 1) if donate_batch else (0,),
    )


def eval_forward(state: TrainState, batch: dict, cfg: StepConfig, model: STEPDetector):
    """Inference forward (no dropout, running BN stats)."""
    return model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["rgb"] if cfg.input_stream == "rgb" else batch["flow"],
        batch["proposals"],
        batch.get("flow") if cfg.two_stream else None,
        train=False,
    )
