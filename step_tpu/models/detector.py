"""STEPDetector — the progressive refinement loop as one compiled program.

Reference parity: the per-step Python loop in ``train.py`` (recon):
pool → heads → decode → (temporal extension) → next step's proposals.
Here the whole S-step loop is a **fixed-trip-count `flax.linen.scan`** over
stacked per-step head params (the BASELINE north-star requirement), so the
iterative proposal refinement compiles to a single XLA program with no
host round-trips:

  carry = (feat, ctx, tubes); xs = step index
  step body:
    frame_mask_s = chunk activity for step s (temporal extension 6→18)
    pooled   = tube ROI-align of `tubes` on the shared feature map
    cls, Δ   = TwoBranchHead_s(pooled, ctx)          (per-step params)
    decoded  = decode(Δ, tubes) on active frames
    tubes'   = linear-motion extrapolation into not-yet-active frames

Outputs stack every step's logits / proposals / decoded tubes so training
can supervise all steps (the reference sums per-step losses) and inference
can read the final step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from step_tpu.config import StepConfig
from step_tpu.models.nets import FeatureNet, ContextNet, TwoBranchHead
from step_tpu.preprocess import device_preprocess, device_preprocess_flow
from step_tpu.ops.roi_align import feature_time_indices, tube_roi_align
from step_tpu.tubes.boxes import decode_boxes, clip_boxes
from step_tpu.tubes.tube_ops import chunk_frame_mask, extrapolate_tubes
from step_tpu.tubes.proposals import initial_cuboids


class _StepBody(nn.Module):
    """One refinement step — scanned over stacked per-step params."""

    cfg: StepConfig

    @nn.compact
    def __call__(self, carry, *args):
        cfg = self.cfg
        # Two scan conventions (cfg.scan_broadcast_inputs):
        #   legacy: carry = (feat, ctx, tubes), args = (step_idx,) — the
        #     loop-invariant feature map rides the scan CARRY, which the
        #     backward scan also threads and stacks;
        #   broadcast: carry = tubes only, args = (feat, ctx, step_idx)
        #     with feat/ctx as nn.broadcast scan inputs — invariants enter
        #     the loop as constants, not carried state.
        # Identical math either way (parity-tested); param tree unchanged.
        broadcast = len(args) == 3
        if broadcast:
            tubes, (feat, ctx, step_idx) = carry, args
        else:
            (feat, ctx, tubes), (step_idx,) = carry, args
        # feat [B,T',H',W',C]; tubes [B,P,T,4]
        B, P, T = tubes.shape[0], tubes.shape[1], tubes.shape[2]
        Tp = feat.shape[1]

        # Frame activity for this step (temporal extension).
        fmask = chunk_frame_mask(
            step_idx, cfg.num_chunks, cfg.frames_per_chunk, cfg.temporal_extension
        )                                   # [T]
        t_idx = feature_time_indices(T, Tp)
        tpmask = jnp.take(fmask, t_idx)     # [T'] — feature slices active now

        # Tube-of-interest pooling on the shared feature map.
        if cfg.roi_impl == "pallas":
            from step_tpu.ops.roi_align_pallas import tube_roi_align_pallas

            pooled = tube_roi_align_pallas(
                feat, tubes, cfg.pooled_size, 1.0 / cfg.feature_stride,
                cfg.sampling_ratio,
            )                               # [B, P, T', 7, 7, C]
        elif cfg.roi_impl == "kron":
            from step_tpu.ops.roi_align import batched_tube_roi_align_kron

            pooled = batched_tube_roi_align_kron(
                feat, tubes, cfg.pooled_size, 1.0 / cfg.feature_stride,
                cfg.sampling_ratio,
            )                               # [B, P, T', 7, 7, C]
        else:
            pooled = jax.vmap(
                lambda f, tb: tube_roi_align(
                    f, tb, cfg.pooled_size, 1.0 / cfg.feature_stride,
                    cfg.sampling_ratio, impl=cfg.roi_impl,
                )
            )(feat, tubes)                  # [B, P, T', 7, 7, C]
        # head_compact: only the first `active_proposals` slots can ever
        # hold a real proposal (initial_cuboids_np + build_model_batch fill
        # padding at the tail) — run the expensive per-step tail + heads on
        # those rows only and zero-pad the outputs back. Padding slots are
        # never supervised and are score-masked at the surface, so this is
        # exact for every consumer.
        Pa = min(P, cfg.active_proposals) if cfg.head_compact else P
        pooled = pooled[:, :Pa].reshape(
            B * Pa, Tp, cfg.pooled_size, cfg.pooled_size, -1)

        ctx_flat = None
        if ctx is not None:
            ctx_flat = jnp.broadcast_to(ctx[:, None, :], (B, Pa, ctx.shape[-1]))
            ctx_flat = ctx_flat.reshape(B * Pa, -1)

        head = TwoBranchHead(
            num_cls_outputs=cfg.num_cls_outputs,
            num_frames=T,
            dropout_rate=cfg.dropout_rate,
            depth=cfg.backbone_depth,
            fuse_bn_relu=cfg.fused_bn_relu,
            bn_folded=cfg.bn_folded,
            fused_inception=cfg.fused_inception,
            fused_inception3=cfg.fused_inception3 in ("tail", "all"),
            conv_impl=cfg.conv3d_impl,
            reg_head=cfg.reg_head,
            cls_bias_init=(
                float(np.log(cfg.cls_prior / (1.0 - cfg.cls_prior)))
                if cfg.multilabel else 0.0
            ),
            dtype=jnp.dtype(cfg.compute_dtype),
            name="head",
        )
        cls_logits, deltas = head(pooled, ctx_flat, tpmask, train=self.is_train())
        cls_logits = cls_logits.reshape(B, Pa, -1)
        deltas = deltas.reshape(B, Pa, T, 4)
        if Pa < P:
            cls_logits = jnp.pad(cls_logits, ((0, 0), (0, P - Pa), (0, 0)))
            deltas = jnp.pad(deltas, ((0, 0), (0, P - Pa), (0, 0), (0, 0)))

        # Decode on active frames; inactive frames are filled by linear-motion
        # extrapolation (the reference's temporal extension between steps).
        decoded = decode_boxes(deltas, tubes, cfg.box_variances)
        decoded = clip_boxes(decoded, cfg.image_size, cfg.image_size)
        filled = extrapolate_tubes(
            decoded * fmask[:, None], fmask, float(cfg.image_size)
        )
        new_tubes = jax.lax.stop_gradient(filled)

        outputs = {
            "cls_logits": cls_logits,   # [B, P, ncls]
            "deltas": deltas,           # [B, P, T, 4]
            "proposals": tubes,         # [B, P, T, 4] — anchors of this step
            "tubes": filled,            # [B, P, T, 4] — refined (extension-filled)
            "frame_mask": fmask,        # [T]
        }
        if broadcast:
            return new_tubes, outputs
        return (feat, ctx, new_tubes), outputs

    def is_train(self) -> bool:
        # frozen refinement steps (finetune policy) run eval-mode BN/dropout
        return (self.has_rng("dropout")
                and "steps" not in self.cfg.freeze_submodules)


def make_step_loop(cfg: StepConfig, train: bool = False):
    """The S-step refinement scan, constructed in ONE place for both entry
    points (STEPDetector.__call__ and inference.refine_from_features):
    per-step params stacked on axis 0, either scan convention
    (cfg.scan_broadcast_inputs — loop-invariant feat/ctx as nn.broadcast
    INPUTS instead of carried state the backward scan must thread and
    stack), optional lifted remat of the step body when training
    (jax.checkpoint: recompute tail/head activations instead of storing S
    copies — the standard TPU HBM-for-FLOPs trade; prevent_cse is safe to
    disable inside scan since XLA cannot CSE across iterations), and the
    cfg.scan_unroll serving lowering (+1.6% measured, bit-exact)."""
    Body = _StepBody
    if cfg.remat_steps and train:
        policy = (jax.checkpoint_policies.checkpoint_dots
                  if cfg.remat_policy == "dots" else None)
        Body = nn.remat(_StepBody, prevent_cse=False, policy=policy)
    return nn.scan(
        Body,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=((nn.broadcast, nn.broadcast, 0)
                 if cfg.scan_broadcast_inputs else 0),
        out_axes=0,
        length=cfg.num_steps,
        unroll=cfg.num_steps if cfg.scan_unroll else 1,
    )


def step_loop_args(cfg: StepConfig, feat, ctx, proposals):
    """Positional args for a make_step_loop instance under the active scan
    convention — shared by the lifted (`Loop(cfg, name='steps')(...)`) and
    the `.apply(svars, ...)` call sites."""
    p = proposals.astype(jnp.float32)
    steps = jnp.arange(cfg.num_steps)
    if cfg.scan_broadcast_inputs:
        return (p, feat, ctx, steps)
    return ((feat, ctx, p), steps)


class STEPDetector(nn.Module):
    """Full detector: backbone + context + S-step progressive refinement."""

    cfg: StepConfig

    @nn.compact
    def __call__(
        self,
        rgb: jnp.ndarray,                       # [B, T, H, W, 3] uint8 or [0,1]
        proposals: jnp.ndarray,                 # [B, P, T, 4]
        flow: Optional[jnp.ndarray] = None,     # [B, T, H, W, 2] in [-1, 1]
        train: bool = False,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        # Normalization happens on device, inside the compiled program, so
        # host→device transfers can stay uint8/[0,1] (north-star fused
        # preprocessing). XLA folds the affine into the first conv.
        # A flow-input detector (late-fusion protocol) receives 2-channel
        # [-1,1] flow as its primary input — already normalized.
        if cfg.input_stream == "rgb":
            rgb = device_preprocess(rgb)
        else:
            rgb = device_preprocess_flow(rgb)
        if flow is not None:
            flow = device_preprocess_flow(flow)
        # Frozen subtrees (cfg.freeze_submodules, finetune policy) run in
        # eval mode even during training: BN uses running averages and
        # writes no stats — torch's requires_grad_(False)+m.eval() idiom.
        feat_train = train and "features" not in cfg.freeze_submodules
        ctx_train = train and "context" not in cfg.freeze_submodules
        feat = FeatureNet(two_stream=cfg.two_stream, depth=cfg.backbone_depth,
                           s2d=cfg.stem_s2d, fuse_bn_relu=cfg.fused_bn_relu,
                           bn_folded=cfg.bn_folded,
                           fused_inception=cfg.fused_inception,
                           fused_inception3=cfg.fused_inception3 == "all",
                           conv_impl=cfg.conv3d_impl,
                           chunk_stem=cfg.chunk_stem,
                           num_chunks=cfg.num_chunks,
                           dtype=dtype, name="features")(
            rgb.astype(dtype), None if flow is None else flow.astype(dtype),
            feat_train
        )
        ctx = None
        if cfg.use_context:
            ctx = ContextNet(dtype=dtype, name="context")(feat, ctx_train)

        Loop = make_step_loop(cfg, train)
        _, outputs = Loop(cfg, name="steps")(
            *step_loop_args(cfg, feat, ctx, proposals))
        return outputs

    # ------------------------------------------------------------- helpers
    @staticmethod
    def initial_proposals(cfg: StepConfig, batch_size: int):
        """[B, P, T, 4] initial cuboids + [B, P] validity mask."""
        tubes, mask = initial_cuboids(cfg.image_size, cfg.total_frames,
                                      cfg.max_proposals, cfg.cuboid_layout)
        return (
            jnp.broadcast_to(tubes[None], (batch_size, *tubes.shape)),
            jnp.broadcast_to(mask[None], (batch_size, mask.shape[0])),
        )
