"""Frozen configuration for the step_tpu pipeline.

The reference (NVlabs/STEP) spreads configuration over per-script argparse
flags (``train.py::parse_args`` (recon)); here everything lives in one frozen
dataclass so a config hashes cleanly into jit static args and the five
BASELINE.json configs become named presets.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration — safe to close over in jitted programs."""

    # ---- dataset / task ----
    dataset: str = "ucf101_24"          # "ucf101_24" | "ava" | "synthetic"
    num_classes: int = 24               # foreground classes (background handled separately)
    multilabel: bool = False            # AVA: per-class sigmoid; UCF: softmax(+bg)

    # ---- clip geometry ----
    frames_per_chunk: int = 6           # T — frames in the central chunk
    num_chunks: int = 3                 # chunk axis [fore, mid, back]; always materialized
    image_size: int = 224               # square input resolution
    temporal_stride: int = 1            # frame sampling stride inside a chunk

    # ---- backbone ----
    backbone: str = "i3d"               # I3D (Inflated Inception-v1)
    backbone_depth: str = "full"        # "full" | "tiny" (structure-preserving
                                        #   shallow variant for CPU tests/dryruns;
                                        #   tiny has spatial stride 8 → set
                                        #   feature_stride=8 with it)
    two_stream: bool = False            # RGB + optical-flow trunks in ONE model
    # How two-stream evidence combines:
    #   "conv": end-to-end 1x1x1 feature fusion inside one model (the
    #           two_stream=True path; BASELINE config 5's "end-to-end").
    #   "late": the reference protocol — two SEPARATE single-stream
    #           detectors (input_stream "rgb" / "flow"), class scores fused
    #           pre-NMS at test time (inference.detect_clip_late_fusion).
    two_stream_fusion: str = "conv"
    # Primary input of a single-stream detector: "rgb" (3ch, normalized on
    # device) or "flow" (2ch, already in [-1,1]) — "flow" builds the second
    # detector of the late-fusion protocol.
    input_stream: str = "rgb"
    # RGB-stream weight for late score fusion (flow gets 1 - weight).
    late_fusion_weight: float = 0.5
    feature_stride: int = 16            # spatial stride at the shared-feature cut (Mixed_4f)
    compute_dtype: str = "bfloat16"     # MXU-friendly; params stay float32
    # Ship rgb batches host->device as uint8 (normalization happens on
    # device, preprocess.py). MEASURED on the relay-tunneled v5e: the f32
    # batch upload stalls the train step ~4.3 s at B=16/224px/18f (the
    # relay's device_put ack is async, real bandwidth ~43 MB/s); uint8 cuts
    # the step to 1.30 s — a 3.3x end-to-end training speedup. Lossless for
    # JPEG-sourced datasets (frames are uint8 on disk); synthetic float
    # clips quantize to 1/255.
    uint8_transfer: bool = True
    # Space-to-depth first conv: same parameters/output, ~2x better MXU
    # channel utilization on the 3-channel input (ops/stem_conv.py).
    stem_s2d: bool = True
    # 3D-conv lowering (ops/conv3d.py). MEASURED at the full-program level
    # (scripts/bench_impls.py, v5e B=64): "direct" 220 ms/batch vs "tcat"
    # 447 / "sum3" 448 — XLA-TPU already lowers the conv3d HLO well IN
    # CONTEXT and fuses its pads/epilogues, while the hand decompositions
    # materialize tap concats/shifted copies through HBM. (Standalone
    # microbenches that said otherwise were relay-memoization artifacts —
    # see scripts/bench_conv3d.py docstring.) Keep "direct"; "tcat"/"sum3"
    # stay selectable and parity-tested (tests/test_conv3d.py).
    conv3d_impl: str = "direct"
    # Process each chunk independently through the I3D stem (the
    # reference's own BaseNet semantics — per-chunk passes, no temporal
    # receptive field across chunk borders). Per-chunk features are
    # CACHEABLE across sliding clip windows (inference.
    # detect_video_stream[_batched]): each chunk's stem runs once per
    # video instead of K times. MEASURED TRADEOFF on v5e
    # (scripts/bench_stream.py, 64-clip video): despite doing 1/3 the stem
    # FLOPs, the cached path is SLOWER end-to-end (363 vs 213 ms/video) —
    # XLA-TPU's conv3d collapses on short temporal extents (the 6-frame
    # chunk shrinks to T'=3..2 inside the stem: 64x6f stem = 170 ms vs
    # 96 ms for 64x18f, 1.8x longer for 1/3 the work; the tcat lowering
    # loses even harder, 349 ms). Keep False for throughput on current
    # XLA; the mode stays as the reference-exact semantics + the streaming
    # cache demonstrator, exactness-tested in tests/test_streaming.py.
    chunk_stem: bool = False
    # Inference-optimized model family (models/optimize.py::
    # optimize_for_inference builds the matching variable tree from a
    # standard checkpoint — never hand-set these with standard variables):
    #   bn_folded: Unit3D drops the BatchNorm op entirely; the conv carries
    #     a bias with the folded inference affine (k' = k*g/sqrt(v+eps),
    #     b' = beta - mean*g/sqrt(v+eps)). Exact vs inference BN up to float
    #     reassociation. Inference-only (no batch stats to update).
    #   fused_inception: the three 1x1x1 branch convs of every Inception
    #     block (b0, b1a, b2a) run as ONE conv over concatenated output
    #     channels then split — one HBM read of the block input instead of
    #     three, one big matmul instead of three small ones. Exact (requires
    #     bn_folded; ReLU commutes with the channel split).
    bn_folded: bool = False
    fused_inception: bool = False
    #   fused_inception3: additionally merge each block's two 3x3x3 branch
    #     convs (b1b, b2b) into ONE conv with a block-diagonal kernel over
    #     the contiguous [b1r | b2r] slice of the fused-1x1 output. Exact
    #     (the off-diagonal blocks are zeros) but spends ~1.5x the 3x3
    #     FLOPs on zeros to present one MXU-shaped GEMM instead of a wide
    #     one plus a reduction-starved one (tail b2b reduces over only
    #     27*32..48 elements). Scope "tail" targets the per-step Mixed_5b/
    #     5c blocks (the measured 30-35%-MFU bottleneck); "all" includes
    #     the stem. Requires fused_inception.
    fused_inception3: str = "none"      # "none" | "tail" | "all"
    # Run the per-step I3D tail + heads on only the ACTIVE proposal slots
    # (the first num_proposals + gt_jitter_proposals — initial_cuboids_np /
    # build_model_batch place real proposals there by construction) instead
    # of all max_proposals padded slots; outputs are zero-padded back.
    # Exact for every masked consumer. MEASURED LOSER at the bench shape
    # (scripts/bench_opts.py, v5e B=128: 300 vs 394 clips/s): the slice +
    # zero-pad of the ~835 MB pooled tensor costs more than the 31% tail
    # compute it saves — consistent with round 2's "max_proposals 16 beats
    # 11" alignment finding. Kept selectable for small-batch/latency use.
    head_compact: bool = False
    # Route inference BN+ReLU through the Pallas fused kernel
    # (ops/fused_bn_relu.py). MEASURED SLOWER than XLA's own conv-epilogue
    # fusion on the full detect program (v5e B=64: 288 vs 167 ms/batch —
    # each pallas_call is a fusion boundary, so the BN+ReLU that XLA would
    # fold into the conv becomes a separate HBM round-trip). Kept as the
    # parity-tested demonstration kernel; leave False in production.
    fused_bn_relu: bool = False

    # ---- progressive refinement ----
    num_steps: int = 3                  # S — refinement steps, run as fixed-trip lax.scan
    # Unroll the S-step refinement scan at lowering time (flax nn.scan
    # unroll=S). Semantics and the checkpoint layout are IDENTICAL — params
    # stay stacked on axis 0; only the lowered control flow changes. Why it
    # can matter on TPU: the rolled scan dynamic-slices the whole stacked
    # per-step tail weights out of HBM every iteration and blocks
    # cross-step scheduling, while the unrolled body lets XLA treat each
    # step's params as plain constants-by-slice and fuse/overlap across
    # step boundaries. Also makes XLA cost_analysis count every step's
    # FLOPs (bench.py uses an unrolled lowering for its exact MFU
    # denominator). Compile time grows ~Sx for the refinement portion.
    scan_unroll: bool = False
    # Pass the loop-invariant feature map + context into the refinement
    # scan as nn.broadcast INPUTS instead of carried state. Identical math
    # (parity-tested bit-exact on CPU); candidate for the backward scan's
    # carry-threading cost (r3 trace: ~7 ms scan-carry stacking) — see the
    # measured A/B in VALIDATION.md before changing the default.
    scan_broadcast_inputs: bool = False
    num_proposals: int = 11             # initial hand-placed cuboids (paper §3.1)
    # Static padded proposal capacity (>= num_proposals). 16 measured FASTER
    # than the tight 11 despite 5 dead slots riding the per-step I3D tail
    # (v5e B=64: 337 vs 281 clips/s, p50 6.3 vs 9.1 ms) — XLA pads the
    # proposal axis to tile boundaries anyway, and the unaligned axis adds
    # relayouts. Keep it a multiple of 8.
    max_proposals: int = 16
    pooled_size: int = 7                # ROI-align output grid (7x7)
    sampling_ratio: int = 2             # bilinear samples per pooled bin per axis
    roi_impl: str = "kron"              # "kron" (fused Kronecker contraction,
                                        #   fastest measured — scripts/bench_roi.py)
                                        # | "matmul" (separable two-stage XLA)
                                        # | "pallas" (Pallas kernel)
                                        # | "gather" (scalar-semantics reference)
    temporal_extension: bool = True     # step>=2 extends tubes into neighbor chunks
    # Regression-branch shape: "grid" (spatial-grid Dense(4) + temporal
    # resize — this rebuild's head) | "frame_fc" (the reference's 4·T FC
    # from the flattened tube feature). See models/nets.py::TwoBranchHead
    # and the parity A/B in VALIDATION.md.
    reg_head: str = "grid"
    # Initial-cuboid layout: "default" (1 full + 4 corner + 4 edge +
    # 2 center — tubes/proposals.py) | "grid3" (3x3 half-scale grid + full
    # + 0.75 center). Parity-risk sensitivity knob (the reference's exact
    # 11 rectangles are unverifiable with an empty mount).
    cuboid_layout: str = "default"
    # Per-step proposal↔GT IoU matching thresholds (cascade-style increase).
    # Forgiving first step: the 11 coarse cuboids rarely clear high IoU, and
    # bipartite forcing only guarantees one positive per GT.
    iou_thresholds: Tuple[float, ...] = (0.4, 0.5, 0.6)
    # Per-step loss weights (later steps weighted up as in the paper).
    step_loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0)
    reg_loss_weight: float = 1.0
    use_context: bool = True            # scene-context feature concat in the cls branch
    # Box-delta encode/decode variances (SSD-style, matching the reference family).
    box_variances: Tuple[float, float] = (0.1, 0.2)

    # ---- inference ----
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_detections: int = 32            # static cap on per-frame per-class survivors
    link_iou_weight: float = 1.0        # cross-clip linking: score + w * IoU
    # On-device multi-tube linking (tubes/linking.py::link_tubes_k):
    # K node-disjoint Viterbi paths per class per video …
    link_tubes_per_class: int = 4
    # … each trimmed to its maximal-sum run of per-clip scores above this
    # threshold (temporal tube termination — tubes need not span the video).
    link_trim_thresh: float = 0.05
    # On-device duplicate-tube suppression inside the iterative Viterbi:
    # after each extracted path, invalidate same-clip nodes overlapping the
    # chosen node above this mean per-frame IoU, so later paths find other
    # actors instead of re-linking a near-duplicate proposal. <= 0 disables.
    # Measured (synthetic oracle, 12 videos, scripts/diag_linking.py):
    # video-mAP@0.2/@0.5 0.65/0.58 without -> 1.00/0.89 at 0.5 (0.7 ties,
    # 0.3 over-suppresses the second actor: 0.81 @0.5) — the node-disjoint
    # constraint alone leaves duplicate tubes that are guaranteed FPs.
    link_suppress_iou: float = 0.5
    # NMS lowering. "pallas" (default): one-kernel batched greedy NMS
    # (ops/nms_pallas.py) — profiling showed the lax.scan version costs
    # ~20 ms/batch at B=64 (16 sequential iterations of tiny kernels over
    # B*T*C=27648 problems, launch-bound); the Pallas kernel runs the whole
    # greedy loop VMEM-resident. Bit-exact vs the scan (tested equal, not
    # allclose). MEASURED full-program: 180.7 vs 188.8 ms/batch (354 vs
    # 339 clips/s). "scan" keeps the lax.scan path.
    nms_impl: str = "pallas"
    # Tube-level temporal NMS: after cross-clip linking, suppress video tubes
    # of the same (video, class) whose spatio-temporal IoU with a
    # higher-scored kept tube exceeds this. 0 disables (reference behavior:
    # linking alone de-duplicates; this catches parallel duplicate chains).
    tube_nms_thresh: float = 0.0

    # ---- training ----
    batch_size: int = 8
    max_gt_tubes: int = 8               # static padded GT capacity per example
    optimizer: str = "adamw"            # "adamw" | "sgd" (reference uses SGD+momentum)
    momentum: float = 0.9               # sgd only
    # AdamW first-moment (mu) storage dtype. "bfloat16" halves the HBM
    # read+write traffic of the mu buffer every optimizer step (the update
    # math still runs in f32 — optax casts mu in/out); "float32" is exact
    # Adam. The second moment stays f32 either way (it squares gradients —
    # bf16's 8 mantissa bits are too coarse for a running variance).
    adam_mu_dtype: str = "float32"      # "float32" | "bfloat16"
    # AdamW moment STORAGE: "int8" keeps BOTH moments resident as int8
    # blocks with per-256-element fp32 absmax scales (~2.03 bytes/param vs
    # 8 — Dettmers et al. 2022, log-domain code; train/optim_int8.py).
    # Update math stays fp32 (dequantize -> Adam -> requantize), so the
    # quantization enters as a bounded state perturbation, not compounding
    # arithmetic error. The single-chip HBM lever for larger real batches.
    adam_moments: str = "float32"       # "float32" | "int8"
    # SSD-style hard-negative mining for the softmax cls loss: keep the
    # neg_pos_ratio hardest negatives per positive (0 disables → plain mean).
    neg_pos_ratio: float = 3.0
    # Multilabel (sigmoid) cls loss: RetinaNet-style focal modulation +
    # sum-over-(P,C)/num_positives normalization. Plain mean BCE (the
    # reference's shape) dilutes the 1-2 positives by P*C terms — at 60
    # classes the all-zeros predictor nearly minimizes it and held-out mAP
    # collapses to 0 (measured, VALIDATION.md round 3). focal_gamma=0 falls
    # back to plain BCE with the same positive normalization.
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # Prior detection probability for the multilabel cls-head bias init
    # (b = logit(cls_prior)) so the initial loss isn't dominated by the
    # P*C-term negative flood (RetinaNet §4.1 trick). Softmax heads keep
    # zero-init bias.
    cls_prior: float = 0.01
    # Finetune policy (reference ``BaseNet.__init__`` freeze flags (recon
    # §3.5)): top-level param subtrees named here ("features", "context",
    # "steps") get ZERO optimizer updates, and the frozen trunk runs
    # eval-mode BN (running averages; stats not updated) — torch's
    # requires_grad_(False) + m.eval() finetune idiom. Default: full
    # finetune, like the reference's published configs.
    freeze_submodules: tuple = ()
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 500
    total_steps: int = 20000
    # LR schedule: "warmup_cosine" (TPU-native default) or "step" — the
    # reference's torch MultiStepLR shape (``train.py`` LR milestones
    # (recon §3.1)): constant LR with multiplicative drops at the given
    # absolute step milestones (warmup still applies first).
    lr_schedule: str = "warmup_cosine"
    lr_decay_milestones: tuple = ()     # e.g. (12000, 16000)
    lr_decay_rate: float = 0.1
    dropout_rate: float = 0.3
    # Rematerialize the per-step refinement body during training
    # (jax.checkpoint via flax lifted remat): backward recomputes each
    # step's tail/head activations instead of storing S copies — trades
    # ~1 extra step-forward of FLOPs for the dominant per-step activation
    # memory. Enables larger train batches when HBM-bound. Math identical
    # (gradient-equivalence tested). Default ON: the round-4 chip sweep
    # measured remat+dots faster at FIXED batch too (B=16: 78.82 vs 73.07
    # clips/s; B=32: 87.03 — the no-remat B=32 arm was not even the best
    # use of the freed HBM), so this is a pure win, not a memory trade.
    remat_steps: bool = True
    # Remat granularity when remat_steps is on: "full" recomputes the whole
    # step body; "dots" (jax.checkpoint_policies.checkpoint_dots) keeps
    # matmul/conv outputs resident and recomputes only elementwise glue —
    # the better TPU trade here (chip-measured: B=32 dots 367.7 ms vs full
    # 377.0 ms, and half the compile time).
    remat_policy: str = "dots"          # "full" | "dots"
    # Jittered-GT proposals appended during training. Default OFF: when the
    # jittered copies exist they absorb every positive match, the 11 cuboids
    # (the only proposals inference ever sees) train as pure background, and
    # inference collapses — measured on the synthetic oracle (tube score for
    # the GT class 0.001 with jitter vs 0.995 without).
    gt_jitter_proposals: int = 0
    # Gradient accumulation (reference ``train.py``'s multi-GPU
    # DataParallel effective batch (recon §3.1), single-chip analogue).
    # cfg.batch_size stays the EFFECTIVE batch: train_step splits it into
    # `grad_accum_steps` equal micro-batches, lax.scans over them
    # accumulating gradients, and applies ONE optimizer update with the
    # micro-mean gradient — numerically the k×-batch gradient (each
    # micro-loss is a per-sample mean; equal micro sizes ⇒ mean of means ==
    # full-batch mean). Device memory scales with the MICRO batch
    # (batch_size // grad_accum_steps): effective B=64/128 fits one v5e
    # chip whose batch axis otherwise ends at 32 (VALIDATION.md round 4).
    # BN semantics: train-mode BN normalizes each micro-batch by its OWN
    # statistics (like per-GPU BN under the reference's DataParallel, which
    # never syncs batch stats across replicas); the running stats ship as
    # the MEAN of the k one-step updates — exactly the one-big-step update
    # for running means, approximate for running vars (the between-micro
    # variance term is absent). 1 disables (the default).
    grad_accum_steps: int = 1

    # ---- parallelism ----
    mesh_shape: Tuple[int, ...] = (8,)  # v5e-8 pure-DP mesh
    mesh_axes: Tuple[str, ...] = ("data",)

    # ---------------------------------------------------------------- helpers
    @property
    def total_frames(self) -> int:
        """Frames across the always-materialized chunk axis (e.g. 3*6 = 18)."""
        return self.frames_per_chunk * self.num_chunks

    @property
    def num_cls_outputs(self) -> int:
        """Classifier logits: +1 background column for softmax datasets."""
        return self.num_classes if self.multilabel else self.num_classes + 1

    @property
    def feature_size(self) -> int:
        return self.image_size // self.feature_stride

    @property
    def active_proposals(self) -> int:
        """Slots that can ever hold a real proposal (head_compact bound)."""
        return min(self.max_proposals,
                   self.num_proposals + self.gt_jitter_proposals)

    def replace(self, **kw) -> "StepConfig":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        if self.max_proposals < self.num_proposals:
            raise ValueError("max_proposals must be >= num_proposals")
        if len(self.iou_thresholds) < self.num_steps:
            raise ValueError("need an IoU threshold per refinement step")
        if len(self.step_loss_weights) < self.num_steps:
            raise ValueError("need a loss weight per refinement step")
        if self.num_chunks % 2 != 1:
            raise ValueError("num_chunks must be odd (central chunk + symmetric neighbors)")
        if self.fused_inception and not self.bn_folded:
            raise ValueError("fused_inception requires bn_folded (the merged "
                             "1x1x1 conv carries per-branch BN in its "
                             "folded weights)")
        if self.fused_inception3 not in ("none", "tail", "all"):
            raise ValueError("fused_inception3 must be 'none', 'tail' or "
                             f"'all', got {self.fused_inception3!r}")
        if self.fused_inception3 != "none" and not self.fused_inception:
            raise ValueError("fused_inception3 requires fused_inception "
                             "(the merged 3x3x3 conv reads the contiguous "
                             "[b1r | b2r] slice of the fused-1x1 output)")
        if isinstance(self.freeze_submodules, str):
            # ('features') without the comma, or --set freeze_submodules=
            # features: a plain string makes `in` a SUBSTRING test in the
            # model and a char-set test in the optimizer — reject loudly.
            raise ValueError("freeze_submodules must be a tuple of names, "
                             f"got the string {self.freeze_submodules!r} — "
                             "write ('features',)")
        unknown = set(self.freeze_submodules) - {"features", "context", "steps"}
        if unknown:
            raise ValueError(f"unknown freeze_submodules {sorted(unknown)}; "
                             "valid: features, context, steps")
        if self.remat_policy not in ("full", "dots"):
            raise ValueError("remat_policy must be 'full' or 'dots', got "
                             f"{self.remat_policy!r}")
        if self.grad_accum_steps < 1:
            raise ValueError("grad_accum_steps must be >= 1, got "
                             f"{self.grad_accum_steps}")
        if self.adam_moments not in ("float32", "int8"):
            raise ValueError("adam_moments must be 'float32' or 'int8', "
                             f"got {self.adam_moments!r}")
        if self.adam_moments == "int8" and self.adam_mu_dtype != "float32":
            raise ValueError("adam_moments='int8' stores mu as int8 blocks;"
                             " the adam_mu_dtype knob does not apply — "
                             "leave it 'float32'")
        if self.batch_size % self.grad_accum_steps:
            raise ValueError(
                "batch_size (the EFFECTIVE batch) must divide into "
                f"grad_accum_steps equal micro-batches; got {self.batch_size}"
                f" % {self.grad_accum_steps} != 0")


# The five BASELINE.json configs as named presets (BASELINE.json::configs).
PRESETS = {
    # 1. "UCF101-24 single 6-frame clip, 1 refinement step, I3D RGB backbone
    #    (CPU-runnable PR1 ref)"
    "pr1_ref": StepConfig(
        dataset="ucf101_24",
        num_classes=24,
        frames_per_chunk=6,
        num_chunks=1,
        num_steps=1,
        temporal_extension=False,
        image_size=112,
        batch_size=1,
        iou_thresholds=(0.5,),
        step_loss_weights=(1.0,),
    ),
    # 2. "UCF101-24 full 3-step progressive refinement with temporal extension
    #    to 18 frames"
    "ucf_3step": StepConfig(
        dataset="ucf101_24",
        num_classes=24,
        frames_per_chunk=6,
        num_chunks=3,
        num_steps=3,
        temporal_extension=True,
    ),
    # 3. "AVA v2.1 keyframe detection with two-branch (global + context)
    #    heads, 3 steps"
    "ava_3step": StepConfig(
        dataset="ava",
        num_classes=60,
        multilabel=True,
        frames_per_chunk=6,
        num_chunks=3,
        num_steps=3,
        temporal_extension=True,
        use_context=True,
    ),
    # 4. "Batched streaming inference: multi-clip video with on-device NMS +
    #    cross-clip tube linking"
    "streaming": StepConfig(
        dataset="ucf101_24",
        num_classes=24,
        frames_per_chunk=6,
        num_chunks=3,
        num_steps=3,
        temporal_extension=True,
        batch_size=16,
        score_thresh=0.01,
    ),
    # 5. "Two-stream I3D (RGB + optical flow) end-to-end with progressive
    #    multi-step losses (training)"
    "two_stream_train": StepConfig(
        dataset="ucf101_24",
        num_classes=24,
        two_stream=True,
        frames_per_chunk=6,
        num_chunks=3,
        num_steps=3,
        temporal_extension=True,
    ),
}
