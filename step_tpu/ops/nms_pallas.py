"""Pallas TPU kernel: batched greedy NMS, one program per 128 problems.

Reference parity: ``external/maskrcnn_benchmark/csrc/cuda/nms.cu`` (recon)
— exact greedy keep order, same IoU formula/eps as `ops/nms.py::nms`.

Why a kernel here: profiling the full detect program (round 2,
`utils/profiling.summarize_trace`) showed the `lax.scan` NMS costs ~20 ms
of the 188 ms batch — not compute, but 16 SEQUENTIAL iterations of tiny
gather/select kernels across B*T*C = 27,648 independent 16-box problems
(launch/latency-bound, the one regime XLA cannot fuse away). This kernel
runs the whole greedy loop VMEM-resident: problems ride the 128 lanes,
boxes ride sublanes, and the max_keep iterations unroll inside one
program — HBM traffic is one read of scores+boxes and one write of the
keep lists.

Semantics are BIT-IDENTICAL to the scan version (tested exactly, not
allclose): argmax ties break to the lowest index, suppression is
`iou > threshold` with the same 1e-8-eps union PLUS an explicit knockout
of the selected index (a zero-area box has IoU 0 with itself and would
otherwise be re-selected every iteration), exhausted problems freeze with
keep_idx=0 / keep_mask=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
EPS = 1e-8
LANES = 128


def _nms_kernel(scores_ref, boxes_ref, idx_ref, mask_ref, *, max_keep,
                iou_threshold):
    """scores [P, L] f32 (pre-masked to NEG); boxes [4, P, L] f32;
    outputs idx [K, L] int32, mask [K, L] f32."""
    live = scores_ref[...]
    x1 = boxes_ref[0]
    y1 = boxes_ref[1]
    x2 = boxes_ref[2]
    y2 = boxes_ref[3]
    area = (x2 - x1) * (y2 - y1)                          # [P, L]
    P = live.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, live.shape, 0)

    for k in range(max_keep):                             # static unroll
        best = jnp.max(live, axis=0, keepdims=True)       # [1, L]
        is_max = live == best
        # first (lowest-index) argmax — jnp.argmax's tie rule
        idx = jnp.min(jnp.where(is_max, iota, P), axis=0)  # [L]
        onehot = iota == idx[None, :]                      # [P, L]
        ok = best[0] > NEG / 2                             # [L]
        sel = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)  # [L]
        cx1, cy1, cx2, cy2 = sel(x1), sel(y1), sel(x2), sel(y2)
        carea = (cx2 - cx1) * (cy2 - cy1)
        w = jnp.maximum(jnp.minimum(cx2[None], x2) - jnp.maximum(cx1[None], x1), 0.0)
        h = jnp.maximum(jnp.minimum(cy2[None], y2) - jnp.maximum(cy1[None], y1), 0.0)
        inter = w * h
        iou = inter / jnp.maximum(carea[None] + area - inter, EPS)
        # knock out the selected index explicitly: a zero-area box has
        # IoU 0 with itself and would otherwise be re-selected forever
        # (same rule as the scan version — bit-parity)
        suppressed = jnp.where((iou > iou_threshold) | onehot, NEG, live)
        live = jnp.where(ok[None], suppressed, live)
        idx_ref[k, :] = idx.astype(jnp.int32)
        mask_ref[k, :] = ok.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_keep", "score_threshold",
                              "interpret")
)
def nms_many(
    boxes: jnp.ndarray,       # [N, P, 4]
    scores: jnp.ndarray,      # [N, P]
    iou_threshold: float = 0.5,
    max_keep: int = 32,
    score_threshold: float = 0.0,
    valid: jnp.ndarray | None = None,   # [N, P]
    interpret: bool = False,
):
    """Greedy NMS over N independent P-box problems in one pallas_call.

    Returns keep_idx [N, max_keep] int32, keep_mask [N, max_keep] f32 —
    exactly `jax.vmap(ops.nms.nms)`'s outputs.
    """
    N, P = scores.shape
    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid > 0, live, NEG)
    live = jnp.where(live > score_threshold, live, NEG)

    n_pad = -N % LANES
    live = jnp.pad(live, ((0, n_pad), (0, 0)), constant_values=NEG)
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, n_pad), (0, 0), (0, 0)))
    Np = N + n_pad

    scores_t = live.T                                    # [P, Np]
    boxes_t = jnp.transpose(boxes_p, (2, 1, 0))          # [4, P, Np]

    kernel = functools.partial(
        _nms_kernel, max_keep=max_keep, iou_threshold=float(iou_threshold)
    )
    idx, mask = pl.pallas_call(
        kernel,
        grid=(Np // LANES,),
        in_specs=[
            pl.BlockSpec((P, LANES), lambda i: (0, i)),
            pl.BlockSpec((4, P, LANES), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((max_keep, LANES), lambda i: (0, i)),
            pl.BlockSpec((max_keep, LANES), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_keep, Np), jnp.int32),
            jax.ShapeDtypeStruct((max_keep, Np), jnp.float32),
        ],
        interpret=interpret,
    )(scores_t, boxes_t)
    return idx.T[:N], mask.T[:N]
