"""Torch oracle for one progressive refinement step.

A minimal from-spec PyTorch implementation of the STEP refinement-step
pipeline (SURVEY §3.4): tube ROI-align → I3D tail → two-branch heads →
box decode → tube-IoU matching → CE + smooth-L1 losses. Exists to de-risk
the reconstruction while the reference mount is empty (VERDICT r2 item 4):
an independent implementation in a different framework must agree with
`models/detector._StepBody` + `train/losses.step_losses` numerically, which
catches transposed axes, wrong IoU denominators, resize-convention and
padding-semantics mistakes that self-consistency tests cannot.

Deliberate deviations from the 2019 reference (documented, both frameworks
implement the SAME spec here):
  * regression branch = shared Dense(4) over a reduced spatial grid +
    linear temporal resize (reference: per-frame 4·T FC) — see
    models/nets.py::TwoBranchHead and the VALIDATION.md A/B;
  * masked temporal-mean classification over the step's active feature
    slices (reference averages the always-full temporal extent).

Torch layout is NCDHW ([N, C, T, H, W]); the parity tests transpose at the
boundary.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests._torch_i3d import Mixed


# ------------------------------------------------------------- ROI align
def roi_align_2d(feat: torch.Tensor, boxes: torch.Tensor, pooled: int,
                 scale: float, ratio: int) -> torch.Tensor:
    """Detectron-legacy ROIAlign (maskrcnn-benchmark semantics) on one
    feature map. feat [C, H, W]; boxes [N, 4] image coords → [N, C, P, P].

    Spec (matches ops/roi_align.py::roi_align): boxes scaled by `scale`
    with NO half-pixel offset; roi w/h floored at 1 cell; each bin averages
    ratio**2 bilinear samples at sub-grid centers; a sample at coordinate
    c contributes 0 outside [-1, limit], else clamps to [0, limit-1].
    """
    C, H, W = feat.shape
    N = boxes.shape[0]
    b = boxes.to(torch.float64) * scale
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = torch.clamp(b[:, 2] - x1, min=1.0)
    roi_h = torch.clamp(b[:, 3] - y1, min=1.0)

    off = (torch.arange(pooled, dtype=torch.float64)[:, None]
           + (torch.arange(ratio, dtype=torch.float64)[None, :] + 0.5) / ratio)
    ys = y1[:, None, None] + off[None] * (roi_h / pooled)[:, None, None]
    xs = x1[:, None, None] + off[None] * (roi_w / pooled)[:, None, None]

    def corners(coord, limit):
        ok = (coord >= -1.0) & (coord <= limit)
        c = torch.clamp(coord, min=0.0)
        lo = torch.clamp(c.floor().long(), max=limit - 1)
        at_edge = lo >= limit - 1
        hi = torch.where(at_edge, torch.full_like(lo, limit - 1), lo + 1)
        c = torch.where(at_edge, lo.to(c.dtype), c)
        frac = c - lo.to(c.dtype)
        return lo, hi, 1.0 - frac, frac, ok

    y_lo, y_hi, wy_lo, wy_hi, y_ok = corners(ys, H)   # [N, P, S]
    x_lo, x_hi, wx_lo, wx_hi, x_ok = corners(xs, W)

    f = feat.to(torch.float64).reshape(C, H * W)
    out = feat.new_zeros((N, C, pooled, pooled), dtype=torch.float64)
    for n in range(N):
        for p in range(pooled):
            for q in range(pooled):
                acc = torch.zeros(C, dtype=torch.float64)
                for sy in range(ratio):
                    for sx in range(ratio):
                        if not (y_ok[n, p, sy] and x_ok[n, q, sx]):
                            continue
                        yl, yh = y_lo[n, p, sy], y_hi[n, p, sy]
                        xl, xh = x_lo[n, q, sx], x_hi[n, q, sx]
                        wyl, wyh = wy_lo[n, p, sy], wy_hi[n, p, sy]
                        wxl, wxh = wx_lo[n, q, sx], wx_hi[n, q, sx]
                        acc = acc + (
                            f[:, yl * W + xl] * (wyl * wxl)
                            + f[:, yl * W + xh] * (wyl * wxh)
                            + f[:, yh * W + xl] * (wyh * wxl)
                            + f[:, yh * W + xh] * (wyh * wxh)
                        )
                out[n, :, p, q] = acc / (ratio * ratio)
    return out.to(feat.dtype)


def tube_roi_align_torch(feat: torch.Tensor, tubes: torch.Tensor,
                         pooled: int, scale: float, ratio: int) -> torch.Tensor:
    """feat [T', C, H, W]; tubes [N, T, 4] → [N, T', C, P, P].

    Each strided feature slice t' pools the box of the input frame at its
    center: t = floor((t' + 0.5) * T / T') (detector.feature_time_indices).
    """
    Tp = feat.shape[0]
    T = tubes.shape[1]
    if T == Tp:
        t_idx = list(range(Tp))
    else:
        t_idx = [int((tp + 0.5) * T / Tp) for tp in range(Tp)]
    slices = [roi_align_2d(feat[tp], tubes[:, t_idx[tp]], pooled, scale, ratio)
              for tp in range(Tp)]
    return torch.stack(slices, dim=1)                 # [N, T', C, P, P]


# ------------------------------------------------------------- head
class TorchStepHead(nn.Module):
    """Tail + two-branch heads (spec of models/nets.py::TwoBranchHead,
    depth='tiny': tail = one Inception block 'Mixed_5c')."""

    def __init__(self, cin: int, tail_channels, num_cls: int, num_frames: int,
                 reg_channels: int = 64, ctx_dim: int = 0):
        super().__init__()
        self.Mixed_5c = Mixed(cin, tail_channels)
        cout = self.Mixed_5c.out_channels
        self.num_frames = num_frames
        self.cls = nn.Linear(cout + ctx_dim, num_cls)
        self.reg_reduce = nn.Conv3d(cout, reg_channels, (1, 1, 1), bias=True)
        self.reg = None                               # built by build_reg
        self._reg_channels = reg_channels

    def build_reg(self, spatial: int):
        self.reg = nn.Linear(spatial * spatial * self._reg_channels, 4)

    def forward(self, pooled, ctx=None, tprime_mask=None):
        """pooled [N, C, T', P, P]; ctx [N, D] or None; tprime_mask [T']."""
        x = self.Mixed_5c(pooled)                     # [N, C', T', P, P]
        N, Cp, Tp, Ph, Pw = x.shape

        spatial = x.mean(dim=(3, 4))                  # [N, C', T']
        if tprime_mask is None:
            cls_feat = spatial.mean(dim=2)
        else:
            w = tprime_mask.to(spatial.dtype)
            w = w / torch.clamp(w.sum(), min=1e-6)
            cls_feat = (spatial * w[None, None, :]).sum(dim=2)
        if ctx is not None:
            cls_feat = torch.cat([cls_feat, ctx.to(cls_feat.dtype)], dim=-1)
        cls_logits = self.cls(cls_feat)

        r = F.relu(self.reg_reduce(x))                # [N, c, T', P, P]
        # match flax channels-last flatten order: [T', P, P, c] row-major
        r = r.permute(0, 2, 3, 4, 1).reshape(N, Tp, -1)
        deltas = self.reg(r)                          # [N, T', 4]
        # linear temporal resize T' → T, half-pixel centers (jax.image.resize
        # 'linear' == F.interpolate align_corners=False)
        deltas = F.interpolate(deltas.permute(0, 2, 1), size=self.num_frames,
                               mode="linear", align_corners=False)
        return cls_logits, deltas.permute(0, 2, 1)    # [N, ncls], [N, T, 4]


# ------------------------------------------------------------- geometry
def decode_boxes_torch(deltas, anchors, variances=(0.1, 0.2),
                       max_scale_delta: float = 4.0):
    eps = 1e-8
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = torch.clamp(anchors[..., 2] - anchors[..., 0], min=eps)
    ah = torch.clamp(anchors[..., 3] - anchors[..., 1], min=eps)
    cx = deltas[..., 0] * variances[0] * aw + acx
    cy = deltas[..., 1] * variances[0] * ah + acy
    scale = torch.clamp(deltas[..., 2:4] * variances[1],
                        -max_scale_delta, max_scale_delta)
    w = torch.exp(scale[..., 0]) * aw
    h = torch.exp(scale[..., 1]) * ah
    return torch.stack([cx - w * 0.5, cy - h * 0.5,
                        cx + w * 0.5, cy + h * 0.5], dim=-1)


def encode_boxes_torch(boxes, anchors, variances=(0.1, 0.2)):
    eps = 1e-8

    def cxcywh(b):
        return ((b[..., 0] + b[..., 2]) * 0.5, (b[..., 1] + b[..., 3]) * 0.5,
                torch.clamp(b[..., 2] - b[..., 0], min=eps),
                torch.clamp(b[..., 3] - b[..., 1], min=eps))

    bcx, bcy, bw, bh = cxcywh(boxes)
    acx, acy, aw, ah = cxcywh(anchors)
    # 1 px anchor-extent clamp — matches tubes/boxes.py::encode_boxes
    aw = torch.clamp(aw, min=1.0)
    ah = torch.clamp(ah, min=1.0)
    return torch.stack([
        (bcx - acx) / (aw * variances[0]),
        (bcy - acy) / (ah * variances[0]),
        torch.log(bw / aw) / variances[1],
        torch.log(bh / ah) / variances[1],
    ], dim=-1)


def tube_iou_torch(a, b, frame_mask=None):
    """a [P, T, 4], b [G, T, 4] → [P, G] masked mean per-frame IoU."""
    eps = 1e-8
    ae = a[:, None]                                   # [P, 1, T, 4]
    be = b[None, :]                                   # [1, G, T, 4]
    lt = torch.maximum(ae[..., :2], be[..., :2])
    rb = torch.minimum(ae[..., 2:], be[..., 2:])
    wh = torch.clamp(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]

    def area(x):
        return (torch.clamp(x[..., 2] - x[..., 0], min=0.0)
                * torch.clamp(x[..., 3] - x[..., 1], min=0.0))

    union = area(ae) + area(be) - inter
    per_frame = inter / torch.clamp(union, min=eps)   # [P, G, T]
    if frame_mask is None:
        return per_frame.mean(dim=-1)
    w = frame_mask.to(per_frame.dtype)
    return (per_frame * w).sum(-1) / torch.clamp(w.sum(), min=eps)


# ------------------------------------------------------------- matching + losses
def match_tubes_torch(proposals, gt_tubes, gt_mask, frame_mask, iou_threshold,
                      prop_mask=None, force_best_match=True):
    """Spec of train/losses.py::match_tubes (incl. bipartite forcing)."""
    NEG = -1.0
    iou = tube_iou_torch(proposals, gt_tubes, frame_mask)  # [P, G]
    iou = torch.where(gt_mask[None, :] > 0, iou, torch.full_like(iou, NEG))
    if prop_mask is not None:
        iou = torch.where(prop_mask[:, None] > 0, iou, torch.full_like(iou, NEG))
    best_iou = iou.max(dim=-1).values

    matched = iou.clone()
    if force_best_match:
        best_p = iou.argmax(dim=0)                    # [G]
        G = iou.shape[1]
        matched.index_put_((best_p, torch.arange(G)), 2.0 * gt_mask,
                           accumulate=True)
    best_gt = matched.argmax(dim=-1)
    match_val = matched.max(dim=-1).values
    positive = (match_val >= iou_threshold).float()
    if prop_mask is not None:
        positive = positive * (prop_mask > 0).float()
    return best_gt, best_iou, positive


def cls_loss_softmax_torch(cls_logits, best_gt, positive, gt_labels, prop_mask,
                           neg_pos_ratio: float = 0.0):
    eps = 1e-8
    target_fg = gt_labels[best_gt] + 1
    target = torch.where(positive > 0, target_fg, torch.zeros_like(target_fg))
    logp = F.log_softmax(cls_logits, dim=-1)
    ce = -logp.gather(1, target[:, None].long())[:, 0]
    if neg_pos_ratio <= 0:
        return (ce * prop_mask).sum() / torch.clamp(prop_mask.sum(), min=eps)
    pos = positive * prop_mask
    neg = (1.0 - positive) * prop_mask
    num_pos = pos.sum()
    neg_ce = ce * neg
    harder = (neg_ce[None, :] > neg_ce[:, None]).float()
    rank = (harder * neg[None, :]).sum(-1)
    num_keep = neg_pos_ratio * torch.clamp(num_pos, min=1.0)
    keep_neg = neg * (rank < num_keep).float()
    total = (ce * pos).sum() + (ce * keep_neg).sum()
    return total / torch.clamp(num_pos + keep_neg.sum(), min=eps)


def reg_loss_torch(deltas, proposals, best_gt, positive, gt_tubes, frame_mask,
                   prop_mask, variances=(0.1, 0.2)):
    eps = 1e-8
    matched_gt = gt_tubes[best_gt]                    # [P, T, 4]
    target = encode_boxes_torch(matched_gt, proposals, variances)
    diff = deltas - target
    ax = diff.abs()
    l1 = torch.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5).sum(-1)  # [P, T]
    w = positive * prop_mask
    per_prop = (l1 * frame_mask[None, :]).sum(-1) / torch.clamp(
        frame_mask.sum(), min=eps)
    return (per_prop * w).sum() / torch.clamp(w.sum(), min=eps)
