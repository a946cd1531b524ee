"""Torch I3D test oracle.

A from-spec PyTorch implementation of the I3D architecture with the released
checkpoints' module naming (``Conv3d_1a_7x7.conv3d.weight`` /
``Mixed_3b.branch_0.conv3d_0a_1x1...`` — the piergiaj/pytorch-i3d key
layout, which is what ``models/convert.py`` consumes) and TF-SAME
conv/pool padding semantics. Exists solely so tests can verify the
torch→flax weight conversion end-to-end against real torch activations,
including the asymmetric TF-SAME padding edge cases (SURVEY §7 flags these
as the classic silent accuracy killer).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from step_tpu.models.i3d import INCEPTION_CHANNELS


def _same_pads(n, k, s):
    out = math.ceil(n / s)
    pad = max((out - 1) * s + k - n, 0)
    return pad // 2, pad - pad // 2


def _pad_same(x, kernel, stride, value=0.0):
    """TF-SAME pad a NCDHW tensor for the given DHW kernel/stride."""
    pds = [_same_pads(x.shape[2 + i], kernel[i], stride[i]) for i in range(3)]
    # F.pad takes (w_l, w_r, h_l, h_r, d_l, d_r)
    flat = [p for dim in reversed(pds) for p in dim]
    return F.pad(x, flat, value=value)


class Unit3Dpy(nn.Module):
    def __init__(self, cin, cout, kernel, stride=(1, 1, 1), use_bn=True,
                 use_bias=False, activation="relu"):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = nn.Conv3d(cin, cout, kernel, stride, padding=0,
                                bias=use_bias)
        self.batch3d = nn.BatchNorm3d(cout, eps=1e-3) if use_bn else None
        self.activation = activation

    def forward(self, x):
        x = self.conv3d(_pad_same(x, self.kernel, self.stride))
        if self.batch3d is not None:
            x = self.batch3d(x)
        if self.activation == "relu":
            x = F.relu(x)
        return x


class MaxPool3dTFPadding(nn.Module):
    def __init__(self, kernel, stride):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.pool = nn.MaxPool3d(kernel, stride, padding=0)

    def forward(self, x):
        return self.pool(_pad_same(x, self.kernel, self.stride,
                                   value=float("-inf")))


class _Branch(nn.Module):
    """Named container so state_dict keys read branch_N.conv3d_0a_1x1..."""


class Mixed(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.branch_0 = _Branch()
        self.branch_0.conv3d_0a_1x1 = Unit3Dpy(cin, c[0], (1, 1, 1))
        self.branch_1 = _Branch()
        self.branch_1.conv3d_0a_1x1 = Unit3Dpy(cin, c[1], (1, 1, 1))
        self.branch_1.conv3d_0b_3x3 = Unit3Dpy(c[1], c[2], (3, 3, 3))
        self.branch_2 = _Branch()
        self.branch_2.conv3d_0a_1x1 = Unit3Dpy(cin, c[3], (1, 1, 1))
        self.branch_2.conv3d_0b_3x3 = Unit3Dpy(c[3], c[4], (3, 3, 3))
        self.branch_3 = _Branch()
        self.branch_3.pool = MaxPool3dTFPadding((3, 3, 3), (1, 1, 1))
        self.branch_3.conv3d_0b_1x1 = Unit3Dpy(cin, c[5], (1, 1, 1))
        self.out_channels = c[0] + c[2] + c[4] + c[5]

    def forward(self, x):
        b0 = self.branch_0.conv3d_0a_1x1(x)
        b1 = self.branch_1.conv3d_0b_3x3(self.branch_1.conv3d_0a_1x1(x))
        b2 = self.branch_2.conv3d_0b_3x3(self.branch_2.conv3d_0a_1x1(x))
        b3 = self.branch_3.conv3d_0b_1x1(self.branch_3.pool(x))
        return torch.cat([b0, b1, b2, b3], dim=1)


class TorchI3D(nn.Module):
    """Full I3D; forward returns (stem_out, tail_out, logits), all NCDHW
    except logits [N, num_classes]."""

    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = Unit3Dpy(3, 64, (7, 7, 7), (2, 2, 2))
        self.pool_2a = MaxPool3dTFPadding((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = Unit3Dpy(64, 64, (1, 1, 1))
        self.Conv3d_2c_3x3 = Unit3Dpy(64, 192, (3, 3, 3))
        self.pool_3a = MaxPool3dTFPadding((1, 3, 3), (1, 2, 2))
        cin = 192
        for name in ("Mixed_3b", "Mixed_3c"):
            block = Mixed(cin, INCEPTION_CHANNELS[name])
            setattr(self, name, block)
            cin = block.out_channels
        self.pool_4a = MaxPool3dTFPadding((3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            block = Mixed(cin, INCEPTION_CHANNELS[name])
            setattr(self, name, block)
            cin = block.out_channels
        self.pool_5a = MaxPool3dTFPadding((2, 2, 2), (2, 2, 2))
        for name in ("Mixed_5b", "Mixed_5c"):
            block = Mixed(cin, INCEPTION_CHANNELS[name])
            setattr(self, name, block)
            cin = block.out_channels
        self.logits = _Branch()
        self.logits.conv3d = nn.Conv3d(cin, num_classes, (1, 1, 1), bias=True)

    def stem(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = self.pool_2a(x)
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = self.pool_3a(x)
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = self.pool_4a(x)
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, name)(x)
        return x

    def tail(self, x):
        return self.Mixed_5c(self.Mixed_5b(self.pool_5a(x)))

    def forward(self, x):
        stem_out = self.stem(x)
        tail_out = self.tail(stem_out)
        # global spatial mean (keep time), 1x1x1 conv logits, mean over time
        pooled = tail_out.mean(dim=(3, 4), keepdim=True)
        logits = self.logits.conv3d(pooled).mean(dim=(2, 3, 4))
        return stem_out, tail_out, logits


def randomize_bn_stats(net, seed=0):
    """Roll every BN's running stats off the (0, 1) init so the conversion
    test actually exercises them."""
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
