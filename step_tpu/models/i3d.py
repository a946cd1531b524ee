"""I3D — Inflated 3D Inception-v1 backbone, TPU-native.

Reference parity: ``models/i3dpt.py::I3D / Unit3Dpy / Mixed /
MaxPool3dTFPadding`` (recon). Same architecture (Carreira & Zisserman,
"Quo Vadis"), re-expressed for TPU:

  * channels-last ``[B, T, H, W, C]`` (NDHWC) — the MXU-friendly layout;
  * TF-style SAME padding on convs and max-pools (lax 'SAME' == TF SAME,
    which is what ``MaxPool3dTFPadding`` hand-implements in the reference);
  * BatchNorm eps 1e-3 (TF default used by released I3D checkpoints);
  * params float32, compute optionally bfloat16 (`dtype`);
  * split into `I3DStem` (stem → Mixed_4f, the shared detection feature,
    832 ch, spatial stride 16, temporal stride 4) and `I3DTail`
    (Mixed_5b/5c, run inside the detection heads on pooled tube features)
    exactly where the reference cuts it.

`I3DClassifier` composes both plus the Kinetics logits head — used by the
weight converter's end-to-end parity check and available as a standalone
video classifier.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# Inception-v1 branch widths: (b0_1x1, b1_reduce, b1_3x3, b2_reduce, b2_3x3, b3_pool_proj)
INCEPTION_CHANNELS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),      # out 256
    "Mixed_3c": (128, 128, 192, 32, 96, 64),    # out 480
    "Mixed_4b": (192, 96, 208, 16, 48, 64),     # out 512
    "Mixed_4c": (160, 112, 224, 24, 64, 64),    # out 512
    "Mixed_4d": (128, 128, 256, 24, 64, 64),    # out 512
    "Mixed_4e": (112, 144, 288, 32, 64, 64),    # out 528
    "Mixed_4f": (256, 160, 320, 32, 128, 128),  # out 832
    "Mixed_5b": (256, 160, 320, 32, 128, 128),  # out 832
    "Mixed_5c": (384, 192, 384, 48, 128, 128),  # out 1024
}

BN_EPS = 1e-3
BN_MOMENTUM = 0.9


class _S2DConv(nn.Module):
    """Space-to-depth conv with an nn.Conv-identical parameter (scope name
    "conv", param "kernel", original [kt,kh,kw,C,F] shape/init) so
    checkpoints and the torch converter are oblivious to the transform."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from step_tpu.ops.stem_conv import space_to_depth_conv3d

        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        y = space_to_depth_conv3d(
            x.astype(self.dtype), k.astype(self.dtype), self.stride
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class _FastConv(nn.Module):
    """2D-decomposed 3D conv (ops/conv3d.py) with an nn.Conv-identical
    parameter (scope name "conv", param "kernel", [kt,kh,kw,C,F] shape/init)
    so checkpoints and the torch converter are oblivious to the rewrite."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    impl: str = "tcat"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from step_tpu.ops.conv3d import conv3d_same

        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        y = conv3d_same(
            x.astype(self.dtype), k.astype(self.dtype), self.stride,
            impl=self.impl,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class _FusedBNReLU(nn.Module):
    """Inference-only fused BN+ReLU (Pallas) with nn.BatchNorm-compatible
    variables (params 'scale'/'bias', batch_stats 'mean'/'var') so the same
    checkpoint drives either path."""

    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x):
        from step_tpu.ops.fused_bn_relu import bn_relu_inference

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        interpret = jax.default_backend() != "tpu"
        return bn_relu_inference(
            x, scale, bias, mean.value, var.value, self.epsilon,
            interpret=interpret,
        )


class Unit3D(nn.Module):
    """Conv3D + BatchNorm + ReLU (reference ``Unit3Dpy``).

    `s2d=True` (spatial stride must be (2,2)) runs the conv in
    space-to-depth form (see ops/stem_conv.py) — same parameters, same
    output, far better MXU channel utilization on thin inputs.
    `fuse_bn_relu=True` routes inference through the Pallas fused BN+ReLU
    kernel; training always uses flax BatchNorm (running-stat updates).
    """

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = False
    s2d: bool = False
    fuse_bn_relu: bool = False
    # bn_folded: inference-only variant with NO BatchNorm op — the conv
    # carries a bias holding the folded BN affine. Variables come from
    # models/optimize.py::fold_bn_variables, never from a raw checkpoint.
    bn_folded: bool = False
    conv_impl: str = "direct"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias or (self.bn_folded and self.use_bn)
        if self.s2d:
            x = _S2DConv(self.features, self.kernel, self.stride,
                         use_bias=use_bias, dtype=self.dtype, name="conv")(x)
        elif self.conv_impl != "direct":
            x = _FastConv(self.features, self.kernel, self.stride,
                          impl=self.conv_impl, use_bias=use_bias,
                          dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                strides=self.stride,
                padding="SAME",
                use_bias=use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.bn_folded:
            return nn.relu(x) if self.use_relu else x
        if self.use_bn:
            if self.fuse_bn_relu and self.use_relu and not train:
                return _FusedBNReLU(name="bn")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


import os as _os

# Profiler finding (round 2, v5e): the 3-D reduce_window max pools inside
# the refinement scan cost ~8.4 ms/step (27% of step time) under XLA's
# depthwise-conv emitter. A separable pool (three 1-D reduce_windows) is
# mathematically identical (max is associative per axis; SAME pads with
# -inf per axis). MEASURED full-program: 190.8 vs 188.7 ms/batch — no win
# (XLA's single-pass emitter already avoids the window-volume re-reads),
# so "direct" stays the default; the toggle remains for re-measurement on
# future XLA versions. The env var is read per call (it is trace-time-only
# cost) so setting STEP_TPU_POOL3D after import still takes effect.


def max_pool_3d(x, window: Tuple[int, int, int], stride: Tuple[int, int, int]):
    """TF-SAME 3D max pool over [B, T, H, W, C] (reference
    ``MaxPool3dTFPadding``: torch needs manual asymmetric padding; lax's
    'SAME' implements the TF rule natively)."""
    _POOL3D_IMPL = _os.environ.get("STEP_TPU_POOL3D", "direct")
    if (_POOL3D_IMPL == "pallas" and window == (3, 3, 3)
            and stride == (1, 1, 1)):
        from step_tpu.ops.pool_pallas import (max_pool3x3_same_pallas,
                                              pick_block_n)

        bn = pick_block_n(x.shape, x.dtype)
        if bn is not None:  # else: block too big for VMEM → reduce_window
            return max_pool3x3_same_pallas(
                x, block_n=bn, interpret=jax.default_backend() != "tpu")
    if _POOL3D_IMPL == "separable":
        for axis in range(3):
            if window[axis] == 1 and stride[axis] == 1:
                continue
            dims = [1, 1, 1, 1, 1]
            strides = [1, 1, 1, 1, 1]
            dims[axis + 1] = window[axis]
            strides[axis + 1] = stride[axis]
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, tuple(dims), tuple(strides), "SAME"
            )
        return x
    if _POOL3D_IMPL == "cheap27" and stride == (1, 1, 1):
        # 27-offset joint backward (kept for A/B: 247.0 ms/step — the +-1
        # shifts on the tiny 7x7 tail spatial dims each cost a relayout)
        from step_tpu.ops.pool3d_grad import max_pool_3d_cheapgrad

        return max_pool_3d_cheapgrad(x, window, stride)
    if _POOL3D_IMPL != "sas" and stride == (1, 1, 1):
        # DEFAULT for stride-1 pools (the tail pools inside the refinement
        # scan): single fused reduce_window forward at inference (identical
        # program), separable shift-and-compare backward under grad —
        # select-and-scatter's backward measured ~45 ms of a 218 ms train
        # step at B=16, this path 219.6 vs 255.0 ms/step (+16% train
        # throughput; ops/pool3d_grad.py has the full A/B). Strided pools
        # KEEP select-and-scatter: shifted input-sized reads lose badly on
        # the large strided stem pools (375 ms/step all-cheapgrad A/B).
        from step_tpu.ops.pool3d_grad import max_pool_3d_s1_sepgrad

        return max_pool_3d_s1_sepgrad(x, window)
    dims = (1, *window, 1)
    strides = (1, *stride, 1)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, "SAME"
    )


class InceptionBlock(nn.Module):
    """Inflated Inception module: four parallel branches, channel-concat.

    `fused_inception` (inference-only, requires `bn_folded`): the three
    1x1x1 branch convs (b0, b1a, b2a) — which all read the block input —
    run as ONE conv over concatenated output channels, then split. One HBM
    read of x instead of three and one large matmul instead of three small
    ones; exact because ReLU commutes with the channel split and the folded
    BN affines concatenate with the kernels (variables from
    models/optimize.py::fuse_inception_variables).

    `fused_inception3` (inference-only, requires `fused_inception`): the
    two 3x3x3 branch convs (b1b, b2b) run as ONE conv with a
    block-diagonal kernel over the contiguous [b1r | b2r] slice of the
    fused-1x1 output. Exact — the off-diagonal kernel blocks are zeros, so
    output channels [:c1] see only b1r and [c1:] only b2r — at the price
    of ~1.5x the 3x3 FLOPs spent multiplying zeros. Motivation: the tail's
    b2b conv reduces over only 27*32..48 elements (far below MXU depth);
    merging presents one well-shaped GEMM (variables from
    models/optimize.py::fuse_inception3_variables).
    """

    channels: Sequence[int]  # (b0, b1r, b1, b2r, b2, b3)
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    fused_inception3: bool = False
    conv_impl: str = "direct"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        u = lambda f, k, name: Unit3D(f, k, fuse_bn_relu=self.fuse_bn_relu,
                                      bn_folded=self.bn_folded,
                                      conv_impl=self.conv_impl,
                                      dtype=self.dtype, name=name)
        if self.fused_inception:
            y = u(c[0] + c[1] + c[3], (1, 1, 1), "b012")(x, train)
            b0 = y[..., : c[0]]
            if self.fused_inception3:
                b12 = u(c[2] + c[4], (3, 3, 3), "b12")(y[..., c[0]:], train)
                b3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1))
                b3 = u(c[5], (1, 1, 1), "b3b")(b3, train)
                return jnp.concatenate([b0, b12, b3], axis=-1)
            b1 = y[..., c[0] : c[0] + c[1]]
            b2 = y[..., c[0] + c[1] :]
        else:
            b0 = u(c[0], (1, 1, 1), "b0")(x, train)
            b1 = u(c[1], (1, 1, 1), "b1a")(x, train)
            b2 = u(c[3], (1, 1, 1), "b2a")(x, train)
        b1 = u(c[2], (3, 3, 3), "b1b")(b1, train)
        b2 = u(c[4], (3, 3, 3), "b2b")(b2, train)
        b3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1))
        b3 = u(c[5], (1, 1, 1), "b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3DStem(nn.Module):
    """I3D from the input clip through Mixed_4f (the shared feature).

    Input  [B, T, H, W, C_in]  (C_in = 3 RGB or 2 flow)
    Output [B, T/4, H/16, W/16, 832]

    `depth="tiny"` builds a structure-preserving shallow variant (same
    Unit3D/InceptionBlock building blocks, same 832-ch output, temporal
    stride 4, spatial stride **8**) whose only purpose is fast XLA-CPU
    compiles in unit tests and multi-chip dryruns — sharding and loop
    semantics are identical to the full model.
    """

    depth: str = "full"
    s2d: bool = False
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    fused_inception3: bool = False
    conv_impl: str = "direct"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        unit = lambda f, k, s, name: Unit3D(
            f, k, s, s2d=self.s2d and s[1:] == (2, 2),
            fuse_bn_relu=self.fuse_bn_relu, bn_folded=self.bn_folded,
            conv_impl=self.conv_impl,
            dtype=self.dtype, name=name,
        )
        block = lambda ch, name: InceptionBlock(
            ch, fuse_bn_relu=self.fuse_bn_relu, bn_folded=self.bn_folded,
            fused_inception=self.fused_inception,
            fused_inception3=self.fused_inception3,
            conv_impl=self.conv_impl,
            dtype=self.dtype, name=name
        )
        if self.depth == "tiny":
            tiny_a = (16, 16, 24, 8, 16, 8)    # out 64
            tiny_b = (32, 24, 48, 8, 24, 24)   # out 128
            x = unit(16, (3, 7, 7), (2, 2, 2), "Conv3d_1a_7x7")(x, train)
            x = max_pool_3d(x, (1, 3, 3), (1, 2, 2))
            x = block(tiny_a, "Mixed_3b")(x, train)
            x = max_pool_3d(x, (3, 3, 3), (2, 2, 2))
            x = block(tiny_b, "Mixed_4f")(x, train)
            return x
        x = unit(64, (7, 7, 7), (2, 2, 2), "Conv3d_1a_7x7")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = unit(64, (1, 1, 1), (1, 1, 1), "Conv3d_2b_1x1")(x, train)
        x = unit(192, (3, 3, 3), (1, 1, 1), "Conv3d_2c_3x3")(x, train)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        for name in ("Mixed_3b", "Mixed_3c"):
            x = block(INCEPTION_CHANNELS[name], name)(x, train)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = block(INCEPTION_CHANNELS[name], name)(x, train)
        return x


class I3DTail(nn.Module):
    """Mixed_5b + Mixed_5c — run by the detection heads on pooled tube
    features (reference: the tail I3D blocks inside ``TwoBranchNet``).

    The classifier path applies the 2x2x2 MaxPool_5a first; on 7x7 pooled
    tube features the heads skip the spatial pool (`pool_5a=False`) to keep
    the ROI grid resolution.
    """

    pool_5a: bool = False
    depth: str = "full"
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    fused_inception3: bool = False
    conv_impl: str = "direct"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = lambda ch, name: InceptionBlock(
            ch, fuse_bn_relu=self.fuse_bn_relu, bn_folded=self.bn_folded,
            fused_inception=self.fused_inception,
            fused_inception3=self.fused_inception3,
            conv_impl=self.conv_impl,
            dtype=self.dtype, name=name
        )
        if self.pool_5a:
            x = max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        if self.depth == "tiny":
            return block((32, 24, 48, 8, 24, 24), "Mixed_5c")(x, train)
        x = block(INCEPTION_CHANNELS["Mixed_5b"], "Mixed_5b")(x, train)
        x = block(INCEPTION_CHANNELS["Mixed_5c"], "Mixed_5c")(x, train)
        return x


class I3DClassifier(nn.Module):
    """Full I3D video classifier (Kinetics head) — stem + tail + logits.

    Used to validate converted pretrained weights end-to-end and as the
    standalone action-classification model family.
    """

    num_classes: int = 400
    dropout_rate: float = 0.5
    s2d: bool = False
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    conv_impl: str = "direct"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = I3DStem(s2d=self.s2d, fuse_bn_relu=self.fuse_bn_relu,
                    bn_folded=self.bn_folded,
                    fused_inception=self.fused_inception,
                    conv_impl=self.conv_impl, dtype=self.dtype,
                    name="stem")(x, train)
        x = I3DTail(pool_5a=True, fuse_bn_relu=self.fuse_bn_relu,
                    bn_folded=self.bn_folded,
                    fused_inception=self.fused_inception,
                    conv_impl=self.conv_impl, dtype=self.dtype,
                    name="tail")(x, train)
        # global spatial average pool, keep time; then 1x1x1 conv logits
        x = jnp.mean(x, axis=(2, 3), keepdims=True)  # [B, T', 1, 1, 1024]
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.conv_impl != "direct":
            x = _FastConv(self.num_classes, (1, 1, 1), (1, 1, 1),
                          impl=self.conv_impl, use_bias=True,
                          dtype=self.dtype, name="logits")(x)
        else:
            x = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                        dtype=self.dtype, name="logits")(x)
        # average logits over time (TF I3D convention)
        return jnp.mean(x, axis=(1, 2, 3))  # [B, num_classes]
