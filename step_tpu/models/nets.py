"""Detection networks: feature extractor, scene context, two-branch heads.

Reference parity: ``models/networks.py::BaseNet / ContextNet / TwoBranchNet``
(recon). TPU-native design notes:

  * `FeatureNet` runs the I3D stem over the WHOLE always-materialized chunk
    axis (e.g. 18 frames) in one conv program — better MXU utilization than
    the reference's per-chunk passes; the temporal receptive field crossing
    chunk borders is an intentional, documented deviation.
  * Two-stream fuses RGB+flow stem features with a 1x1x1 conv (end-to-end
    trainable late fusion) instead of the reference's separate nets with
    test-time score averaging — matches BASELINE config 5 ("two-stream ...
    end-to-end").
  * `TwoBranchHead` = I3D tail on pooled tube features, then a masked
    temporal-mean classification branch (+ scene context concat) and a
    per-frame regression branch that linearly resizes the strided temporal
    axis back to input-frame resolution.

All modules take channels-last tensors and are static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from step_tpu.models.i3d import I3DStem, I3DTail, Unit3D

EPS = 1e-6


class FeatureNet(nn.Module):
    """Shared backbone features (reference ``BaseNet``).

    rgb [B, T, H, W, 3] (+ flow [B, T, H, W, 2]) → [B, T', H/16, W/16, 832].
    """

    two_stream: bool = False
    depth: str = "full"
    s2d: bool = False
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    fused_inception3: bool = False
    conv_impl: str = "direct"
    # chunk_stem: run the stem independently per chunk (reference BaseNet
    # semantics), folding the chunk axis into batch. Enables the streaming
    # chunk-feature cache (inference.detect_video_stream).
    chunk_stem: bool = False
    num_chunks: int = 1
    dtype: jnp.dtype = jnp.float32

    def _stem_apply(self, stem_mod, x, train):
        if not self.chunk_stem or self.num_chunks == 1:
            return stem_mod(x, train)
        B, T = x.shape[0], x.shape[1]
        K = self.num_chunks
        xc = x.reshape(B * K, T // K, *x.shape[2:])
        feat = stem_mod(xc, train)
        return feat.reshape(B, K * feat.shape[1], *feat.shape[2:])

    @nn.compact
    def __call__(self, rgb, flow=None, train: bool = False):
        stem = lambda name: I3DStem(depth=self.depth, s2d=self.s2d,
                                    fuse_bn_relu=self.fuse_bn_relu,
                                    bn_folded=self.bn_folded,
                                    fused_inception=self.fused_inception,
                                    fused_inception3=self.fused_inception3,
                                    conv_impl=self.conv_impl,
                                    dtype=self.dtype, name=name)
        feat = self._stem_apply(stem("stem_rgb"), rgb, train)
        if self.two_stream:
            if flow is None:
                raise ValueError("two_stream=True requires a flow input")
            flow_feat = self._stem_apply(stem("stem_flow"), flow, train)
            feat = jnp.concatenate([feat, flow_feat], axis=-1)
            feat = Unit3D(832, (1, 1, 1), fuse_bn_relu=self.fuse_bn_relu,
                          bn_folded=self.bn_folded, conv_impl=self.conv_impl,
                          dtype=self.dtype, name="fusion")(feat, train)
        return feat


class ContextNet(nn.Module):
    """Global scene-context feature (reference ``ContextNet``): whole-frame
    pooled backbone feature → small projection, concatenated into the
    classification branch of every proposal."""

    context_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        # feat: [B, T', H', W', C] → [B, context_dim]
        x = jnp.mean(feat, axis=(1, 2, 3))
        x = nn.Dense(self.context_dim, dtype=self.dtype, name="proj")(x)
        return nn.relu(x)


class TwoBranchHead(nn.Module):
    """Per-step detection head (reference ``TwoBranchNet``).

    Classification: I3D tail → masked temporal mean + spatial mean →
    (concat context) → dropout → logits.
    Regression: I3D tail → spatial mean (keep T') → linear temporal resize
    to T → shared per-frame Dense(4) box deltas.
    """

    num_cls_outputs: int
    num_frames: int                 # T — input-frame resolution of reg outputs
    dropout_rate: float = 0.3
    depth: str = "full"
    fuse_bn_relu: bool = False
    bn_folded: bool = False
    fused_inception: bool = False
    fused_inception3: bool = False
    conv_impl: str = "direct"
    reg_channels: int = 64          # 1x1 channel reduction before the
                                    # spatially-flattened regression Dense
    # "grid" (default): shared Dense(4) over the reduced spatial grid +
    #   linear temporal resize to T (this rebuild's head — keeps the spatial
    #   position signal, cheap).
    # "frame_fc": the reference's shape — one FC from the spatially-pooled
    #   tube feature to all 4*T per-frame deltas (``TwoBranchNet``'s 4·T FC
    #   (recon)). Kept for the parity A/B (VALIDATION.md).
    reg_head: str = "grid"
    # Classification-bias init. Multilabel (sigmoid) heads set this to
    # logit(cls_prior) (RetinaNet prior init) so training doesn't start in
    # the negative-flood regime of the focal loss; softmax heads keep 0.
    cls_bias_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled, ctx=None, tprime_mask=None, train: bool = False):
        """pooled [P, T', 7, 7, C]; ctx [P, ctx_dim] or None; tprime_mask [T']."""
        P, Tp = pooled.shape[0], pooled.shape[1]
        x = I3DTail(depth=self.depth, fuse_bn_relu=self.fuse_bn_relu,
                    bn_folded=self.bn_folded,
                    fused_inception=self.fused_inception,
                    fused_inception3=self.fused_inception3,
                    conv_impl=self.conv_impl, dtype=self.dtype,
                    name="tail")(pooled, train)  # [P,T',7,7,1024]

        # ---- classification branch ----
        spatial = jnp.mean(x, axis=(2, 3))  # [P, T', 1024]
        if tprime_mask is None:
            cls_feat = jnp.mean(spatial, axis=1)
        else:
            w = tprime_mask.astype(spatial.dtype)
            w = w / jnp.maximum(jnp.sum(w), EPS)
            cls_feat = jnp.einsum("ptc,t->pc", spatial, w)
        if ctx is not None:
            cls_feat = jnp.concatenate([cls_feat, ctx.astype(cls_feat.dtype)], axis=-1)
        cls_feat = nn.Dropout(self.dropout_rate, deterministic=not train)(cls_feat)
        cls_logits = nn.Dense(
            self.num_cls_outputs, dtype=self.dtype, name="cls",
            bias_init=nn.initializers.constant(self.cls_bias_init),
        )(cls_feat)

        # ---- regression branch (per-frame deltas) ----
        if self.reg_head == "frame_fc":
            # Reference-shaped head: flatten the (reduced) grid ACROSS time
            # and emit all 4*T deltas from one FC — per-frame outputs with
            # full temporal mixing, no resize.
            if self.conv_impl != "direct":
                from step_tpu.models.i3d import _FastConv

                r = _FastConv(self.reg_channels, (1, 1, 1), (1, 1, 1),
                              impl=self.conv_impl, use_bias=True,
                              dtype=self.dtype, name="reg_reduce")(x)
            else:
                r = nn.Conv(self.reg_channels, (1, 1, 1), dtype=self.dtype,
                            name="reg_reduce")(x)
            r = nn.relu(r).reshape(P, -1)              # [P, T'*7*7*c]
            r = nn.Dropout(self.dropout_rate, deterministic=not train)(r)
            deltas = nn.Dense(4 * self.num_frames, dtype=self.dtype,
                              name="reg",
                              kernel_init=nn.initializers.normal(1e-3))(r)
            return (cls_logits.astype(jnp.float32),
                    deltas.astype(jnp.float32).reshape(P, self.num_frames, 4))
        # Keep the spatial grid: where the target sits inside the anchor IS
        # the regression signal — averaging it away (as the cls branch does)
        # leaves the deltas unlearnable (observed: reg loss plateaus hard).
        if self.conv_impl != "direct":
            from step_tpu.models.i3d import _FastConv

            r = _FastConv(self.reg_channels, (1, 1, 1), (1, 1, 1),
                          impl=self.conv_impl, use_bias=True,
                          dtype=self.dtype,
                          name="reg_reduce")(x)            # [P, T', 7, 7, c]
        else:
            r = nn.Conv(self.reg_channels, (1, 1, 1), dtype=self.dtype,
                        name="reg_reduce")(x)              # [P, T', 7, 7, c]
        r = nn.relu(r)
        r = r.reshape(P, Tp, -1)                           # [P, T', 7*7*c]
        r = nn.Dropout(self.dropout_rate, deterministic=not train)(r)
        # Dense then temporal resize (they commute — both linear, orthogonal
        # axes): contracting the 7*7*c grid BEFORE interpolating to T avoids
        # materializing a [P, T, 7*7*c] intermediate (~100 MB/step at the
        # production shape). Dropout masks apply at T' resolution.
        deltas = nn.Dense(4, dtype=self.dtype, name="reg",
                          kernel_init=nn.initializers.normal(1e-3))(r)
        deltas = jax.image.resize(
            deltas.astype(jnp.float32), (P, self.num_frames, 4), method="linear"
        )
        return cls_logits.astype(jnp.float32), deltas
