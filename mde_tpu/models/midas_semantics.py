"""MidasNetSemantics — the flagship model (config.yaml:8,25-32).

Parity target: src/network/midas_semantics.py:153-267. A MidasNet_small branch
whose head stops at 32-channel features (the final 1x1 is removed,
midas_semantics.py:159-163), fused with a frozen DINOv2 semantic branch
(run at half resolution 224x280, patch 14 -> 16x20 tokens; midas_semantics.py:178,
233-239) through a Dinov2Head reassembly (dpt_depth.py:32-153) and a windowed
cross-attention (8x spatially reduced, window 16), then residual fusion blocks
and a depth head.

TPU-native differences from the reference:
- the DINOv2 branch output is wrapped in stop_gradient — with the optimizer mask
  in train/trainer.py this is the functional equivalent of requires_grad=False;
  XLA additionally prunes the whole frozen backward subgraph.
- the windowed attention is the batched rectangular-window op
  (ops/window_attention.py), not a Python loop over flat slices.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import BatchNorm, Conv, ConvTranspose, FeatureFusionBlockCustom, LayerNorm, ScratchConvs
from ..nn.vit import VIT_CONFIGS, ViT
from ..ops.resize import resize_bilinear
from ..ops.window_attention import windowed_cross_attention
from .localbins import LocalBinsBlock
from .midas_small import MidasNetSmall


class ResidualBlock(nn.Module):
    """conv-bn-relu-conv-bn + (1x1-bn shortcut) ResBlock
    (midas_semantics.py:129-151).

    ``merge_entry``: conv1 (3x3) and the 1x1 shortcut read the SAME input, and
    every FusionStack instance has cout <= 64 — under-128-lane on the MXU, so
    two separate passes each waste most of the systolic array's output lanes
    AND read x from HBM twice. Embedding the 1x1 at the center tap of a 3x3
    kernel (zero elsewhere) and concatenating along cout turns them into ONE
    conv, split afterwards by channel-range slicing (the axon-safe lowering
    form, CLAUDE.md). Same math (the zero taps contribute exactly 0), same
    params (kernel_only declaration keeps the param tree and init identical),
    valid for any stride: a 3x3/pad-1/stride-s center tap samples x[s*i, s*j],
    exactly the 1x1/pad-0/stride-s read. A/B harness:
    benchmarks/ab_fusion_stack.py (experiments 2/2b)."""

    features: int
    stride: int = 1
    train: bool = False
    axis_name: Optional[str] = None
    # The block default stays False (standalone uses are not swept); the
    # flagship turns it on via MidasNetSemantics.merge_residual_entry, whose
    # lowering passed the TPU-vs-CPU numeric cross-check and won its A/B
    # (tpu_numeric_sweep.py flagship variants; ab_fusion_stack.py RESULT).
    merge_entry: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.features
        needs_proj = self.stride != 1 or x.shape[-1] != f
        if needs_proj and self.merge_entry:
            k1, _ = Conv(f, 3, self.stride, 1, use_bias=False, name="conv1")(
                x, kernel_only=True
            )
            ks, _ = Conv(f, 1, self.stride, 0, use_bias=False, name="shortcut_conv")(
                x, kernel_only=True
            )
            kk = jnp.concatenate(
                [k1, jnp.pad(ks, ((1, 1), (1, 1), (0, 0), (0, 0)))], axis=-1
            )
            if x.dtype != kk.dtype:
                # init-time mix only; the training path casts params beforehand.
                dt = jnp.promote_types(x.dtype, kk.dtype)
                x, kk = x.astype(dt), kk.astype(dt)
            y = jax.lax.conv_general_dilated(
                x, kk, (self.stride, self.stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h, residual = y[..., :f], y[..., f:]
        else:
            h = Conv(f, 3, self.stride, 1, use_bias=False, name="conv1")(x)
            residual = x
            if needs_proj:
                residual = Conv(f, 1, self.stride, 0, use_bias=False, name="shortcut_conv")(x)
        h = BatchNorm(not self.train, self.axis_name, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(f, 3, 1, 1, use_bias=False, name="conv2")(h)
        h = BatchNorm(not self.train, self.axis_name, name="bn2")(h)
        if needs_proj:
            residual = BatchNorm(not self.train, self.axis_name, name="shortcut_bn")(residual)
        return nn.relu(h + residual)


class SpatialReduction(nn.Module):
    """Three stride-2 conv-bn-relu stages (8x reduction)."""

    dim: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = Conv(self.dim, 3, 2, 1, name=f"conv{i}")(x)
            x = BatchNorm(not self.train, self.axis_name, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class CrossAttention(nn.Module):
    """Windowed cross-attention with 8x conv reduction / upsampling
    (midas_semantics.py:14-127)."""

    dim: int
    num_heads: int = 8
    window_size: int = 16
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        # ONE shared spatial_reduction module applied to both branches, exactly
        # as the reference reuses one nn.Sequential (midas_semantics.py:67-68).
        reduction = SpatialReduction(
            self.dim, self.train, self.axis_name, name="spatial_reduction"
        )
        x_r = reduction(x)
        ctx_r = reduction(context)

        q_in = LayerNorm(name="norm_q")(x_r)
        k_in = LayerNorm(name="norm_k")(ctx_r)
        v_in = LayerNorm(name="norm_v")(ctx_r)
        q = nn.Dense(self.dim, use_bias=False, name="q")(q_in)
        k = nn.Dense(self.dim, use_bias=False, name="k")(k_in)
        v = nn.Dense(self.dim, use_bias=False, name="v")(v_in)

        out = windowed_cross_attention(q, k, v, self.num_heads, self.window_size)
        out = LayerNorm(name="norm_out")(out)
        out = nn.Dense(self.dim, name="proj")(out)

        for i in range(3):
            out = ConvTranspose(self.dim, 4, 2, 1, name=f"spatial_upsample_conv{i}")(out)
            out = BatchNorm(not self.train, self.axis_name, name=f"spatial_upsample_bn{i}")(out)
            out = nn.relu(out)
        # Transposed-conv chain restores exactly 8x; crop defensively if the
        # input wasn't divisible by 8.
        out = out[:, :h, :w, :]
        return out + x


class Dinov2Head(nn.Module):
    """Token pyramid -> 32-ch dense features (dpt_depth.py:32-153).

    Four 1x1 projections to ``out_channels`` with 4x/2x/id/stride-2 resizes, a
    scratch+refinenet cascade at ``features`` channels, then
    output_conv1 -> bilinear to (14*ph, 14*pw) -> output_conv2 (ends at 32 ch,
    ReLU — the final 1x1 is commented out in the reference).
    """

    features: int = 128
    out_channels: tuple = (128, 256, 512, 512)
    use_bn: bool = False
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, token_layers, patch_h: int, patch_w: int):
        outs = []
        for i, tokens in enumerate(token_layers):
            b, n, c = tokens.shape
            xm = tokens.reshape(b, patch_h, patch_w, c)
            xm = Conv(self.out_channels[i], 1, name=f"projects_{i}")(xm)
            if i == 0:
                xm = ConvTranspose(self.out_channels[0], 4, 4, 0, name="resize_0")(xm)
            elif i == 1:
                xm = ConvTranspose(self.out_channels[1], 2, 2, 0, name="resize_1")(xm)
            elif i == 3:
                xm = Conv(self.out_channels[3], 3, 2, 1, name="resize_3")(xm)
            outs.append(xm)

        rn = ScratchConvs(self.features, expand=False, name="scratch")(outs)
        l1, l2, l3, l4 = rn
        common = dict(
            bn=self.use_bn, expand=False, align_corners=True,
            train=self.train, axis_name=self.axis_name,
        )
        path_4 = FeatureFusionBlockCustom(self.features, name="refinenet4", **common)(
            l4, size=l3.shape[1:3]
        )
        path_3 = FeatureFusionBlockCustom(self.features, name="refinenet3", **common)(
            path_4, l3, size=l2.shape[1:3]
        )
        path_2 = FeatureFusionBlockCustom(self.features, name="refinenet2", **common)(
            path_3, l2, size=l1.shape[1:3]
        )
        path_1 = FeatureFusionBlockCustom(self.features, name="refinenet1", **common)(
            path_2, l1
        )

        out = Conv(self.features // 2, 3, 1, 1, name="output_conv1")(path_1)
        out = resize_bilinear(out, (patch_h * 14, patch_w * 14), align_corners=True)
        out = Conv(32, 3, 1, 1, name="output_conv2_0")(out)
        return nn.relu(out)


class MidasNetSemantics(nn.Module):
    features: int = 64
    backbone: str = "efficientnet_lite3"
    dinov2_type: str = "dinov2_vits14"
    non_negative: bool = True
    use_lb: bool = False
    use_dgr: bool = False
    dinov2_image_size: tuple = (224, 280)
    axis_name: Optional[str] = None
    # Lowering switch for the fusion/depth-head ResidualBlocks (see
    # ResidualBlock.merge_entry). Same math and params either way; exposed at
    # the model level so TPU A/Bs and the numeric sweep can isolate the merged
    # conv lowering (benchmarks/ab_fusion_stack.py, tpu_numeric_sweep.py).
    # Default ON: the TPU numeric sweep's flagship_merged_entry variant passed
    # (rel-L2 1.04e-3, same as the unmerged flagship's 1.05e-3, 2026-08-18)
    # and the full-tail A/B measured 1.07x fwd AND 1.07x bwd on the v5e
    # (ab_fusion_stack.py RESULT block).
    merge_residual_entry: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        f = self.features
        # use_dgr is accepted for config compatibility but NOT applied: the
        # reference's MidasNetSemantics.forward never calls the DGR blocks its
        # base-class __init__ constructs (midas_semantics.py:207-267 uses the
        # plain layer_X_rn) — those weights are dead in a semantics checkpoint.
        midas_features, pyramid = MidasNetSmall(
            features=f,
            backbone=self.backbone,
            head_32=True,
            axis_name=self.axis_name,
            name="midas",
        )(x, train=train)
        l4, path_4, path_3, path_2, path_1 = pyramid

        # Frozen DINOv2 branch at half resolution (midas_semantics.py:233-239).
        dh, dw = self.dinov2_image_size
        patch = VIT_CONFIGS[self.dinov2_type][3]
        x_d = resize_bilinear(x, (dh, dw), align_corners=True)
        token_layers = ViT(self.dinov2_type, name="dinov2")(x_d, n_layers=4, train=train)
        token_layers = [jax.lax.stop_gradient(t) for t in token_layers]
        dinov2_features = Dinov2Head(
            128, train=train, axis_name=self.axis_name, name="dinov2_head"
        )(token_layers, dh // patch, dw // patch)
        dinov2_features = resize_bilinear(
            dinov2_features, midas_features.shape[1:3], align_corners=True
        )

        attended = CrossAttention(
            f // 2, train=train, axis_name=self.axis_name, name="cross_attention"
        )(midas_features, dinov2_features)
        concat = jnp.concatenate([attended, midas_features], axis=-1)

        rb = dict(
            train=train, axis_name=self.axis_name,
            merge_entry=self.merge_residual_entry,
        )
        fused = ResidualBlock(f, name="fusion_blocks_0", **rb)(concat)

        h = ResidualBlock(f // 2, name="fusion_head_0", **rb)(fused)
        h = Conv(f // 2, 3, 1, 1, name="fusion_head_1")(h)
        h = BatchNorm(not train, self.axis_name, name="fusion_head_bn")(h)
        h = nn.relu(h)

        h = ResidualBlock(f // 4, name="depth_head_0", **rb)(h)
        depth = Conv(1, 3, 1, 1, name="depth_head_1")(h)
        if self.non_negative:
            depth = nn.relu(depth)

        if self.use_lb:
            rel = depth[..., 0]
            metric = LocalBinsBlock(name="local_bins")(
                [depth, l4, path_4, path_3, path_2, path_1], rel
            )
            return metric
        return depth[..., 0]
