"""Next-ViT-Large backbone (hybrid conv/transformer, BN-everywhere design).

The reference registers next_vit_large_6m but its own integration is broken —
src/network/backbones/next_vit.py:8 imports ``..external.next_vit...`` and the
``external/`` directory does not exist (SURVEY.md §7.5). This is therefore a
from-scratch implementation of the published architecture (Next-ViT paper,
arXiv:2207.05501) at block-level granularity, sized as next_vit_large:

- stem: four 3x3 ConvBNReLU (64/32/64/64, strides 2/1/1/2) -> /4
- stage channels (96, 256, 512, 1024) at /4 /8 /16 /32; block counts
  (3, 4, 30, 3) = 40 blocks total, matching the reference hook table
  [2, 6, 36, 39] (dpt_depth.py:181) which taps the last block of each stage
- NCB (Next Convolution Block): multi-head conv attention (grouped 3x3 + BN +
  1x1 projection) residual + ConvFFN residual
- NTB (Next Transformer Block): channel-shrunk E-MHSA (avg-pool spatial
  reduction of K/V, sr_ratio 8/4/2/1 per stage) concatenated with an MHCA path,
  then ConvFFN; stages 2-4 end in one NTB (stage 3: every 5th block)
- BatchNorm throughout (the architecture's deployment-friendly choice)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .blocks import BatchNorm, Conv

NEXT_VIT_LARGE_CHANNELS = (96, 256, 512, 1024)
_DEPTHS = (3, 4, 30, 3)
_SR_RATIO = (8, 4, 2, 1)
_HEAD_DIM = 32


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel, self.stride, self.kernel // 2,
                 use_bias=False, groups=self.groups, name="conv")(x)
        x = BatchNorm(not self.train, self.axis_name, name="bn")(x)
        return nn.relu(x)


class MHCA(nn.Module):
    """Multi-head conv attention: grouped 3x3 + BN + ReLU + 1x1 projection."""

    features: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        groups = max(self.features // _HEAD_DIM, 1)
        h = ConvBNReLU(self.features, 3, 1, groups, self.train, self.axis_name,
                       name="group_conv")(x)
        h = Conv(self.features, 1, use_bias=False, name="proj")(h)
        return BatchNorm(not self.train, self.axis_name, name="proj_bn")(h)


class ConvFFN(nn.Module):
    features: int
    ratio: int = 3
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        h = ConvBNReLU(self.features * self.ratio, 1, train=self.train,
                       axis_name=self.axis_name, name="fc1")(x)
        h = Conv(self.features, 1, use_bias=False, name="fc2")(h)
        return BatchNorm(not self.train, self.axis_name, name="fc2_bn")(h)


class NCB(nn.Module):
    features: int
    stride: int = 1
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.stride == 2 or x.shape[-1] != self.features:
            # Patch embed: avg-pool downsample + 1x1 channel projection.
            if self.stride == 2:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = Conv(self.features, 1, use_bias=False, name="patch_embed")(x)
            x = BatchNorm(not self.train, self.axis_name, name="patch_bn")(x)
        x = x + MHCA(self.features, self.train, self.axis_name, name="mhca")(x)
        return x + ConvFFN(self.features, 3, self.train, self.axis_name, name="ffn")(x)


class EMHSA(nn.Module):
    """Efficient MHSA: K/V spatially reduced by avg pooling (sr_ratio)."""

    features: int
    sr_ratio: int = 1
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = max(c // _HEAD_DIM, 1)
        hd = c // heads
        q = nn.Dense(c, name="q")(x).reshape(b, h * w, heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.avg_pool(
                x, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio)
            )
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        k = nn.Dense(c, name="k")(kv_in).reshape(b, kh * kw, heads, hd)
        v = nn.Dense(c, name="v")(kv_in).reshape(b, kh * kw, heads, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = nn.Dense(c, name="proj")(out.reshape(b, h * w, c))
        return out.reshape(b, h, w, c)


class NTB(nn.Module):
    features: int
    sr_ratio: int = 1
    shrink: float = 0.75
    stride: int = 1
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c_t = int(self.features * self.shrink)
        c_c = self.features - c_t
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x1 = Conv(c_t, 1, use_bias=False, name="proj1")(x)
        x1 = BatchNorm(not self.train, self.axis_name, name="proj1_bn")(x1)
        x1 = x1 + EMHSA(c_t, self.sr_ratio, self.train, self.axis_name, name="emhsa")(x1)
        x2 = Conv(c_c, 1, use_bias=False, name="proj2")(x1)
        x2 = BatchNorm(not self.train, self.axis_name, name="proj2_bn")(x2)
        x2 = x2 + MHCA(c_c, self.train, self.axis_name, name="mhca")(x2)
        h = jnp.concatenate([x1, x2], axis=-1)
        return h + ConvFFN(self.features, 3, self.train, self.axis_name, name="ffn")(h)


class NextViT(nn.Module):
    """next_vit_large; __call__ -> four NHWC stage maps (96/256/512/1024 ch)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i, (ch, s) in enumerate(zip((64, 32, 64, 64), (2, 1, 1, 2))):
            x = ConvBNReLU(ch, 3, s, train=train, axis_name=self.axis_name,
                           name=f"stem{i}")(x)

        feats = []
        for si, (ch, depth, sr) in enumerate(
            zip(NEXT_VIT_LARGE_CHANNELS, _DEPTHS, _SR_RATIO)
        ):
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                # Stage 3 interleaves one NTB per 5 blocks; stages 2/4 end in
                # one NTB; stage 1 is all-conv.
                is_ntb = (
                    (si == 1 and bi == depth - 1)
                    or (si == 2 and bi % 5 == 4)
                    or (si == 3 and bi == depth - 1)
                )
                if is_ntb:
                    x = NTB(
                        ch, sr_ratio=sr, stride=stride, train=train,
                        axis_name=self.axis_name, name=f"stage{si}_block{bi}",
                    )(x)
                else:
                    x = NCB(
                        ch, stride=stride, train=train, axis_name=self.axis_name,
                        name=f"stage{si}_block{bi}",
                    )(x)
            feats.append(x)
        return tuple(feats)
