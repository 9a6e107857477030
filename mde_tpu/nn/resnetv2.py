"""ResNetV2-50 stem (StdConv + GroupNorm, pre-activation) for the ViT-Hybrid
backbone of DPT_Hybrid (timm vit_base_r50_s16_384).

The hybrid backbone the reference taps (src/network/backbones/vit.py:120-205,
hooks [0, 1, 8, 11]) consists of a ResNetV2 with weight-standardized convs and
GroupNorm(32), layers (3, 4, 9), whose stage-1/stage-2 outputs (256/512 ch at
/4 and /8) are the first two DPT levels, and whose final /16 feature map feeds
the ViT patch embedding (1x1 "patch 1" projection). timm builds it from
StdConv2dSame with a 'same' stem, so all strided convs/pools use TF-SAME
asymmetric padding (parity-verified in tests/test_hybrid_torch_parity.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Module):
    """Conv with weight standardization and TF-SAME padding.

    timm's hybrid ResNetV2 (vit_base_r50_s16_384, the DPT_Hybrid backbone) is
    built from ``StdConv2dSame`` + ``stem_type='same'`` — asymmetric TF-SAME
    padding (extra pixel on the high side for strided convs on even dims), NOT
    torch-symmetric padding; eps 1e-6 inside the weight standardization.
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        from .efficientnet import _tf_same_pads

        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + 1e-6)
        pad_h = _tf_same_pads(x.shape[1], k, self.stride)
        pad_w = _tf_same_pads(x.shape[2], k, self.stride)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=(pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def _gn(x, name):
    # Stats in fp32 (flax internals), arithmetic in the activation dtype — see
    # nn/blocks.py::BatchNorm for the HBM-traffic rationale.
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=x.dtype, name=name)(x)


class PreactBottleneck(nn.Module):
    planes: int  # out = planes * 4
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = _gn(x, "gn1")
        h = nn.relu(h)
        shortcut = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            shortcut = StdConv(out_ch, 1, self.stride, name="downsample")(h)
        h = StdConv(self.planes, 1, name="conv1")(h)
        h = nn.relu(_gn(h, "gn2"))
        h = StdConv(self.planes, 3, self.stride, name="conv2")(h)
        h = nn.relu(_gn(h, "gn3"))
        h = StdConv(out_ch, 1, name="conv3")(h)
        return h + shortcut


class ResNetV2Stem(nn.Module):
    """Stages (3, 4, 9); returns (stage1 /4 256ch, stage2 /8 512ch, final /16 1024ch)."""

    layers: Sequence[int] = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        from .efficientnet import _tf_same_pads

        h = StdConv(64, 7, 2, name="conv_stem")(x)
        h = nn.relu(_gn(h, "gn_stem"))
        # MaxPool2dSame(3, 2): TF-SAME asymmetric -inf padding.
        ph, pw = _tf_same_pads(h.shape[1], 3, 2), _tf_same_pads(h.shape[2], 3, 2)
        h = jnp.pad(h, ((0, 0), ph, pw, (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        feats = []
        for si, blocks in enumerate(self.layers):
            planes = 64 * 2**si
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = PreactBottleneck(planes, stride, name=f"stage{si}_block{bi}")(h)
            feats.append(h)
        return tuple(feats)
