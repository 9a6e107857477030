"""ResNet/ResNeXt backbone family, stage-sliced for MiDaS encoders.

The full MidasNet uses ResNeXt101-32x8d-WSL via torch.hub
(src/network/blocks.py:189-204): stem = conv7 s2 + bn + relu + maxpool3 s2
followed by four bottleneck stages whose outputs (256/512/1024/2048 ch at
/4 /8 /16 /32) feed the scratch convs. This is a from-scratch Flax
implementation of the standard (torchvision-convention) topology — grouped 3x3
bottlenecks with base_width scaling — returning the four stage outputs directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .blocks import BatchNorm, Conv


class Bottleneck(nn.Module):
    planes: int  # base planes; output = planes * 4
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        h = Conv(width, 1, use_bias=False, name="conv1")(x)
        h = BatchNorm(not self.train, self.axis_name, name="bn1")(h)
        h = nn.relu(h)
        h = Conv(width, 3, self.stride, 1, use_bias=False, groups=self.groups, name="conv2")(h)
        h = BatchNorm(not self.train, self.axis_name, name="bn2")(h)
        h = nn.relu(h)
        h = Conv(out_ch, 1, use_bias=False, name="conv3")(h)
        h = BatchNorm(not self.train, self.axis_name, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            sc = Conv(out_ch, 1, self.stride, 0, use_bias=False, name="downsample_conv")(x)
            sc = BatchNorm(not self.train, self.axis_name, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class ResNetBackbone(nn.Module):
    """Stage-sliced: __call__ -> (layer1, layer2, layer3, layer4).

    layers=(3,4,23,3), groups=32, base_width=8 gives ResNeXt101-32x8d, the
    architecture of the WSL checkpoint the reference downloads.
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    groups: int = 32
    base_width: int = 8
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        h = Conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        h = BatchNorm(not train, self.axis_name, name="bn1")(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))

        feats = []
        for si, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = Bottleneck(
                    planes,
                    stride,
                    self.groups,
                    self.base_width,
                    train,
                    self.axis_name,
                    name=f"layer{si + 1}_{bi}",
                )(h)
            feats.append(h)
        return tuple(feats)
