"""MidasNet — the full MiDaS v2.1 model (src/network/midas_net.py:12-76).

ResNeXt101-32x8d encoder, features=256 scratch convs (no expand), four plain
FeatureFusionBlocks (RCU + 2x align-corners upsample), and the v2.1 head:
conv256->128, 2x half-pixel upsample, conv128->32, ReLU, 1x1 -> 1, ReLU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import Conv, FeatureFusionBlock, ScratchConvs, interpolate
from ..nn.resnext import ResNetBackbone


class MidasNet(nn.Module):
    features: int = 256
    non_negative: bool = True
    # (3, 4, 23, 3) = ResNeXt101-32x8d, the WSL checkpoint architecture;
    # reducible for tests (the per-block topology is depth-independent).
    encoder_layers: tuple = (3, 4, 23, 3)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        layers = ResNetBackbone(
            layers=self.encoder_layers, axis_name=self.axis_name, name="pretrained"
        )(x, train=train)
        l1, l2, l3, l4 = ScratchConvs(self.features, expand=False, name="scratch")(layers)

        path_4 = FeatureFusionBlock(self.features, name="refinenet4")(l4)
        path_3 = FeatureFusionBlock(self.features, name="refinenet3")(path_4, l3)
        path_2 = FeatureFusionBlock(self.features, name="refinenet2")(path_3, l2)
        path_1 = FeatureFusionBlock(self.features, name="refinenet1")(path_2, l1)

        h = Conv(128, 3, 1, 1, name="output_conv0")(path_1)
        h = interpolate(h, scale_factor=2, align_corners=False)
        h = Conv(32, 3, 1, 1, name="output_conv2")(h)
        h = nn.relu(h)
        h = Conv(1, 1, name="output_conv4")(h)
        if self.non_negative:
            h = nn.relu(h)
        return h[..., 0]
