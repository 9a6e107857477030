"""SimpleUNet: the course-provided baseline model.

Topology parity with the example notebook (monocular-depth-example-notebook.ipynb
cells 10-11, the only place it is defined — the reference's ``network/u_net.py``
import is broken, SURVEY.md §7.5): two UNetBlocks down (3->64->128 with a 2x2
max-pool between), bilinear align-corners upsample back, skip-concat, two blocks
up (192->64->32), 1x1 head, ``sigmoid * 10`` output. BASELINE.json config #1 uses
this for the CPU-runnable overfit-16 slice.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import BatchNorm, Conv
from ..ops.resize import resize_bilinear


class UNetBlock(nn.Module):
    features: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, 3, 1, 1, name="conv1")(x)
        x = BatchNorm(not self.train, self.axis_name, name="bn1")(x)
        x = nn.relu(x)
        x = Conv(self.features, 3, 1, 1, name="conv2")(x)
        x = BatchNorm(not self.train, self.axis_name, name="bn2")(x)
        return nn.relu(x)


class SimpleUNet(nn.Module):
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) normalized RGB -> (B, H, W) depth in (0, 10)."""
        enc1 = UNetBlock(64, train, self.axis_name, name="enc1")(x)
        x = nn.max_pool(enc1, (2, 2), strides=(2, 2))
        x = UNetBlock(128, train, self.axis_name, name="enc2")(x)
        x = resize_bilinear(x, enc1.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, enc1], axis=-1)
        x = UNetBlock(64, train, self.axis_name, name="dec2")(x)
        x = UNetBlock(32, train, self.axis_name, name="dec1")(x)
        x = Conv(1, 1, 1, 0, name="final")(x)
        return (nn.sigmoid(x) * 10.0)[..., 0]
