"""MidasNetSmall — the primary encoder-decoder depth model.

Topology parity with the reference's MidasNet_small (src/network/midas_net_custom.py:45-185):
EfficientNet-Lite3 four-stage encoder; 3x3 reassemble convs expanding to
features*(1,2,4,8) = 64/128/256/512; a cascade of four FeatureFusionBlockCustom
refinenets (bn=False, align_corners=True, expand on 4..2); an output head
conv64->32, 2x half-pixel upsample, conv32->32, ReLU, 1x1 -> 1, ReLU. Optional
DGR edge-sharpening on the reassembled features (midas_net_custom.py:14-43) and
an optional LocalBins metric head (midas_net_custom.py:115-132).

``head_32`` mode stops the head before the final 1x1 (used by MidasNetSemantics,
which removes that layer — src/network/midas_semantics.py:159-163) and returns
32-channel features instead of depth.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.blocks import Conv, FeatureFusionBlockCustom, ScratchConvs, interpolate
from ..nn.efficientnet import EfficientNetLite
from .localbins import LocalBinsBlock

_LAPLACIAN = np.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)


def _fixed_depthwise3x3(x: jnp.ndarray, tap: np.ndarray) -> jnp.ndarray:
    """Frozen depthwise 3x3 with a constant kernel (DGR's Laplacians are
    non-trainable in the reference — buffers, not parameters)."""
    c = x.shape[-1]
    kernel = jnp.asarray(tap)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    import jax

    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class DGR(nn.Module):
    """Depth Gradient Refinement (midas_net_custom.py:14-43): frozen Laplacian
    pair + SE-style channel recalibration + depthwise spatial conv, residual."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        l2 = _fixed_depthwise3x3(x, _LAPLACIAN)
        l3 = _fixed_depthwise3x3(x, _LAPLACIAN * _LAPLACIAN)
        f = jnp.concatenate([x, l2, l3], axis=-1)  # (..., 3c)
        se = jnp.mean(f, axis=(1, 2), keepdims=True)
        se = nn.gelu(Conv(max(c // 8, 1), 1, name="recalib1")(se), approximate=False)
        se = nn.sigmoid(Conv(3 * c, 1, name="recalib3")(se))
        f = f * se
        f = Conv(3 * c, 3, 1, 1, groups=3 * c, name="spatial")(f)
        return f[..., :c] + x


class MidasNetSmall(nn.Module):
    features: int = 64
    backbone: str = "efficientnet_lite3"
    non_negative: bool = True
    align_corners: bool = True
    expand: bool = True
    use_lb: bool = False
    use_dgr: bool = False
    head_32: bool = False  # MidasNetSemantics surgery: drop the final 1x1->1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        layers = EfficientNetLite(self.backbone, self.axis_name, name="pretrained")(
            x, train=train
        )
        rn = ScratchConvs(self.features, self.expand, name="scratch")(layers)
        if self.use_dgr:
            rn = [DGR(name=f"dgr{i + 1}")(r) for i, r in enumerate(rn)]
        l1, l2, l3, l4 = rn

        f = self.features
        mults = (1, 2, 4, 8) if self.expand else (1, 1, 1, 1)
        path_4 = FeatureFusionBlockCustom(
            f * mults[3], expand=self.expand, align_corners=self.align_corners,
            train=train, axis_name=self.axis_name, name="refinenet4",
        )(l4)
        path_3 = FeatureFusionBlockCustom(
            f * mults[2], expand=self.expand, align_corners=self.align_corners,
            train=train, axis_name=self.axis_name, name="refinenet3",
        )(path_4, l3)
        path_2 = FeatureFusionBlockCustom(
            f * mults[1], expand=self.expand, align_corners=self.align_corners,
            train=train, axis_name=self.axis_name, name="refinenet2",
        )(path_3, l2)
        path_1 = FeatureFusionBlockCustom(
            f * mults[0], align_corners=self.align_corners,
            train=train, axis_name=self.axis_name, name="refinenet1",
        )(path_2, l1)

        # Output head (midas_net_custom.py:105-113). Interpolate here is the
        # reference's Interpolate(scale_factor=2) whose default is
        # align_corners=False (blocks.py:212).
        h = Conv(f // 2, 3, 1, 1, name="output_conv0")(path_1)
        h = interpolate(h, scale_factor=2, align_corners=False)
        h = Conv(32, 3, 1, 1, name="output_conv2")(h)
        h = nn.relu(h)
        if self.head_32:
            # Semantics variant: 32-ch features + decoder pyramid for LocalBins.
            return h, (l4, path_4, path_3, path_2, path_1)
        out = Conv(1, 1, name="output_conv4")(h)
        if self.non_negative:
            out = nn.relu(out)

        if self.use_lb:
            rel_depth = out[..., 0]
            lb_in = [out, l4, path_4, path_3, path_2, path_1]
            metric = LocalBinsBlock(name="local_bins")(lb_in, rel_depth)
            return metric
        return out[..., 0]
