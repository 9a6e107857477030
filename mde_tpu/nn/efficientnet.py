"""EfficientNet-Lite backbone family (tf_efficientnet_lite0..4), stage-sliced.

The reference downloads ``tf_efficientnet_lite3`` through torch.hub
(gen-efficientnet; src/network/blocks.py:166-173) and slices it into four feature
stages for the MiDaS-small encoder (src/network/blocks.py:176-186):

  layer1 = stem + stages 1-2   -> 32 ch @ /4
  layer2 = stage 3             -> 48 ch @ /8
  layer3 = stages 4-5          -> 136 ch @ /16
  layer4 = stages 6-7          -> 384 ch @ /32       (lite3 channel table)

This is a from-scratch Flax implementation of the architecture (not a port of the
hub code): Lite variants of EfficientNet use ReLU6, no squeeze-excite, a fixed
32-ch stem / 1280-ch head, and do not depth-scale the first or last stage. The
``tf_`` prefix means TensorFlow SAME padding (asymmetric for strided convs),
which we reproduce exactly so that imported reference checkpoints produce
identical activations. Returns the four sliced feature maps directly — no
forward hooks, no global activation dict (the functional replacement for
src/network/backbones/utils.py:53-60).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import _kaiming_uniform


def _round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _tf_same_pads(size: int, k: int, s: int) -> tuple[int, int]:
    """TensorFlow SAME padding: asymmetric, extra pixel on the high side."""
    if size % s == 0:
        total = max(k - s, 0)
    else:
        total = max(k - (size % s), 0)
    return total // 2, total - total // 2


class TFConv(nn.Module):
    """Conv2d with TF SAME padding (what torch gen-efficientnet's Conv2dSame does)."""

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        pad_h = _tf_same_pads(x.shape[1], k, s)
        pad_w = _tf_same_pads(x.shape[2], k, s)
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(s, s),
            padding=(pad_h, pad_w),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=_kaiming_uniform,
        )(x)


class TFBatchNorm(nn.Module):
    """BN with TF-effnet defaults: eps 1e-3, momentum 0.1 (torch convention).

    Stats in fp32 (flax internals), arithmetic in the activation dtype — see
    nn/blocks.py::BatchNorm for the HBM-traffic rationale.
    """

    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-3,
            axis_name=self.axis_name,
            dtype=x.dtype,
        )(x)


class MBConvLite(nn.Module):
    """Mobile inverted bottleneck, Lite flavor: ReLU6, no squeeze-excite."""

    out_ch: int
    kernel_size: int
    stride: int
    expand_ratio: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            h = TFConv(mid, 1, 1, name="conv_pw")(h)
            h = TFBatchNorm(self.train, self.axis_name, name="bn1")(h)
            h = nn.relu6(h)
        h = TFConv(mid, self.kernel_size, self.stride, groups=mid, name="conv_dw")(h)
        h = TFBatchNorm(self.train, self.axis_name, name="bn2")(h)
        h = nn.relu6(h)
        h = TFConv(self.out_ch, 1, 1, name="conv_pwl")(h)
        h = TFBatchNorm(self.train, self.axis_name, name="bn3")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


# Per-stage base config of EfficientNet-B0: (expand, channels, repeats, stride, kernel)
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_mult, depth_mult) per lite variant
LITE_MULTIPLIERS = {
    "efficientnet_lite0": (1.0, 1.0),
    "efficientnet_lite1": (1.0, 1.1),
    "efficientnet_lite2": (1.1, 1.2),
    "efficientnet_lite3": (1.2, 1.4),
    "efficientnet_lite4": (1.4, 1.8),
}


def lite_stage_channels(variant: str) -> list[int]:
    """Output channels of the four sliced encoder stages (e.g. lite3 ->
    [32, 48, 136, 384], the table at src/network/blocks.py:125)."""
    width, _ = LITE_MULTIPLIERS[variant]
    ch = [_round_filters(c, width) for (_, c, _, _, _) in _B0_STAGES]
    return [ch[1], ch[2], ch[4], ch[6]]


class EfficientNetLite(nn.Module):
    """Stage-sliced encoder: __call__ -> (layer1, layer2, layer3, layer4)."""

    variant: str = "efficientnet_lite3"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        width, depth = LITE_MULTIPLIERS[self.variant]
        # Lite: fixed 32-ch stem.
        h = TFConv(32, 3, 2, name="conv_stem")(x)
        h = TFBatchNorm(train, self.axis_name, name="bn1")(h)
        h = nn.relu6(h)

        feats = []
        for si, (expand, ch, repeats, stride, k) in enumerate(_B0_STAGES):
            out_ch = _round_filters(ch, width)
            # Lite: first and last stage keep their base repeat count.
            reps = repeats if si in (0, len(_B0_STAGES) - 1) else _round_repeats(repeats, depth)
            for r in range(reps):
                h = MBConvLite(
                    out_ch,
                    k,
                    stride if r == 0 else 1,
                    expand,
                    train,
                    self.axis_name,
                    name=f"blocks_{si}_{r}",
                )(h)
            feats.append(h)
        # Slicing of src/network/blocks.py:176-186: stages (1,2) / 3 / (4,5) / (6,7).
        return feats[1], feats[2], feats[4], feats[6]
