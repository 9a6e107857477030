"""Flax building blocks: torch-convention convs + the RefineNet fusion decoder.

Decoder parity targets (topology, not code) in the reference:
- ``ResidualConvUnit``        src/network/blocks.py:243-279
- ``ResidualConvUnitCustom``  src/network/blocks.py:319-376 (optional BN)
- ``FeatureFusionBlock``      src/network/blocks.py:282-314 (2x up, align=True)
- ``FeatureFusionBlockCustom``src/network/blocks.py:379-438 (expand halving,
                              1x1 out conv, size-targeted upsample)
- ``ScratchConvs``            src/network/blocks.py:133-163 (_make_scratch)

Everything is NHWC (TPU-native layout). ``Conv``/``ConvTranspose`` reproduce
PyTorch's exact padding arithmetic — explicit symmetric padding rather than
XLA 'SAME' (whose asymmetric pad placement differs for strided convs) — so that
(a) shapes match the reference everywhere and (b) imported ``.pth`` weights
produce identical activations. Initialization follows torch defaults
(kaiming-uniform with a=sqrt(5), uniform bias bound 1/sqrt(fan_in)) so from-scratch
training starts from the same distribution family as the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default weight init (kaiming_uniform, a=sqrt(5)) in HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class _ConvParams(nn.Module):
    """Declares exactly ``flax.linen.Conv``'s parameters — same names, shapes,
    and initializers — WITHOUT applying the convolution, so a parent module can
    merge several convs' kernels into one MXU pass while the checkpoint param
    tree (``.../Conv_0/kernel``) stays byte-identical to the unmerged form.
    Init values are identical too: flax derives param RNG from the param path,
    not from creation order."""

    features: int
    kernel_size: int
    groups: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.kernel_size
        kernel = self.param(
            "kernel", _kaiming_uniform, (k, k, in_ch // self.groups, self.features)
        )
        bias = None
        if self.use_bias:
            fan_in = (in_ch // self.groups) * k * k
            bias = self.param("bias", _torch_bias_init(fan_in), (self.features,))
        return kernel, bias


class Conv(nn.Module):
    """Conv2d with torch padding semantics: pad ``padding`` on each side.

    ``__call__(x, kernel_only=True)`` returns ``(kernel, bias)`` instead of
    applying the conv — declared at the identical param path/shape/init — for
    callers that fuse multiple convs over the same input into one kernel
    (see models/midas_semantics.py ResidualBlock's merged entry).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x, kernel_only: bool = False):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        if kernel_only:
            return _ConvParams(
                self.features, k, self.groups, self.use_bias, name="Conv_0"
            )(in_ch)
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(s, s),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=_kaiming_uniform,
            bias_init=_torch_bias_init(fan_in),
        )(x)


class ConvTranspose(nn.Module):
    """ConvTranspose2d with torch semantics: out = (in-1)*s - 2p + k.

    Implemented directly as an input-dilated convolution with a spatially
    flipped kernel, which is exactly what torch computes — so a converted
    ``.pth`` kernel (after OIHW->HWIO transpose) drops straight in.

    Lowering note: an output-phase ("pixel-shuffle") decomposition that
    computes only the (k/s)^2 real taps per output was A/B-measured against
    this dilated form on the target TPU (benchmarks/ab_conv_transpose.py) and
    LOST at every flagship shape (0.54-0.96x) — XLA's TPU conv emitter already
    skips dilation zeros, and the phase-interleave costs an extra HBM pass.
    The dilated form is the keeper.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _kaiming_uniform, (k, k, in_ch, self.features)
        )
        if x.dtype != kernel.dtype:
            # init-time mix (bf16 activations, fresh fp32 params): promote like
            # flax.nn.Conv does; the training path casts params beforehand.
            dt = jnp.promote_types(x.dtype, kernel.dtype)
            x, kernel = x.astype(dt), kernel.astype(dt)
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _torch_bias_init(in_ch * k * k), (self.features,))
            y = y + bias
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1) over NHWC.

    ``axis_name`` enables cross-device statistics sync when the train step runs
    under shard_map/pmap with that mesh axis — the data-parallel sync_batchnorm
    the single-GPU reference never needed (SURVEY.md §7.4 item 3).

    Mixed-precision policy: the normalize/scale/shift math runs in the
    activation dtype (flax computes the batch statistics themselves in float32
    regardless — see flax.linen.normalization._compute_stats — and the running
    stats are stored fp32), so bf16 activations are never materialized in fp32.
    On this TPU that matters: the chip is HBM-bound (~26 GB/s effective, see
    BASELINE.md), and a full-res fp32 island costs two extra memory passes per
    norm layer. CPU (tests, golden parity) computes fp32 end to end.
    """

    use_running_average: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=x.dtype,
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm: statistics in float32 (flax internals), arithmetic in the
    activation dtype (same HBM-traffic rationale as BatchNorm above)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=x.dtype)(x)


def interpolate(x, scale_factor=None, size=None, align_corners=False):
    """The reference's Interpolate module as a function (blocks.py:208-240)."""
    if size is not None:
        return resize_bilinear(x, tuple(size), align_corners=align_corners)
    h_axis = x.ndim - 3 if x.ndim >= 4 else x.ndim - 2
    out = (int(x.shape[h_axis] * scale_factor), int(x.shape[h_axis + 1] * scale_factor))
    return resize_bilinear(x, out, align_corners=align_corners)


class ResidualConvUnit(nn.Module):
    """relu-conv3x3-relu-conv3x3 + skip (blocks.py:243-279).

    The reference's ``nn.ReLU(inplace=True)`` mutates ``x`` itself, so its
    ``out + x`` adds the RELU'D input — the skip connection is relu(x), not x
    (verified against a torch reconstruction; the custom RCU uses a
    non-inplace ReLU and does add the original x)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        out = Conv(self.features, 3, 1, 1, use_bias=True, name="conv1")(h)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, use_bias=True, name="conv2")(out)
        return out + h


class ResidualConvUnitCustom(nn.Module):
    """RCU with optional BatchNorm between conv and activation (blocks.py:319-376)."""

    features: int
    bn: bool = False
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv(self.features, 3, 1, 1, use_bias=True, name="conv1")(out)
        if self.bn:
            out = BatchNorm(not self.train, self.axis_name, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, use_bias=True, name="conv2")(out)
        if self.bn:
            out = BatchNorm(not self.train, self.axis_name, name="bn2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Plain MiDaS fusion: optional skip RCU, RCU, 2x bilinear up align=True
    (blocks.py:282-314). Call with (x,) or (x, skip)."""

    features: int

    @nn.compact
    def __call__(self, *xs):
        output = xs[0]
        if len(xs) == 2:
            output = output + ResidualConvUnit(self.features, name="resConfUnit1")(xs[1])
        output = ResidualConvUnit(self.features, name="resConfUnit2")(output)
        return interpolate(output, scale_factor=2, align_corners=True)


class FeatureFusionBlockCustom(nn.Module):
    """MiDaS-small fusion block (blocks.py:379-438).

    expand=True halves the channel count in the 1x1 out conv; the upsample is
    2x by default or targeted to ``size`` when given (DPT passes explicit sizes,
    dpt_depth.py:252-257).
    """

    features: int
    bn: bool = False
    expand: bool = False
    align_corners: bool = True
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, *xs, size=None):
        output = xs[0]
        if len(xs) == 2:
            res = ResidualConvUnitCustom(
                self.features, self.bn, self.train, self.axis_name, name="resConfUnit1"
            )(xs[1])
            output = output + res
        output = ResidualConvUnitCustom(
            self.features, self.bn, self.train, self.axis_name, name="resConfUnit2"
        )(output)
        if size is None:
            output = interpolate(output, scale_factor=2, align_corners=self.align_corners)
        else:
            output = interpolate(output, size=size, align_corners=self.align_corners)
        out_features = self.features // 2 if self.expand else self.features
        return Conv(out_features, 1, 1, 0, use_bias=True, name="out_conv")(output)


class ScratchConvs(nn.Module):
    """The per-level 3x3 reassemble convs of _make_scratch (blocks.py:133-163).

    Produces features*(1,2,4,8) channels when ``expand`` else uniform features.
    """

    features: int
    expand: bool = False

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        outs = []
        for i, layer in enumerate(layers):
            mult = 2**i if self.expand else 1
            outs.append(
                Conv(
                    self.features * mult, 3, 1, 1, use_bias=False, name=f"layer{i + 1}_rn"
                )(layer)
            )
        return outs
