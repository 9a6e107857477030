"""Bilinear resize with exact PyTorch corner semantics, as MXU matmuls.

The reference leans on ``torch.nn.functional.interpolate(mode='bilinear')``
pervasively, in both corner conventions:

- ``align_corners=True``: depth-target resize (src/main.py:37-48), fusion-block
  upsampling (src/network/blocks.py:432-434), prediction resize to 426x560
  (src/util.py:308-313), DINOv2 branch resizes (src/network/midas_semantics.py:233,243).
- ``align_corners=False`` (half-pixel): the ``Interpolate(scale_factor=2)`` module in
  decoder heads (src/network/blocks.py:208-240 — its default).

``jax.image.resize`` implements neither convention exactly (it uses scale-and-
translate sampling with antialiasing semantics of its own), so metric parity with
the reference requires a custom implementation. Bilinear resampling is separable,
so each spatial axis is interpolated independently with one of two lowering
strategies chosen by size:

- small axes (<= 64): a dense (out x in) interpolation matrix applied as a
  matmul at precision='highest' — rides the MXU, exact fp32;
- large axes: two row-gathers + a lerp with the same fp32 tap weights. The
  dense form is O(out*in) FLOPs, which at decoder resolutions (e.g. a 2x
  upsample of a 224x288x64 feature map) costs hundreds of GFLOPs per call;
  the gather form is O(out) memory traffic on the VPU.

Both forms are exactly differentiable (transpose-matmul / scatter-add VJPs) and
numerically identical up to fp32 rounding of ``a*(1-f)+b*f`` vs ``a+(b-a)*f``.
Tap indices/weights are built with numpy at trace time (static shapes) and
cached; coordinates are computed in float32 exactly as PyTorch does.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=512)
def _interp_taps(in_size: int, out_size: int, align_corners: bool):
    """(i0, i1, frac) gather taps for one axis, PyTorch coordinate conventions.

    align_corners=True:  src = o * (in-1)/(out-1)
    align_corners=False: src = max(0, (o+0.5) * in/out - 0.5) (half-pixel, clamped)

    PyTorch computes source coordinates in float32 (area_pixel_compute_scale /
    _source_index use float accumulation); match that for bit-level parity.
    """
    o = np.arange(out_size, dtype=np.float32)
    if align_corners:
        scale = np.float32(in_size - 1) / np.float32(max(out_size - 1, 1))
        src = (o * scale).astype(np.float32)
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = np.maximum(np.float32(0.0), (o + np.float32(0.5)) * scale - np.float32(0.5))
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    return i0, i1, frac


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix, float32."""
    i0, i1, frac = _interp_taps(in_size, out_size, align_corners)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(w, (np.arange(out_size), i0), 1.0 - frac)
    np.add.at(w, (np.arange(out_size), i1), frac)
    return w


# Beyond this in_size a dense (out x in) matrix stops being practical and the
# two-gather form takes over (none of the reference's shapes get close).
_MATMUL_MAX_IN = 4096


def _resize_axis(
    x: jnp.ndarray, axis: int, out_size: int, align_corners: bool, exact: bool
) -> jnp.ndarray:
    """Interpolate one axis as a dense-matrix contraction on the MXU.

    Measured on the target TPU (benchmarks/ab_lowerings.py): at the flagship's
    shapes both the two-gather and the matmul lowerings are HBM-traffic-bound
    and within ~1.7x of each other, with the matmul form winning every fp32
    case and the 2x-upsample bf16 cases — so the matmul IS the default, and
    gathers only cover absurdly long axes. ``exact`` keeps fp32 taps +
    precision=highest (bit-stable parity paths); otherwise the contraction
    runs in the activation dtype at native precision (for bf16 activations
    this halves the HBM traffic, and the ~1e-2 interpolation rounding is far
    below bf16 activation noise).
    """
    in_size = x.shape[axis]
    if in_size <= _MATMUL_MAX_IN:
        w = jnp.asarray(_interp_matrix(in_size, out_size, align_corners))
        if exact:
            y = jnp.tensordot(w, x, axes=((1,), (axis,)), precision="highest")
        else:
            y = jnp.tensordot(w.astype(x.dtype), x, axes=((1,), (axis,)))
        return jnp.moveaxis(y, 0, axis)
    i0, i1, frac = _interp_taps(in_size, out_size, align_corners)
    a = jnp.take(x, jnp.asarray(i0), axis=axis)
    b = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = jnp.asarray(frac, dtype=x.dtype).reshape(shape)
    return a + (b - a) * w1


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Resize the two spatial axes of ``x`` to ``size`` with bilinear sampling.

    Accepts (H, W), (B, H, W) or (..., H, W, C) — any rank >= 2; the spatial axes
    are the last two for rank <= 3 and the (-3, -2) axes (NHWC) for rank >= 4.

    Dtype policy: float32 (and integer) inputs interpolate exactly in fp32 —
    these are the metric-parity-critical paths (depth targets, submission-size
    predictions, CPU tests). Sub-fp32 float inputs (bf16/f16 activations inside
    a mixed-precision model) interpolate in their own dtype: half the HBM
    traffic on a bandwidth-bound op, rounding well under activation noise.
    """
    out_h, out_w = int(size[0]), int(size[1])
    channel_last = x.ndim >= 4
    h_axis = x.ndim - 3 if channel_last else x.ndim - 2
    w_axis = h_axis + 1
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if (in_h, in_w) == (out_h, out_w):
        return x

    dtype = x.dtype
    exact = not (jnp.issubdtype(dtype, jnp.floating) and jnp.finfo(dtype).bits < 32)
    compute = x.astype(jnp.float32) if (exact and dtype != jnp.float32) else x
    # Same-size axes are exact identities in both conventions (src == o).
    if in_h != out_h:
        compute = _resize_axis(compute, h_axis, out_h, align_corners, exact)
    if in_w != out_w:
        compute = _resize_axis(compute, w_axis, out_w, align_corners, exact)
    return compute.astype(dtype)


# ------------------------------------------------------------------- bicubic
#
# Torch-semantics bicubic (cubic convolution, A=-0.75), needed for DINOv2's
# ``interpolate_pos_encoding`` (hub vision_transformer.py): the flagship's
# semantic branch always runs off the 37x37 pretrain grid
# (src/network/midas_semantics.py:178,233-239), so every real-weight forward
# exercises this path. Torch's cubic sampler differs from the bilinear one in
# two ways replicated here: negative half-pixel source coords are NOT clamped
# (area_pixel_compute_source_index with cubic=true) — tap *indices* are
# clamped into range instead — and each output sample mixes 4 taps with the
# Keys cubic-convolution weights.

_CUBIC_A = np.float32(-0.75)


@functools.lru_cache(maxsize=256)
def _cubic_matrix(
    in_size: int, out_size: int, align_corners: bool, src_scale: float | None = None
) -> np.ndarray:
    """Dense (out_size, in_size) bicubic interpolation matrix, float32.

    ``src_scale`` overrides the source-coordinate scale (the reciprocal of
    F.interpolate's ``scale_factor``): DINOv2's interpolate_offset=0.1 path
    calls interpolate with scale_factor=(out+0.1)/in, so the kernel samples at
    src = (o+0.5) * in/(out+0.1) - 0.5 rather than with the exact in/out ratio.
    """
    o = np.arange(out_size, dtype=np.float32)
    if align_corners:
        scale = np.float32(in_size - 1) / np.float32(max(out_size - 1, 1))
        src = o * scale
    else:
        scale = (
            np.float32(src_scale)
            if src_scale is not None
            else np.float32(in_size) / np.float32(out_size)
        )
        src = (o + np.float32(0.5)) * scale - np.float32(0.5)  # no clamp (cubic)
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    A = _CUBIC_A

    def cc1(x):  # |x| <= 1
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def cc2(x):  # 1 < |x| < 2
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    weights = (cc2(frac + 1), cc1(frac), cc1(1 - frac), cc2(2 - frac))
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    for tap, wt in enumerate(weights):
        idx = np.clip(i0 - 1 + tap, 0, in_size - 1)  # upsample_get_value_bounded
        np.add.at(m, (rows, idx), wt)
    return m


def resize_bicubic(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = False,
    src_scales: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize the two spatial axes with torch-semantics bicubic sampling.

    Same rank/axis conventions as ``resize_bilinear``. Always lowered as dense
    (out x in) matmuls in fp32 at precision='highest' — the consumers
    (pos-embed grids) are tiny, and exactness matters more than bandwidth.
    ``src_scales``: optional per-axis (h, w) source scales for the DINOv2
    interpolate_offset semantics (pass in/(out+0.1)).
    """
    out_h, out_w = int(size[0]), int(size[1])
    channel_last = x.ndim >= 4
    h_axis = x.ndim - 3 if channel_last else x.ndim - 2
    w_axis = h_axis + 1
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    dtype = x.dtype
    compute = x.astype(jnp.float32)
    for axis, in_size, out_size, ss in (
        (h_axis, in_h, out_h, src_scales[0] if src_scales else None),
        (w_axis, in_w, out_w, src_scales[1] if src_scales else None),
    ):
        if in_size == out_size and ss is None:
            continue
        m = jnp.asarray(_cubic_matrix(in_size, out_size, align_corners, ss))
        compute = jnp.moveaxis(
            jnp.tensordot(m, compute, axes=((1,), (axis,)), precision="highest"),
            0,
            axis,
        )
    return compute.astype(dtype)


def upsample2x(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """2x bilinear upsample, matching ``Interpolate(scale_factor=2)``.

    The reference decoder heads use scale_factor=2 with align_corners=False
    (src/network/blocks.py:208-240, default argument); fusion blocks use
    align_corners=True (src/network/blocks.py:432-434).
    """
    channel_last = x.ndim >= 4
    h_axis = x.ndim - 3 if channel_last else x.ndim - 2
    return resize_bilinear(
        x, (2 * x.shape[h_axis], 2 * x.shape[h_axis + 1]), align_corners=align_corners
    )
