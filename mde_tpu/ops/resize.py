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
the reference requires a custom implementation. Bilinear resampling is separable
and linear, so we build the (out x in) interpolation matrix per axis (each row has
at most two nonzeros) and apply it as two dense matmuls. On TPU this maps straight
onto the MXU, is exactly differentiable (transpose matmuls in the VJP), and lets
XLA fuse neighbouring elementwise work — a gather-based implementation would run on
the VPU with strided HBM traffic instead. The matrices are built with numpy at
trace time (shapes are static under jit) and cached.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix, float32.

    align_corners=True:  src = o * (in-1)/(out-1)            (PyTorch convention)
    align_corners=False: src = max(0, (o+0.5) * in/out - 0.5) (half-pixel, clamped)
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    # PyTorch computes source coordinates in float32 (area_pixel_compute_scale /
    # _source_index use float accumulation); match that for bit-level parity.
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
    np.add.at(w, (np.arange(out_size), i0), 1.0 - frac)
    np.add.at(w, (np.arange(out_size), i1), frac)
    return w


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """Resize the two spatial axes of ``x`` to ``size`` with bilinear sampling.

    Accepts (H, W), (B, H, W) or (..., H, W, C) — any rank >= 2; the spatial axes
    are the last two for rank <= 3 and the (-3, -2) axes (NHWC) for rank >= 4.
    Interpolation happens in the input dtype's promotion with float32 weights.
    """
    out_h, out_w = int(size[0]), int(size[1])
    channel_last = x.ndim >= 4
    h_axis = x.ndim - 3 if channel_last else x.ndim - 2
    w_axis = h_axis + 1
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    if (in_h, in_w) == (out_h, out_w):
        return x

    dtype = x.dtype
    compute = x.astype(jnp.float32) if dtype != jnp.float32 else x
    # precision='highest' keeps the MXU in full-fp32 mode (3-pass bf16): resize
    # weights feed metric-parity-critical paths, so bf16 rounding is not ok here.
    if in_h != out_h:
        wh = jnp.asarray(_interp_matrix(in_h, out_h, align_corners))
        compute = jnp.tensordot(wh, compute, axes=((1,), (h_axis,)), precision="highest")
        compute = jnp.moveaxis(compute, 0, h_axis)
    if in_w != out_w:
        ww = jnp.asarray(_interp_matrix(in_w, out_w, align_corners))
        compute = jnp.tensordot(ww, compute, axes=((1,), (w_axis,)), precision="highest")
        compute = jnp.moveaxis(compute, 0, w_axis)
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
