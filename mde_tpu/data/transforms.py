"""Batched on-device preprocessing pipelines (jit-compiled).

Three pipelines, mirroring the reference's transform choices:

- ``preprocess_eval``    = Resize + ToTensor + ImageNet Normalize
                           (src/main.py:585-589 test_transform) and the
                           align-corners depth target resize (src/main.py:37-48).
- ``preprocess_train``   = the default train path: Resize + ColorJitter(.2,.2,.2,.1)
                           + ToTensor + Normalize (src/main.py:578-583).
- ``preprocess_pairaug`` = the PairAug path (src/main.py:469-527): joint geometric
                           warp of RGB+depth (resized-crop / hflip / rotation
                           composed into ONE affine), then RGB-only photometric
                           jitter, gaussian noise and blur, then Normalize.

All functions take whole uint8 batches and a PRNG key and are safe to call inside
a jitted, sharded train step — this is the "fused on-device image pipeline" that
replaces the reference's per-sample host worker transforms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import image as I
from ..ops.resize import resize_bilinear


def _resize_rgb(rgb: jnp.ndarray, input_size) -> jnp.ndarray:
    # torchvision Resize on PIL uses (antialiased) bilinear; for the dataset's
    # mild upscale 426x560 -> 448x576 this equals plain half-pixel bilinear.
    return resize_bilinear(rgb, tuple(input_size), align_corners=False)


def _resize_depth(depth: jnp.ndarray, input_size) -> jnp.ndarray:
    # The reference target_transform resizes depth with align_corners=True
    # (src/main.py:37-48).
    return resize_bilinear(depth, tuple(input_size), align_corners=True)


@functools.partial(jax.jit, static_argnames=("input_size", "has_depth"))
def preprocess_eval(rgb_u8, depth=None, input_size=(448, 576), has_depth=True):
    rgb = I.normalize_imagenet(_resize_rgb(I.to_float(rgb_u8), input_size))
    if has_depth and depth is not None:
        return rgb, _resize_depth(depth, input_size)
    return rgb


@functools.partial(jax.jit, static_argnames=("input_size",))
def preprocess_train(key, rgb_u8, depth, input_size=(448, 576)):
    rgb = _resize_rgb(I.to_float(rgb_u8), input_size)
    rgb = I.color_jitter(key, rgb, 0.2, 0.2, 0.2, 0.1)
    rgb = I.normalize_imagenet(rgb)
    return rgb, _resize_depth(depth, input_size)


@functools.partial(jax.jit, static_argnames=("input_size",))
def preprocess_pairaug(key, rgb_u8, depth, input_size=(448, 576)):
    h, w = input_size
    rgb = _resize_rgb(I.to_float(rgb_u8), input_size)
    depth = _resize_depth(depth, input_size)
    b = rgb.shape[0]

    k_geo, k_jit, k_gate, k_noise, k_blur = jax.random.split(key, 5)
    theta = I.pair_geometric_affine(k_geo, b, h, w)
    pair = jnp.concatenate([rgb, depth[..., None]], axis=-1)
    pair = I.affine_sample(pair, theta)
    rgb, depth = pair[..., :3], pair[..., 3]

    jittered = I.color_jitter(k_jit, rgb, 0.4, 0.4, 0.4, 0.15)
    gate = jax.random.bernoulli(k_gate, 0.8, (b,)).astype(rgb.dtype)
    rgb = rgb + (jittered - rgb) * gate[:, None, None, None]
    rgb = I.random_gaussian_noise(k_noise, rgb, std=0.005, p=0.25)
    rgb = I.random_gaussian_blur(k_blur, rgb, kernel_size=3, sigma=(0.1, 2.0), p=0.2)
    rgb = I.normalize_imagenet(rgb)
    return rgb, depth


def make_train_pipeline(augmentation: bool, input_size):
    """Returns fn(key, rgb_u8, depth) -> (rgb, depth) per the config switch
    (src/main.py:575-583: PairAug if config.augmentation else default)."""
    size = tuple(int(s) for s in input_size)
    if augmentation:
        return functools.partial(preprocess_pairaug, input_size=size)
    return functools.partial(preprocess_train, input_size=size)
