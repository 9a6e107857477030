"""Depth losses as pure JAX functions.

Formula-parity notes cite the reference implementation they match:

- ``scale_invariant_loss``       reference src/util.py:129-156
- ``silog_loss``                 reference src/util.py:90-127
- ``gradient_loss``              reference src/util.py:24-44
- ``edge_aware_loss``            reference src/util.py:46-88
- ``per_pixel_scale_invariant_loss``  reference src/util.py:159-181
- ``combined_loss``              reference src/main.py:51-89

Canonical shapes are TPU-native channel-less depth maps ``(B, H, W)`` and NHWC RGB
``(B, H, W, 3)``; the reference uses NCHW ``(B, 1, H, W)``. All reductions are
single-pass jnp expressions that XLA fuses into the backward graph; everything is
differentiable and jit/vmap/shard_map-safe (no boolean indexing — masked means use
where+sum, which is the functional equivalent of the reference's ``pred[mask]``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _flatten_per_sample(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def scale_invariant_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    epsilon: float = 1e-6,
    sqroot: bool = False,
) -> jnp.ndarray:
    """Per-sample scale-invariant log MSE, batch-averaged.

    d = log(pred+eps) - log(target+eps); loss_b = mean(d^2) - mean(d)^2, optionally
    sqrt per sample ("Match the scale-invariant loss definition in Kaggle"),
    then mean over the batch. Matches src/util.py:129-156 exactly, including using
    a plain (unmasked) mean over every pixel.
    """
    pred = _flatten_per_sample(pred)
    target = _flatten_per_sample(target)
    diff = jnp.log(pred + epsilon) - jnp.log(target + epsilon)
    n = float(diff.shape[1])  # float: n^2 overflows int32 at 448x576 pixels
    term1 = jnp.sum(diff * diff, axis=1) / n
    term2 = jnp.square(jnp.sum(diff, axis=1)) / (n * n)
    loss = term1 - term2
    if sqroot:
        loss = jnp.sqrt(loss)
    return jnp.mean(loss)


def silog_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    variance_focus: float = 0.85,
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Masked SiLog loss with a *global* (whole-batch) masked mean.

    The reference flattens ``pred[mask]`` across the entire batch before reducing
    (src/util.py:107-127), so the mean is over all valid pixels of all samples
    jointly — not per-sample. Replicated here with where-masked sums.
    """
    if mask is None:
        mask = target > 0
    mask = mask.astype(pred.dtype)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    log_diff = (jnp.log(pred + epsilon) - jnp.log(target + epsilon)) * mask
    mean_sq = jnp.sum(log_diff * log_diff) / count
    mean = jnp.sum(log_diff) / count
    return mean_sq - variance_focus * mean * mean


def gradient_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 difference of absolute spatial gradients (src/util.py:24-44).

    Operates on (B, H, W); x-gradient along W, y-gradient along H. Each directional
    loss is a mean over its own (smaller) gradient tensor, then summed.
    """
    pred_dx = jnp.abs(pred[:, :, :-1] - pred[:, :, 1:])
    pred_dy = jnp.abs(pred[:, :-1, :] - pred[:, 1:, :])
    target_dx = jnp.abs(target[:, :, :-1] - target[:, :, 1:])
    target_dy = jnp.abs(target[:, :-1, :] - target[:, 1:, :])
    dx_loss = jnp.mean(jnp.abs(pred_dx - target_dx))
    dy_loss = jnp.mean(jnp.abs(pred_dy - target_dy))
    return dx_loss + dy_loss


def edge_aware_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    rgb: jnp.ndarray,
    beta: float = 0.5,
) -> jnp.ndarray:
    """RGB-gradient-weighted depth-gradient L1 (src/util.py:46-88).

    ``rgb`` is NHWC (B, H, W, 3); pred/target are (B, H, W). The RGB gradient
    magnitude is min-max normalized over the *whole batch tensor* (a global min/max,
    as in the reference), then used to weight zero-padded depth-gradient L1 diffs.
    The result is already scaled by ``beta`` (callers pass the config alpha here —
    src/main.py:79 passes edge_loss_alpha as beta).
    """
    rgb_dx = jnp.abs(rgb[:, :, :-1, :] - rgb[:, :, 1:, :])  # (B, H, W-1, 3)
    rgb_dy = jnp.abs(rgb[:, :-1, :, :] - rgb[:, 1:, :, :])  # (B, H-1, W, 3)
    rgb_dx = jnp.pad(rgb_dx, ((0, 0), (0, 0), (0, 1), (0, 0)))
    rgb_dy = jnp.pad(rgb_dy, ((0, 0), (0, 1), (0, 0), (0, 0)))
    grad_mag = jnp.sqrt(
        jnp.mean(jnp.square(rgb_dx), axis=-1) + jnp.mean(jnp.square(rgb_dy), axis=-1)
    )  # (B, H, W)
    lo, hi = jnp.min(grad_mag), jnp.max(grad_mag)
    grad_mag = (grad_mag - lo) / (hi - lo + 1e-6)

    def padded_grads(x):
        dx = jnp.abs(x[:, :, :-1] - x[:, :, 1:])
        dy = jnp.abs(x[:, :-1, :] - x[:, 1:, :])
        dx = jnp.pad(dx, ((0, 0), (0, 0), (0, 1)))
        dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0)))
        return dx, dy

    pred_dx, pred_dy = padded_grads(pred)
    target_dx, target_dy = padded_grads(target)
    dx_loss = jnp.mean(grad_mag * jnp.abs(pred_dx - target_dx))
    dy_loss = jnp.mean(grad_mag * jnp.abs(pred_dy - target_dy))
    return beta * (dx_loss + dy_loss)


def per_pixel_scale_invariant_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Single-sample per-pixel SI loss map for visualization (src/util.py:159-181).

    pred/target are (H, W) and must be positive (the reference asserts this and
    takes logs without epsilon).
    """
    log_diff = jnp.log(pred) - jnp.log(target)
    alpha = -jnp.mean(log_diff)
    return jnp.square(log_diff + alpha)


def combined_loss(pred, target, config, rgb=None):
    """Config-weighted loss mix (src/main.py:51-89).

    Returns ``(total, components)`` where components are already alpha-scaled
    scalars (as 0-d jnp arrays; callers outside jit may float() them), mirroring
    the reference's wandb-logged dict keys: si_loss / silog_loss / grad_loss /
    edge_loss.
    """
    lf = config.model.loss_function
    si = scale_invariant_loss(pred, target) * lf.si_loss_alpha
    slog = (
        silog_loss(pred, target, mask=target > 0, variance_focus=lf.silog_loss.variance_focus)
        * lf.silog_loss.alpha
    )
    grad = gradient_loss(pred, target) * lf.grad_loss_alpha
    if rgb is not None:
        edge = edge_aware_loss(pred, target, rgb, beta=lf.edge_loss_alpha)
    else:
        edge = jnp.asarray(0.0, dtype=pred.dtype)
    total = si + slog + grad + edge
    return total, {"si_loss": si, "silog_loss": slog, "grad_loss": grad, "edge_loss": edge}
