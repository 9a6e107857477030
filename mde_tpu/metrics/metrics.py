"""Depth evaluation metrics as single-pass on-device reductions.

Parity targets in the reference:

- ``delta_thres``              src/util.py:183-207 (log-scale aligned ratio accuracy)
- ``absolute_relative_error``  src/util.py:210-219
- ``masked_si_rmse``           the per-image numpy loop of src/main.py:298-323,
                               re-expressed as a fused masked batch reduction
- ``evaluation_metrics``       the evaluation.py protocol (SI-RMSE sqroot, AbsRel,
                               delta @ 1.05^j; src/evaluation.py:143-185)
- ``full_metric_suite``        the 7-metric in-train suite (src/main.py:254-392)

All metrics take (B, H, W) depth maps. Unlike the reference — which round-trips
every batch through ``.cpu().numpy()`` for the siRMSE loop — these run entirely
on-device and return scalars, so evaluation never leaves the accelerator.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..losses import scale_invariant_loss

EPSILON = 1e-6


def delta_thres(pred: jnp.ndarray, target: jnp.ndarray, thres: float) -> jnp.ndarray:
    """Fraction of pixels whose log-scale-aligned ratio is below ``thres``.

    Per sample: scale = exp(mean(log t - log p)) (with eps inside the logs),
    ratio = max(p*s/t, t/(p*s)) (no eps in the division, as in the reference),
    accuracy = mean(ratio < thres); then batch mean. src/util.py:183-207.
    """
    b = pred.shape[0]
    pred = pred.reshape(b, -1)
    target = target.reshape(b, -1)
    log_pred = jnp.log(pred + EPSILON)
    log_target = jnp.log(target + EPSILON)
    scale = jnp.exp(jnp.mean(log_target - log_pred, axis=1, keepdims=True))
    aligned = pred * scale
    ratio = jnp.maximum(aligned / target, target / aligned)
    acc = jnp.mean((ratio < thres).astype(jnp.float32), axis=1)
    return jnp.mean(acc)


def absolute_relative_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean(|target - pred| / (target + 1e-6)) over everything. src/util.py:210-219."""
    return jnp.mean(jnp.abs(target - pred) / (target + EPSILON))


def masked_si_rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image masked scale-invariant RMSE, summed over the batch.

    Replicates the numpy loop at src/main.py:298-323: valid = target > 1e-6,
    pred clamped to >= 1e-6, d = log p - log t over valid pixels,
    per-image sqrt(mean((d - mean d)^2)), accumulated (caller divides by N).
    Images with no valid pixels contribute 0 (the reference ``continue``s).
    """
    b = pred.shape[0]
    pred = pred.reshape(b, -1)
    target = target.reshape(b, -1)
    valid = (target > EPSILON).astype(pred.dtype)
    count = jnp.sum(valid, axis=1)
    safe_count = jnp.maximum(count, 1.0)
    log_t = jnp.log(jnp.where(valid > 0, target, 1.0))
    log_p = jnp.log(jnp.maximum(pred, EPSILON))
    diff = (log_p - log_t) * valid
    mean = jnp.sum(diff, axis=1) / safe_count
    var = jnp.sum(jnp.square(diff - mean[:, None]) * valid, axis=1) / safe_count
    per_image = jnp.sqrt(var)
    return jnp.sum(jnp.where(count > 0, per_image, 0.0))


def evaluation_metrics(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    base_thres: float = 1.05,
    n_delta: int = 3,
):
    """Batch metrics of the standalone eval protocol (src/evaluation.py:143-176).

    Returns a dict of batch-mean scalars: ``si_rmse`` (sqroot scale-invariant loss —
    THE Kaggle metric), ``abs_rel``, and ``delta_1..n`` at thresholds
    base_thres**j. Callers accumulate ``value * batch_size`` and divide by N, as the
    reference does.
    """
    out = {
        "si_rmse": scale_invariant_loss(pred, target, sqroot=True),
        "abs_rel": absolute_relative_error(pred, target),
    }
    for j in range(1, n_delta + 1):
        out[f"delta_{j}"] = delta_thres(pred, target, thres=base_thres**j)
    return out


def full_metric_suite(pred: jnp.ndarray, target: jnp.ndarray):
    """Batch *sums* for the 7-metric in-train suite (src/main.py:254-392).

    Returns raw accumulators so an epoch driver can sum over batches and apply the
    reference's final normalizations (divide by total_samples * pixels, sqrt for
    RMSE, divide siRMSE by total_samples):
      mae_sum, sq_sum, rel_sum, sirmse_sum, delta{1,2,3}_count, n_pixels.
    Delta here uses the unaligned ratio max(p/(t+eps), t/(p+eps)) < 1.25^k
    (src/main.py:326-329), unlike the aligned eval-protocol delta.
    """
    abs_diff = jnp.abs(pred - target)
    ratio = jnp.maximum(pred / (target + EPSILON), target / (pred + EPSILON))
    return {
        "mae_sum": jnp.sum(abs_diff),
        "sq_sum": jnp.sum(jnp.square(abs_diff)),
        "rel_sum": jnp.sum(abs_diff / (target + EPSILON)),
        "sirmse_sum": masked_si_rmse(pred, target),
        "delta1_count": jnp.sum(ratio < 1.25),
        "delta2_count": jnp.sum(ratio < 1.25**2),
        "delta3_count": jnp.sum(ratio < 1.25**3),
    }
