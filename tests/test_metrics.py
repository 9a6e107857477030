"""Golden-value metric tests vs torch/numpy implementations of the reference
equations (src/util.py:183-219, src/main.py:254-392, src/evaluation.py:143-176)."""

import numpy as np
import torch

import jax.numpy as jnp

from mde_tpu import metrics

B, H, W = 4, 13, 19


def _pair(rng):
    pred = rng.uniform(0.05, 9.0, size=(B, H, W)).astype(np.float32)
    target = rng.uniform(0.05, 9.0, size=(B, H, W)).astype(np.float32)
    return pred, target


def test_delta_thres(rng):
    pred, target = _pair(rng)
    p = torch.from_numpy(pred).view(B, -1)
    t = torch.from_numpy(target).view(B, -1)
    eps = 1e-6
    scale = torch.exp(torch.mean(torch.log(t + eps) - torch.log(p + eps), dim=1, keepdim=True))
    aligned = p * scale
    ratio = torch.max(aligned / t, t / aligned)
    want = torch.mean((ratio < 1.05).float(), dim=1).mean().item()
    got = float(metrics.delta_thres(jnp.asarray(pred), jnp.asarray(target), thres=1.05))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_abs_rel(rng):
    pred, target = _pair(rng)
    want = np.mean(np.abs(target - pred) / (target + 1e-6))
    got = float(metrics.absolute_relative_error(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_si_rmse_matches_numpy_loop(rng):
    pred, target = _pair(rng)
    target = target * (rng.uniform(size=target.shape) > 0.25)  # invalid holes
    EPS = 1e-6
    want = 0.0
    for i in range(B):
        t, p = target[i], pred[i]
        valid = t > EPS
        if not np.any(valid):
            continue
        tv, pv = t[valid], p[valid]
        pv = np.where(pv > EPS, pv, EPS)
        d = np.log(pv) - np.log(tv)
        want += np.sqrt(np.mean((d - d.mean()) ** 2))
    got = float(metrics.masked_si_rmse(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_full_suite_normalization(rng):
    pred, target = _pair(rng)
    suite = metrics.full_metric_suite(jnp.asarray(pred), jnp.asarray(target))
    pixels = H * W
    mae = float(suite["mae_sum"]) / (B * pixels)
    np.testing.assert_allclose(mae, np.mean(np.abs(pred - target)), rtol=1e-5)
    rmse = np.sqrt(float(suite["sq_sum"]) / (B * pixels))
    np.testing.assert_allclose(rmse, np.sqrt(np.mean((pred - target) ** 2)), rtol=1e-5)
    ratio = np.maximum(pred / (target + 1e-6), target / (pred + 1e-6))
    np.testing.assert_allclose(
        float(suite["delta1_count"]) / (B * pixels), np.mean(ratio < 1.25), rtol=1e-5
    )


def test_evaluation_metrics_keys(rng):
    pred, target = _pair(rng)
    out = metrics.evaluation_metrics(jnp.asarray(pred), jnp.asarray(target))
    assert set(out) == {"si_rmse", "abs_rel", "delta_1", "delta_2", "delta_3"}
    # delta thresholds are increasing => accuracies must be non-decreasing
    assert float(out["delta_1"]) <= float(out["delta_2"]) <= float(out["delta_3"])
