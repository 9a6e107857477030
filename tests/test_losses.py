"""Golden-value loss tests: every formula checked against an independent
PyTorch implementation of the reference equations (src/util.py:24-219,
src/main.py:51-89). Torch runs on CPU, float32, same inputs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu import losses

B, H, W = 3, 17, 23


@pytest.fixture
def depth_pair(rng):
    pred = rng.uniform(0.05, 9.0, size=(B, H, W)).astype(np.float32)
    target = rng.uniform(0.05, 9.0, size=(B, H, W)).astype(np.float32)
    return pred, target


@pytest.fixture
def rgb(rng):
    return rng.uniform(0.0, 1.0, size=(B, H, W, 3)).astype(np.float32)


def torch_scale_invariant(pred, target, eps=1e-6, sqroot=False):
    p = torch.from_numpy(pred).unsqueeze(1)
    t = torch.from_numpy(target).unsqueeze(1)
    d = torch.log(p + eps) - torch.log(t + eps)
    n = d.numel() / d.shape[0]
    term1 = torch.sum(d**2, dim=[1, 2, 3]) / n
    term2 = torch.sum(d, dim=[1, 2, 3]) ** 2 / n**2
    loss = term1 - term2
    if sqroot:
        loss = torch.sqrt(loss)
    return torch.mean(loss).item()


def test_scale_invariant(depth_pair):
    pred, target = depth_pair
    got = float(losses.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = torch_scale_invariant(pred, target)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scale_invariant_sqroot(depth_pair):
    pred, target = depth_pair
    got = float(
        losses.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target), sqroot=True)
    )
    want = torch_scale_invariant(pred, target, sqroot=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scale_invariant_zero_for_scaled_pred(depth_pair):
    # Scale invariance: pred = c * target gives (near-)zero loss.
    _, target = depth_pair
    got = float(
        losses.scale_invariant_loss(jnp.asarray(2.5 * target), jnp.asarray(target))
    )
    assert abs(got) < 1e-4


def test_silog(depth_pair, rng):
    pred, target = depth_pair
    # Punch holes in the target so the validity mask is nontrivial.
    target = target * (rng.uniform(size=target.shape) > 0.3)
    p = torch.from_numpy(pred)
    t = torch.from_numpy(target)
    mask = t > 0
    eps = 1e-6
    d = torch.log(p[mask] + eps) - torch.log(t[mask] + eps)
    want = (torch.mean(d**2) - 0.85 * torch.mean(d) ** 2).item()
    got = float(losses.silog_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradient_loss(depth_pair):
    pred, target = depth_pair
    p = torch.from_numpy(pred).unsqueeze(1)
    t = torch.from_numpy(target).unsqueeze(1)
    pdx = torch.abs(p[..., :-1] - p[..., 1:])
    pdy = torch.abs(p[..., :-1, :] - p[..., 1:, :])
    tdx = torch.abs(t[..., :-1] - t[..., 1:])
    tdy = torch.abs(t[..., :-1, :] - t[..., 1:, :])
    want = (torch.mean(torch.abs(pdx - tdx)) + torch.mean(torch.abs(pdy - tdy))).item()
    got = float(losses.gradient_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_edge_aware_loss(depth_pair, rgb):
    pred, target = depth_pair
    p = torch.from_numpy(pred).unsqueeze(1)
    t = torch.from_numpy(target).unsqueeze(1)
    r = torch.from_numpy(rgb).permute(0, 3, 1, 2)
    beta = 0.7
    rdx = TF.pad(torch.abs(r[..., :-1] - r[..., 1:]), (0, 1, 0, 0))
    rdy = TF.pad(torch.abs(r[..., :-1, :] - r[..., 1:, :]), (0, 0, 0, 1))
    mag = torch.sqrt(rdx.pow(2).mean(1, keepdim=True) + rdy.pow(2).mean(1, keepdim=True))
    mag = (mag - mag.min()) / (mag.max() - mag.min() + 1e-6)
    pdx = TF.pad(torch.abs(p[..., :-1] - p[..., 1:]), (0, 1, 0, 0))
    pdy = TF.pad(torch.abs(p[..., :-1, :] - p[..., 1:, :]), (0, 0, 0, 1))
    tdx = TF.pad(torch.abs(t[..., :-1] - t[..., 1:]), (0, 1, 0, 0))
    tdy = TF.pad(torch.abs(t[..., :-1, :] - t[..., 1:, :]), (0, 0, 0, 1))
    want = (
        beta
        * (
            torch.mean(mag * torch.abs(pdx - tdx))
            + torch.mean(mag * torch.abs(pdy - tdy))
        )
    ).item()
    got = float(
        losses.edge_aware_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(rgb), beta=beta
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_per_pixel_si(depth_pair):
    pred, target = depth_pair
    p = torch.from_numpy(pred[0])
    t = torch.from_numpy(target[0])
    d = torch.log(p) - torch.log(t)
    want = ((d - torch.mean(d)) ** 2).numpy()
    got = np.asarray(
        losses.per_pixel_scale_invariant_loss(jnp.asarray(pred[0]), jnp.asarray(target[0]))
    )
    # fp32 log differs in the last ulps between XLA and torch; the squared
    # residuals amplify that relatively, so compare with an absolute floor.
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-4)


def test_combined_loss_weights(depth_pair, rgb):
    pred, target = depth_pair
    cfg = config_lib.defaults()
    cfg.model.loss_function.si_loss_alpha = 0.5
    cfg.model.loss_function.silog_loss.alpha = 0.25
    cfg.model.loss_function.grad_loss_alpha = 0.2
    cfg.model.loss_function.edge_loss_alpha = 0.1
    total, parts = losses.combined_loss(
        jnp.asarray(pred), jnp.asarray(target), cfg, rgb=jnp.asarray(rgb)
    )
    np.testing.assert_allclose(
        float(total),
        sum(float(parts[k]) for k in ("si_loss", "silog_loss", "grad_loss", "edge_loss")),
        rtol=1e-6,
    )
    si_alone = float(
        losses.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target))
    )
    np.testing.assert_allclose(float(parts["si_loss"]), 0.5 * si_alone, rtol=1e-6)
    # Edge term uses the alpha *as* beta (src/main.py:79).
    edge_alone = float(
        losses.edge_aware_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(rgb), beta=0.1)
    )
    np.testing.assert_allclose(float(parts["edge_loss"]), edge_alone, rtol=1e-6)


def test_combined_loss_is_differentiable(depth_pair):
    import jax

    pred, target = depth_pair
    cfg = config_lib.defaults()

    def f(p):
        total, _ = losses.combined_loss(p, jnp.asarray(target), cfg)
        return total

    g = jax.grad(f)(jnp.asarray(pred))
    assert np.all(np.isfinite(np.asarray(g)))
