"""Pallas kernels (interpret mode on CPU) vs their jnp reference math."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mde_tpu import losses
from mde_tpu.ops.pallas_kernels import (
    normalize_u8_fused,
    scale_invariant_loss_fused,
    si_loss_sums,
    window_attention_fused,
)


def test_si_sums_match(rng):
    pred = rng.uniform(0.05, 9.0, (3, 17, 23)).astype(np.float32)
    target = rng.uniform(0.05, 9.0, (3, 17, 23)).astype(np.float32)
    s1, s2 = si_loss_sums(jnp.asarray(pred), jnp.asarray(target))
    d = np.log(pred.reshape(3, -1) + 1e-6) - np.log(target.reshape(3, -1) + 1e-6)
    np.testing.assert_allclose(np.asarray(s1), d.sum(1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (d * d).sum(1), rtol=1e-4)


def test_fused_si_loss_matches_reference_impl(rng):
    pred = rng.uniform(0.05, 9.0, (4, 33, 41)).astype(np.float32)
    target = rng.uniform(0.05, 9.0, (4, 33, 41)).astype(np.float32)
    for sqroot in (False, True):
        got = float(
            scale_invariant_loss_fused(jnp.asarray(pred), jnp.asarray(target), sqroot=sqroot)
        )
        want = float(
            losses.scale_invariant_loss(jnp.asarray(pred), jnp.asarray(target), sqroot=sqroot)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_si_sums_custom_vjp_matches_autodiff(rng):
    pred = rng.uniform(0.1, 5.0, (2, 9, 11)).astype(np.float32)
    target = rng.uniform(0.1, 5.0, (2, 9, 11)).astype(np.float32)

    def fused(p):
        return scale_invariant_loss_fused(p, jnp.asarray(target))

    def ref(p):
        return losses.scale_invariant_loss(p, jnp.asarray(target))

    g_fused = jax.grad(fused)(jnp.asarray(pred))
    g_ref = jax.grad(ref)(jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-7)


def test_window_attention_fused_matches_xla_aligned(rng):
    from mde_tpu.ops import windowed_cross_attention

    b, h, w, c, heads, ws = 1, 32, 32, 16, 4, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        for _ in range(3)
    )
    got = np.asarray(windowed_cross_attention(q, k, v, heads, ws, backend="pallas"))
    want = np.asarray(windowed_cross_attention(q, k, v, heads, ws, backend="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_window_attention_fused_matches_xla_ragged_flagship(rng):
    """The flagship CrossAttention shape: 56x72 grid, ws=16 -> 2D-ragged edge
    windows whose invalid key slots are interleaved in flattened token order
    (8-wide right-edge remainder). A scalar n_valid cannot express this."""
    from mde_tpu.ops import windowed_cross_attention

    b, h, w, c, heads, ws = 2, 56, 72, 32, 8, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        for _ in range(3)
    )
    got = np.asarray(windowed_cross_attention(q, k, v, heads, ws, backend="pallas"))
    want = np.asarray(windowed_cross_attention(q, k, v, heads, ws, backend="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_attention_pallas_grad_matches_xla(rng):
    """backend='pallas' is the live TPU path inside the jitted train step; its
    custom VJP (XLA-math backward with recomputed logits) must match the plain
    XLA autodiff gradients on a ragged grid."""
    from mde_tpu.ops import windowed_cross_attention

    b, h, w, c, heads, ws = 1, 24, 40, 16, 4, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
        for _ in range(3)
    )

    def loss(backend):
        def f(q, k, v):
            out = windowed_cross_attention(q, k, v, heads, ws, backend=backend)
            return jnp.sum(out**2)

        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_window_attention_xla_ragged_vs_dense_reference(rng):
    """XLA windowed path vs a literal per-window numpy attention on a ragged
    grid — validates the mask itself, not just pallas==xla."""
    b, h, w, c, heads, ws = 1, 20, 28, 8, 2, 16
    hd = c // heads
    q, k, v = (rng.standard_normal((b, h, w, c)).astype(np.float32) for _ in range(3))

    want = np.zeros_like(q)
    for wi in range(0, h, ws):
        for wj in range(0, w, ws):
            qs = q[:, wi : wi + ws, wj : wj + ws, :]
            ks = k[:, wi : wi + ws, wj : wj + ws, :]
            vs = v[:, wi : wi + ws, wj : wj + ws, :]
            bh, hh, wwd, _ = qs.shape
            qf = qs.reshape(bh, hh * wwd, heads, hd)
            kf = ks.reshape(bh, hh * wwd, heads, hd)
            vf = vs.reshape(bh, hh * wwd, heads, hd)
            logits = np.einsum("bqhd,bkhd->bhqk", qf, kf) / np.sqrt(hd)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            attn = e / e.sum(-1, keepdims=True)
            of = np.einsum("bhqk,bkhd->bqhd", attn, vf).reshape(bh, hh, wwd, c)
            want[:, wi : wi + ws, wj : wj + ws, :] = of

    from mde_tpu.ops import windowed_cross_attention

    got = np.asarray(
        windowed_cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, ws)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_normalize_u8_fused(rng):
    u8 = rng.integers(0, 255, (2, 16, 24, 3)).astype(np.uint8)
    got = np.asarray(normalize_u8_fused(jnp.asarray(u8)))
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    want = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_flash_attention_matches_reference(rng):
    from mde_tpu.ops.flash_attention import attention_reference, flash_attention

    b, n, h, d = 2, 321, 6, 64  # the DINOv2-S branch shape (320 patches + cls)
    q, k, v = (rng.standard_normal((b, n, h, d)).astype(np.float32) for _ in range(3))
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = np.asarray(
        attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_attention_block_aligned(rng):
    from mde_tpu.ops.flash_attention import attention_reference, flash_attention

    b, n, h, d = 1, 256, 4, 64
    q, k, v = (rng.standard_normal((b, n, h, d)).astype(np.float32) for _ in range(3))
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
