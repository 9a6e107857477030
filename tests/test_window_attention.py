"""Windowed cross-attention: checked against a naive per-window reference."""

import numpy as np

import jax.numpy as jnp

from mde_tpu.ops import windowed_cross_attention


def naive_window_attention(q, k, v, num_heads, ws):
    """Literal per-rectangular-window softmax attention in numpy."""
    b, h, w, c = q.shape
    hd = c // num_heads
    out = np.zeros_like(v)
    for hs in range(0, h, ws):
        for wss in range(0, w, ws):
            he, we = min(hs + ws, h), min(wss + ws, w)
            qw = q[:, hs:he, wss:we].reshape(b, -1, num_heads, hd)
            kw = k[:, hs:he, wss:we].reshape(b, -1, num_heads, hd)
            vw = v[:, hs:he, wss:we].reshape(b, -1, num_heads, hd)
            logits = np.einsum("bqhd,bkhd->bhqk", qw, kw) * hd**-0.5
            logits -= logits.max(-1, keepdims=True)
            attn = np.exp(logits)
            attn /= attn.sum(-1, keepdims=True)
            ow = np.einsum("bhqk,bkhd->bqhd", attn, vw).reshape(
                b, he - hs, we - wss, c
            )
            out[:, hs:he, wss:we] = ow
    return out


def test_matches_naive_aligned(rng):
    b, h, w, c, heads, ws = 2, 32, 32, 16, 4, 16
    q, k, v = (rng.standard_normal((b, h, w, c)).astype(np.float32) for _ in range(3))
    got = np.asarray(windowed_cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, ws))
    want = naive_window_attention(q, k, v, heads, ws)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_naive_ragged(rng):
    # The flagship shape: 56x72 grid, window 16 -> ragged 8-high / 8-wide remainders.
    b, h, w, c, heads, ws = 1, 56, 72, 32, 8, 16
    q, k, v = (rng.standard_normal((b, h, w, c)).astype(np.float32) for _ in range(3))
    got = np.asarray(windowed_cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, ws))
    want = naive_window_attention(q, k, v, heads, ws)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_locality(rng):
    # Perturbing a pixel in one window must not change any other window's output.
    b, h, w, c, heads, ws = 1, 32, 32, 8, 2, 16
    q, k, v = (rng.standard_normal((b, h, w, c)).astype(np.float32) for _ in range(3))
    base = np.asarray(windowed_cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, ws))
    k2 = k.copy()
    k2[:, 0, 0] += 10.0  # inside window (0, 0)
    pert = np.asarray(windowed_cross_attention(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v), heads, ws))
    # other windows identical
    np.testing.assert_allclose(pert[:, 16:, :], base[:, 16:, :], atol=1e-6)
    np.testing.assert_allclose(pert[:, :16, 16:], base[:, :16, 16:], atol=1e-6)
    # attended window changed
    assert np.abs(pert[:, :16, :16] - base[:, :16, :16]).max() > 1e-3
