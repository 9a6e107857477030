"""Windowed cross-attention over a 2D feature grid.

The reference computes its windowed cross attention with a Python double loop over
16x16 windows, slicing flattened token ranges per window
(src/network/midas_semantics.py:85-112). That loop is both the worst hot spot for a
compiler (20 sequential tiny matmuls per call) and subtly broken: the flat slice
``h_start*W + w_start : h_end*W + w_end`` spans *strips* of the token sequence, not
rectangles, so neighbouring "windows" overlap and overwrite each other. We do not
replicate the defect (SURVEY.md §7.5); we implement what the module intends —
non-overlapping rectangular windows with ragged edges — as a single batched
attention over all windows at once:

  pad the grid to window multiples -> reshape to (B, num_windows, T, C) ->
  one batched QK^T softmax V with padded keys masked -> unpad.

Every matmul is large and batched (MXU-friendly), the softmax is computed in
float32, and there is no data-dependent control flow, so the whole thing compiles
to a handful of fused XLA ops. A Pallas flash-style kernel with the same signature
can be slotted in for the fused-softmax variant; at T<=256 tokens per window XLA's
fusion is already near the HBM roofline for these shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _window_partition(x: jnp.ndarray, ws: int) -> tuple[jnp.ndarray, int, int]:
    """(B, Hp, Wp, C) -> (B, nWin, ws*ws, C); Hp/Wp must be multiples of ws."""
    b, hp, wp, c = x.shape
    nh, nw = hp // ws, wp // ws
    x = x.reshape(b, nh, ws, nw, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, ws, ws, C)
    return x.reshape(b, nh * nw, ws * ws, c), nh, nw


def _window_unpartition(x: jnp.ndarray, ws: int, nh: int, nw: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    x = x.reshape(b, nh, nw, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, nh * ws, nw * ws, c)


def _window_key_validity(h: int, w: int, hp: int, wp: int, ws: int) -> np.ndarray:
    """(N_windows, T) validity of each window slot — trace-time constant."""
    valid = np.zeros((hp, wp), dtype=np.float32)
    valid[:h, :w] = 1.0
    nh, nw = hp // ws, wp // ws
    vw = valid.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3)
    return vw.reshape(nh * nw, ws * ws)


def windowed_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    window_size: int = 16,
    backend: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention within aligned windows of a 2D grid.

    Args:
      q, k, v: (B, H, W, C) projected token grids (C = num_heads * head_dim).
        Queries attend only to keys/values inside their own window.
      num_heads: attention head count.
      window_size: spatial window edge; grids are zero-padded up to a multiple and
        the padded keys are masked out of the softmax (ragged final windows keep
        exact semantics, e.g. the 56x72 grid -> 8-wide remainder windows).
      backend: "xla" (batched einsum; default) or "pallas" (fused VMEM-resident
        softmax kernel, ops/pallas_kernels.py::window_attention_fused). Both use
        the identical per-window key-validity mask.

    Returns: (B, H, W, C) attended values, dtype of ``v``.
    """
    b, h, w, c = q.shape
    head_dim = c // num_heads
    ws = window_size
    hp = -(-h // ws) * ws
    wp = -(-w // ws) * ws
    pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))

    qw, nh, nw = _window_partition(qp, ws)  # (B, N, T, C)
    kw, _, _ = _window_partition(kp, ws)
    vw, _, _ = _window_partition(vp, ws)
    n, t = qw.shape[1], qw.shape[2]
    key_valid = _window_key_validity(h, w, hp, wp, ws)  # (N, T)

    if backend == "pallas":
        from .pallas_kernels import window_attention_fused

        out = window_attention_fused(qw, kw, vw, num_heads, key_valid)
        out = out.astype(v.dtype)
        out = _window_unpartition(out, ws, nh, nw)
        return out[:, :h, :w, :]

    def split(x):
        return x.reshape(b, n, t, num_heads, head_dim)

    qh, kh, vh = split(qw), split(kw), split(vw)
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bnqhd,bnkhd->bnhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale

    # Mask keys that came from padding (grid positions >= (h, w)).
    key_mask = jnp.asarray(key_valid)[None, :, None, None, :] > 0  # (1, N, 1, 1, T)
    logits = jnp.where(key_mask, logits, jnp.finfo(jnp.float32).min)

    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bnhqk,bnkhd->bnqhd", attn.astype(vh.dtype), vh, preferred_element_type=jnp.float32
    )
    out = out.reshape(b, n, t, c).astype(v.dtype)
    out = _window_unpartition(out, ws, nh, nw)
    return out[:, :h, :w, :]
