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
float32, and there is no data-dependent control flow. Two backends share the
identical per-window validity mask: the XLA batched einsum, and a Pallas
fused-softmax kernel (ops/pallas_kernels.py::window_attention_fused) whose
logits/probabilities live entirely in VMEM. On TPU the Pallas kernel is the
default — measured 1.31x faster at the flagship 56x72/ws16 bf16 shape
(benchmarks/ab_lowerings.py, same-process A/B) — with a custom VJP that
recomputes through the XLA math for the backward.
"""

from __future__ import annotations

import functools

import jax
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


def _xla_window_attention(qw, kw, vw, num_heads: int, key_valid) -> jnp.ndarray:
    """Batched einsum attention over partitioned windows: (B, N, T, C) -> same."""
    b, n, t, c = qw.shape
    head_dim = c // num_heads

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
    return out.reshape(b, n, t, c).astype(vw.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_window_attention(qw, kw, vw, num_heads: int, key_valid):
    """Pallas fused-softmax forward (logits never touch HBM); analytic backward
    via the XLA einsum math with logits recomputed — the standard flash-style
    trade of one extra QK^T for not saving the (B, N, H, T, T) probability
    tensor. A/B at the flagship 56x72/ws16 bf16 shape: Pallas fwd 1.97 ms vs
    XLA 2.58 ms (benchmarks/ab_lowerings.py, same process)."""
    from .pallas_kernels import window_attention_fused

    return window_attention_fused(qw, kw, vw, num_heads, key_valid)


def _pallas_wa_fwd(qw, kw, vw, num_heads, key_valid):
    out = _pallas_window_attention(qw, kw, vw, num_heads, key_valid)
    return out, (qw, kw, vw, key_valid)


def _pallas_wa_bwd(num_heads, res, g):
    qw, kw, vw, key_valid = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_window_attention(q, k, v, num_heads, key_valid),
        qw, kw, vw,
    )
    dq, dk, dv = vjp(g.astype(vw.dtype))
    return dq, dk, dv, jnp.zeros_like(key_valid)


_pallas_window_attention.defvjp(_pallas_wa_fwd, _pallas_wa_bwd)


def windowed_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    window_size: int = 16,
    backend: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention within aligned windows of a 2D grid.

    Args:
      q, k, v: (B, H, W, C) projected token grids (C = num_heads * head_dim).
        Queries attend only to keys/values inside their own window.
      num_heads: attention head count.
      window_size: spatial window edge; grids are zero-padded up to a multiple and
        the padded keys are masked out of the softmax (ragged final windows keep
        exact semantics, e.g. the 56x72 grid -> 8-wide remainder windows).
      backend: "auto" (pallas on TPU — measured faster at the flagship shape —
        XLA elsewhere), "xla" (batched einsum), or "pallas" (fused VMEM-resident
        softmax kernel, ops/pallas_kernels.py::window_attention_fused; custom
        VJP with XLA-math backward). Both use the identical per-window
        key-validity mask, so results match to fp rounding.

        Under multi-device execution with a registered training mesh
        (parallel.mesh.set_active_mesh — create_train_state does this), the
        chosen impl runs per-shard via shard_map over the 'data' axis, so the
        Pallas kernel stays live on multi-chip meshes (batch-local windows,
        zero collectives). Multi-device without a registered mesh keeps the
        GSPMD-safe XLA einsum for "auto".

    Returns: (B, H, W, C) attended values, dtype of ``v``.
    """
    _, h, w, _ = q.shape
    ws = window_size
    hp = -(-h // ws) * ws
    wp = -(-w // ws) * ws
    pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))

    qw, nh, nw = _window_partition(qp, ws)  # (B, N, T, C)
    kw, _, _ = _window_partition(kp, ws)
    vw, _, _ = _window_partition(vp, ws)
    key_valid = _window_key_validity(h, w, hp, wp, ws)  # (N, T)

    if backend == "auto":
        # Lowering-time platform dispatch, NOT jax.default_backend(): a trace
        # can be lowered for a device that isn't the default backend (e.g. a
        # CPU-placed jit in a process whose first platform is the TPU), and the
        # Pallas kernel only runs on TPU.
        def impl(qw, kw, vw, mask):
            return jax.lax.platform_dependent(
                tpu=lambda: _pallas_window_attention(
                    qw, kw, vw, num_heads, mask
                ).astype(vw.dtype),
                default=lambda: _xla_window_attention(qw, kw, vw, num_heads, mask),
            )
    elif backend == "pallas":
        def impl(qw, kw, vw, mask):
            return _pallas_window_attention(qw, kw, vw, num_heads, mask).astype(vw.dtype)
    else:
        def impl(qw, kw, vw, mask):
            return _xla_window_attention(qw, kw, vw, num_heads, mask)

    mask = jnp.asarray(key_valid)
    mesh = _shardable_mesh()
    if mesh is not None:
        # Multi-device: the Pallas custom call has no GSPMD partitioning rule,
        # so run the chosen impl per-shard via shard_map over the registered
        # training mesh. Windows are batch-local — the batch dim shards over
        # 'data' with ZERO collectives (keys/mask replicated per shard); any
        # 'model' axis stays replicated, matching what GSPMD would do for the
        # einsum path. A batch that doesn't divide the 'data' axis falls back
        # to replicated specs (correct, just not parallel — remainder batches).
        from jax.sharding import PartitionSpec as P

        bspec = (
            P("data", None, None, None)
            if qw.shape[0] % mesh.shape["data"] == 0
            else P(None, None, None, None)
        )
        out = jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(bspec, bspec, bspec, P(None, None)),
            out_specs=bspec,
            # custom_vjp + platform_dependent inside: skip varying-manual-axes
            # checking; the per-shard math is self-contained (no collectives).
            check_vma=False,
        )(qw, kw, vw, mask)
    elif backend == "auto" and jax.device_count() > 1:
        # No registered mesh to shard_map over: keep the GSPMD-safe XLA einsum
        # (a bare Pallas custom call would force replication or fail to lower).
        out = _xla_window_attention(qw, kw, vw, num_heads, mask)
    else:
        out = impl(qw, kw, vw, mask)
    out = _window_unpartition(out, ws, nh, nw)
    return out[:, :h, :w, :]


def _shardable_mesh():
    """The registered training mesh, when sharding is actually in play.

    Requires a 'data' axis: the shard_map above shards the batch over it. A
    registered mesh with other axis names (set_active_mesh accepts any Mesh)
    falls back to the GSPMD-safe paths instead of a trace-time KeyError."""
    if jax.device_count() <= 1:
        return None
    from ..parallel.mesh import get_active_mesh

    mesh = get_active_mesh()
    if mesh is not None and "data" not in mesh.axis_names:
        return None
    return mesh
