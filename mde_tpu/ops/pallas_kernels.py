"""Pallas TPU kernels for the hot fused ops (with XLA fallbacks off-TPU).

Three kernels cover the fusion opportunities SURVEY.md §2.7 assigns to the
rebuild:

- ``si_loss_sums``: single-pass per-sample Σd and Σd² of the log-difference
  (the core of every scale-invariant loss/metric: util.py:129-156,
  evaluation.py:157). One HBM read of pred+target, no intermediate d tensor;
  custom VJP so the backward pass is a cheap elementwise kernel-free expression.
- ``window_attention_kernel``: fused QK^T-softmax-V per 2D window (the
  replacement for the reference's Python window loop,
  midas_semantics.py:93-112) — softmax never materializes logits in HBM.
- ``normalize_u8_kernel``: fused uint8 -> float -> ImageNet-normalize (the
  elementwise tail of the on-device image pipeline).

All kernels run in interpret mode on CPU (used by tests); on TPU they compile
through Mosaic.

Measured on TPU v5e (bs8 x 448x576 f32): si fwd Pallas 19us vs XLA-fused jnp
20us; bwd Pallas-VJP 2.6ms vs XLA autodiff 1.7ms (XLA skips the unused target
cotangent). Conclusion per the kernel guide's own advice — XLA's fusion already
hits the HBM roofline for these reductions, so the default loss path stays jnp
and the si kernel is an exercised, tested alternate. ``window_attention_fused``
IS the live TPU path for the flagship CrossAttention (via
ops/window_attention.py backend="auto"): the fused softmax keeps logits out of
HBM and measures 1.31x faster than the XLA einsum at the flagship 56x72/ws16
bf16 shape (benchmarks/ab_lowerings.py). ``normalize_u8_fused`` is
interpret-only: Mosaic rejects the 3-lane NHWC layout (XLA fuses the same math
into the consumer for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import IMAGENET_MEAN, IMAGENET_STD


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused per-sample SI-loss reduction
# ---------------------------------------------------------------------------

_SUB, _LANE = 8, 256  # (sublane, lane) f32 tile per grid step
_CHUNK = _SUB * _LANE


def _si_sums_kernel(pred_ref, target_ref, s1_ref, s2_ref, *, eps: float, n_valid: int):
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        s1_ref[b, 0] = 0.0
        s2_ref[b, 0] = 0.0

    # Mask the zero-padded tail of the last chunk (flat pixel index).
    row = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    idx = c * _CHUNK + row * _LANE + col
    mask = (idx < n_valid).astype(jnp.float32)
    d = jnp.log(pred_ref[0, 0] + eps) - jnp.log(target_ref[0, 0] + eps)
    d = d * mask
    s1_ref[b, 0] += jnp.sum(d)
    s2_ref[b, 0] += jnp.sum(d * d)


def _si_sums_pallas(pred2d, target2d, eps):
    b, n = pred2d.shape
    n_pad = pl.cdiv(n, _CHUNK) * _CHUNK
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        # Pad with 1.0 so log() stays finite; masked out in-kernel anyway.
        pred2d = jnp.pad(pred2d, pad, constant_values=1.0)
        target2d = jnp.pad(target2d, pad, constant_values=1.0)
    chunks = n_pad // _CHUNK
    pred4 = pred2d.reshape(b, chunks, _SUB, _LANE)
    target4 = target2d.reshape(b, chunks, _SUB, _LANE)
    kernel = functools.partial(_si_sums_kernel, eps=eps, n_valid=n)
    in_spec = pl.BlockSpec(
        (1, 1, _SUB, _LANE), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    s1, s2 = pl.pallas_call(
        kernel,
        grid=(b, chunks),
        in_specs=[in_spec, in_spec],
        out_specs=[
            # Whole-array SMEM accumulators (tiling rejects (1,1) sub-blocks);
            # rows are indexed by program_id(0) inside the kernel.
            pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(pred4, target4)
    return s1[:, 0], s2[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def si_loss_sums(pred, target, eps: float = 1e-6):
    """Per-sample (Σd, Σd²) with d = log(pred+eps) - log(target+eps).

    pred/target: (B, ...) -> returns two (B,) vectors. Differentiable w.r.t.
    both inputs via an analytic custom VJP (no d tensor saved — recomputed in
    the backward, trading one cheap elementwise pass for HBM residency).
    """
    b = pred.shape[0]
    return _si_sums_pallas(
        pred.reshape(b, -1).astype(jnp.float32),
        target.reshape(b, -1).astype(jnp.float32),
        eps,
    )


def _si_sums_fwd(pred, target, eps):
    return si_loss_sums(pred, target, eps), (pred, target)


def _si_sums_bwd(eps, res, cotangents):
    pred, target = res
    g1, g2 = cotangents  # (B,), (B,)
    b = pred.shape[0]
    shape = (b,) + (1,) * (pred.ndim - 1)
    g1 = g1.reshape(shape)
    g2 = g2.reshape(shape)
    d = jnp.log(pred + eps) - jnp.log(target + eps)
    common = g1 + 2.0 * d * g2
    dpred = common / (pred + eps)
    dtarget = -common / (target + eps)
    return dpred.astype(pred.dtype), dtarget.astype(target.dtype)


si_loss_sums.defvjp(_si_sums_fwd, _si_sums_bwd)


def scale_invariant_loss_fused(pred, target, epsilon: float = 1e-6, sqroot: bool = False):
    """Drop-in fused version of losses.scale_invariant_loss."""
    b = pred.shape[0]
    n = float(pred.size // b)  # float: n^2 overflows int32 at 448x576 pixels
    s1, s2 = si_loss_sums(pred, target, epsilon)
    loss = s2 / n - jnp.square(s1) / (n * n)
    if sqroot:
        loss = jnp.sqrt(loss)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Fused windowed attention (single window per grid step)
# ---------------------------------------------------------------------------


def _window_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int):
    t, c = q_ref.shape[-2:]
    hd = c // num_heads
    q = q_ref[0, 0]  # (T, C)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    # Per-window key validity row -> broadcast over query rows. A scalar count
    # cannot express 2D-ragged windows (right-edge windows have invalid columns
    # *interleaved* in flattened token order), hence the explicit mask. The
    # whole (N, T) mask is resident (tiny); select this window's row by
    # program id (a (1, T) block would violate Mosaic's (8, 128) tiling rule).
    j = pl.program_id(1)
    key_mask = jnp.broadcast_to(mask_ref[j, :][None, :] > 0, (t, t))
    scale = hd**-0.5
    # Static per-head loop with lane slicing — Mosaic supports neither splitting
    # the lane dim via reshape nor non-leading batch matmuls, and head_dim here
    # is tiny (C/heads), so per-head (T,d)x(d,T) matmuls are the clean lowering.
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(key_mask, logits, jnp.finfo(jnp.float32).min)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[0, 0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def window_attention_fused(qw, kw, vw, num_heads: int, key_valid):
    """Fused attention over pre-partitioned windows.

    qw/kw/vw: (B, N_windows, T, C); returns (B, N_windows, T, C).
    ``key_valid``: (N_windows, T) per-window key validity (>0 = real token) —
    the same mask construction as the XLA path in ops/window_attention.py, so
    2D-ragged edge windows (invalid columns interleaved in flattened token
    order) are handled exactly. Each (batch, window) pair is one grid step:
    logits + softmax live entirely in VMEM and never touch HBM.
    """
    b, n, t, c = qw.shape
    key_valid = jnp.asarray(key_valid, jnp.float32).reshape(n, t)
    spec = pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((n, t), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_window_attn_kernel, num_heads=num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[spec, spec, spec, mask_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, t, c), vw.dtype),
        interpret=not _on_tpu(),
    )(qw, kw, vw, key_valid)
    return out


# ---------------------------------------------------------------------------
# Fused uint8 -> float -> ImageNet normalize
# ---------------------------------------------------------------------------


def _normalize_kernel(u8_ref, scale_ref, shift_ref, o_ref):
    # out = u8/255 * (1/std) + (-mean/std), folded into one multiply-add.
    # Mosaic has no direct u8->f32 cast; hop through int32.
    x = u8_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = x * scale_ref[:] + shift_ref[:]


def normalize_u8_fused(rgb_u8):
    """(B, H, W, 3) uint8 -> normalized float32 in one fused pass."""
    b, h, w, c = rgb_u8.shape
    import numpy as np

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    scale = jnp.asarray((1.0 / (255.0 * std)).reshape(1, 1, 1, c))
    shift = jnp.asarray((-mean / std).reshape(1, 1, 1, c))
    spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, 1, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _normalize_kernel,
        grid=(b,),
        in_specs=[spec, vec_spec, vec_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        # Mosaic rejects 3-lane NHWC blocks; interpret everywhere. The live
        # pipeline uses the jnp equivalent, which XLA fuses into the consumer.
        interpret=True,
    )(rgb_u8, scale, shift)
