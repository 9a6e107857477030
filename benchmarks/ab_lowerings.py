"""A/B lowering experiments on the TPU (one process — numbers are comparable).

1. resize_bilinear: gather vs dense-matmul at the flagship's actual shapes,
   fwd and fwd+bwd.
2. windowed attention: XLA batched einsum vs the fixed Pallas fused kernel at
   the flagship 56x72/ws16 ragged grid.
3. ConvTranspose (lhs_dilation lowering) cost check.
4. preprocess_train elementwise pipeline cost.

Run from repo root: python benchmarks/ab_lowerings.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, warmup=3, steps=20, repeats=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    meds = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        meds.append((time.perf_counter() - t0) / steps)
    sec = float(np.median(meds))
    print(f"{name:54s} {sec * 1e3:8.3f} ms", flush=True)
    return sec


def resize_gather(x, out_hw, align):
    from mde_tpu.ops.resize import _interp_taps

    def one_axis(x, axis, out_size):
        i0, i1, frac = _interp_taps(x.shape[axis], out_size, align)
        a = jnp.take(x, jnp.asarray(i0), axis=axis)
        b = jnp.take(x, jnp.asarray(i1), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        w1 = jnp.asarray(frac, dtype=x.dtype).reshape(shape)
        return a + (b - a) * w1

    h_axis = x.ndim - 3
    x = one_axis(x, h_axis, out_hw[0])
    return one_axis(x, h_axis + 1, out_hw[1])


def resize_matmul(x, out_hw, align, precision="highest"):
    from mde_tpu.ops.resize import _interp_matrix

    h_axis = x.ndim - 3
    for axis, out_size in ((h_axis, out_hw[0]), (h_axis + 1, out_hw[1])):
        w = jnp.asarray(_interp_matrix(x.shape[axis], out_size, align))
        y = jnp.tensordot(w.astype(x.dtype) if precision is None else w,
                          x, axes=((1,), (axis,)),
                          precision=precision)
        x = jnp.moveaxis(y, 0, axis)
    return x


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    b = 8

    shapes = [
        ((b, 224, 280, 32), (448, 576), "dino_feats up 224x280->448x576 x32"),
        ((b, 448, 576, 3), (224, 280), "rgb down 448x576->224x280 x3"),
        ((b, 224, 288, 32), (448, 576), "head 2x up 224x288->448x576 x32"),
        ((b, 112, 144, 64), (224, 288), "decoder 2x up 112x144 x64"),
    ]
    for dtype in (jnp.bfloat16, jnp.float32):
        for shape, out_hw, label in shapes:
            x = jnp.asarray(rng.standard_normal(shape), dtype)
            g = jax.jit(lambda x: resize_gather(x, out_hw, True))
            m_hi = jax.jit(lambda x: resize_matmul(x, out_hw, True, "highest"))
            m_def = jax.jit(lambda x: resize_matmul(x, out_hw, True, None))
            d = "bf16" if dtype == jnp.bfloat16 else "f32"
            timeit(f"[{d}] {label} GATHER", g, x)
            timeit(f"[{d}] {label} MATMUL(hi)", m_hi, x)
            timeit(f"[{d}] {label} MATMUL(native)", m_def, x)
            # numeric check
            a = np.asarray(g(x), np.float32)
            c = np.asarray(m_hi(x), np.float32)
            print(f"{'':54s} max|g-m| = {np.abs(a - c).max():.2e}", flush=True)

    # grad through resize (the decoder path trains)
    x = jnp.asarray(rng.standard_normal((b, 224, 280, 32)), jnp.bfloat16)

    def loss_g(x):
        return jnp.sum(resize_gather(x, (448, 576), True).astype(jnp.float32) ** 2)

    def loss_m(x):
        return jnp.sum(resize_matmul(x, (448, 576), True).astype(jnp.float32) ** 2)

    timeit("grad resize GATHER", jax.jit(jax.grad(loss_g)), x)
    timeit("grad resize MATMUL(hi)", jax.jit(jax.grad(loss_m)), x)

    # ---- windowed attention XLA vs Pallas at flagship 56x72 ----
    from mde_tpu.ops.window_attention import windowed_cross_attention

    for dtype, d in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        q, k, v = (jnp.asarray(rng.standard_normal((b, 56, 72, 32)), dtype) for _ in range(3))
        xla = jax.jit(lambda q, k, v: windowed_cross_attention(q, k, v, 8, 16, backend="xla"))
        pls = jax.jit(lambda q, k, v: windowed_cross_attention(q, k, v, 8, 16, backend="pallas"))
        timeit(f"[{d}] window_attn 56x72 XLA", xla, q, k, v)
        try:
            timeit(f"[{d}] window_attn 56x72 PALLAS", pls, q, k, v)
            a = np.asarray(xla(q, k, v), np.float32)
            c = np.asarray(pls(q, k, v), np.float32)
            print(f"{'':54s} max|xla-pallas| = {np.abs(a - c).max():.2e}", flush=True)
        except Exception as e:
            print(f"PALLAS failed: {type(e).__name__}: {e}", flush=True)

    # ---- ConvTranspose lowering ----
    import flax.linen as nn

    from mde_tpu.nn.blocks import ConvTranspose

    x32 = jnp.asarray(rng.standard_normal((b, 112, 144, 32)), jnp.bfloat16)
    ct = ConvTranspose(32, 4, 2, 1)
    v_ct = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), ct.init(jax.random.key(0), x32)
    )
    timeit("ConvTranspose 4s2 x32 @112x144 (lhs_dilation)", jax.jit(lambda v, x: ct.apply(v, x)), v_ct, x32)

    # ---- preprocess pieces ----
    from mde_tpu.data import transforms as T
    from mde_tpu.ops import image as I

    rgb_u8 = jnp.asarray(rng.integers(0, 255, (b, 448, 576, 3)).astype(np.uint8))
    depth = jnp.asarray(rng.uniform(0.5, 9.5, (b, 448, 576)).astype(np.float32))
    key = jax.random.key(0)
    timeit("preprocess_train full", jax.jit(lambda k, r, d: T.preprocess_train(k, r, d, input_size=(448, 576))), key, rgb_u8, depth)
    timeit("color_jitter only", jax.jit(lambda k, r: I.color_jitter(k, I.to_float(r), 0.2, 0.2, 0.2, 0.1)), key, rgb_u8)
    timeit("to_float+normalize only", jax.jit(lambda r: I.normalize_imagenet(I.to_float(r))), rgb_u8)


if __name__ == "__main__":
    main()
