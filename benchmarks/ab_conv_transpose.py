"""A/B: transposed-conv lowerings on the TPU (one process — comparable numbers).

Compares the input-dilated lowering (nn/blocks.py::ConvTranspose — conv over a
zero-dilated input, exactly torch's semantics) against an output-phase
("pixel-shuffle") decomposition that computes only the (k/s)^2 real taps per
output, at the flagship's actual transposed-conv shapes.

RESULT (TPU v5e via axon, 2026-08-16, bf16 bs8): the phased form LOSES at
every shape — 0.94x @56x72, 0.96x @112x144, 0.54x @224x288 fwd, 0.75x grad.
XLA's TPU conv emitter already skips dilation zeros, so the decomposition only
adds a phase-interleave HBM pass. The dilated form stays the live lowering.

Also documents an axon XLA MISCOMPILE (see CLAUDE.md): assembling phases via
``y.reshape(..., s*s, C)`` then integer-indexed slicing returns wrong values
for offset-1 phases under jit on TPU. The implementation below uses 4-D
channel-range slicing, which lowers correctly (verified vs CPU golden).

Run from repo root: python benchmarks/ab_conv_transpose.py
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
    print(f"{name:58s} {sec * 1e3:8.3f} ms", flush=True)
    return sec


def dilated(x, kernel, s, p):
    k = kernel.shape[0]
    pad = k - 1 - p
    return jax.lax.conv_general_dilated(
        x, jnp.flip(kernel, axis=(0, 1)), (1, 1), ((pad, pad), (pad, pad)),
        lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def phased(x, kernel, s, p):
    """Output-phase decomposition (requires k == s + 2p, true of every
    reference transposed conv): one dense VALID conv producing all s^2 phases
    as extra output channels, then a slice/stack interleave. Numerically
    identical to ``dilated`` (adding dilation zeros is exact in fp)."""
    k = kernel.shape[0]
    kk = k // s
    pe = k - 1 - p
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]

    wf = jnp.flip(kernel, axis=(0, 1))
    a_vals = [-((pe - r) // s) for r in range(s)]
    lo = min(a_vals)
    hi = max(a_vals) + kk - 1
    offs = [a - lo for a in a_vals]
    phases = [wf[(pe - rh) % s :: s, (pe - rw) % s :: s] for rh in range(s) for rw in range(s)]
    kcomb = jnp.concatenate(phases, axis=-1)
    xp = jnp.pad(x, ((0, 0), (-lo, max(0, hi)), (-lo, max(0, hi)), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kcomb, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # 4-D channel-range slices — NOT reshape(..., s*s, C) + integer index,
    # which the axon TPU backend miscompiles under jit (CLAUDE.md).
    rows = []
    for rh in range(s):
        cols = [
            y[:, offs[rh] : offs[rh] + h, offs[rw] : offs[rw] + w,
              (rh * s + rw) * cout : (rh * s + rw + 1) * cout]
            for rw in range(s)
        ]
        rows.append(jnp.stack(cols, axis=3))
    return jnp.stack(rows, axis=2).reshape(b, h * s, w * s, cout)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    b = 8
    cases = [
        ((4, 2, 1), (b, 56, 72, 32), "CrossAttention up0 56x72 x32"),
        ((4, 2, 1), (b, 112, 144, 32), "CrossAttention up1 112x144 x32"),
        ((4, 2, 1), (b, 224, 288, 32), "CrossAttention up2 224x288 x32"),
        ((4, 4, 0), (b, 16, 20, 128), "Dinov2Head resize_0 16x20 x128"),
        ((2, 2, 0), (b, 16, 20, 256), "Dinov2Head resize_1 16x20 x256"),
    ]
    for (k, s, p), shape, label in cases:
        cin = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((k, k, cin, cin)) * 0.05, jnp.bfloat16)
        f_dil = jax.jit(lambda x, w, s=s, p=p: dilated(x, w, s, p))
        f_pha = jax.jit(lambda x, w, s=s, p=p: phased(x, w, s, p))
        t1 = timeit(f"[bf16] {label} DILATED", f_dil, x, kern)
        t2 = timeit(f"[bf16] {label} PHASED", f_pha, x, kern)
        a = np.asarray(f_dil(x, kern), np.float32)
        c = np.asarray(f_pha(x, kern), np.float32)
        if t1 and t2:
            print(f"{'':58s} dil/pha {t1 / t2:.2f}x  max|d-p| = {np.abs(a - c).max():.2e}",
                  flush=True)

    x = jnp.asarray(rng.standard_normal((b, 224, 288, 32)), jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((4, 4, 32, 32)) * 0.05, jnp.bfloat16)
    timeit("[bf16] grad up2 224x288 DILATED",
           jax.jit(jax.grad(lambda w: jnp.sum(dilated(x, w, 2, 1).astype(jnp.float32) ** 2))), kern)
    timeit("[bf16] grad up2 224x288 PHASED",
           jax.jit(jax.grad(lambda w: jnp.sum(phased(x, w, 2, 1).astype(jnp.float32) ** 2))), kern)


if __name__ == "__main__":
    main()
