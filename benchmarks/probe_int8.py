"""Probe: does int8 arithmetic have throughput headroom over bf16 on this chip?

Decides whether a quantized (W8A8) inference path is worth building: v5e-class
MXUs advertise 2x int8 peak over bf16, but what matters is what XLA actually
lowers through the axon toolchain today — s8xs8->s32 dot_general and
conv_general_dilated at the flagship's own shapes, A/B'd against bf16 in the
same process (session drift makes cross-run comparisons meaningless;
CLAUDE.md).

Usage: python benchmarks/probe_int8.py   (on the attached TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mde_tpu.core import compilation_cache

compilation_cache.enable()

from benchmarks.timing import timeit


def probe_matmul(n=4096):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    dot_i8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    dot_bf = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    flops = 2.0 * n**3
    t_bf = timeit("matmul bf16 4096^3", dot_bf, abf, bbf, warmup=2, steps=10, repeats=3)
    print(f"bf16 matmul: {flops / t_bf / 1e12:.1f} TFLOP/s")
    try:
        t_i8 = timeit("matmul int8 4096^3", dot_i8, a8, b8, warmup=2, steps=10, repeats=3)
        print(f"int8 matmul: {flops / t_i8 / 1e12:.1f} TOP/s  ({t_bf / t_i8:.2f}x vs bf16)")
    except Exception as e:
        print(f"int8 matmul FAILED: {type(e).__name__}: {e}")


def probe_conv(b=8, h=448, w=576, cin=64, cout=64):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin), dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout), dtype=np.int8))
    xbf = x8.astype(jnp.bfloat16)
    kbf = k8.astype(jnp.bfloat16)

    def conv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    conv_bf = jax.jit(lambda x, k: conv(x, k, jnp.float32))
    flops = 2.0 * b * h * w * cin * cout * 9
    t_bf = timeit(f"conv bf16 {cin}->{cout}@{h}x{w}", conv_bf, xbf, kbf,
                  warmup=2, steps=10, repeats=3)
    print(f"bf16 conv: {t_bf*1e3:.2f} ms  {flops / t_bf / 1e12:.1f} TFLOP/s")
    try:
        conv_i8 = jax.jit(lambda x, k: conv(x, k, jnp.int32))
        t_i8 = timeit(f"conv int8 {cin}->{cout}@{h}x{w}", conv_i8, x8, k8,
                      warmup=2, steps=10, repeats=3)
        print(f"int8 conv: {t_i8*1e3:.2f} ms  {flops / t_i8 / 1e12:.1f} TOP/s  "
              f"({t_bf / t_i8:.2f}x vs bf16)")
    except Exception as e:
        print(f"int8 conv FAILED: {type(e).__name__}: {e}")
    # im2col + dot fallback form (what a Pallas kernel would do)
    try:
        def conv_im2col(x, k):
            patches = jax.lax.conv_general_dilated_patches(
                x.astype(jnp.int8), (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (b, h, w, 9*cin)
            m = patches.reshape(-1, 9 * cin)
            km = k.transpose(2, 0, 1, 3).reshape(9 * cin, cout)  # match patch layout
            return jax.lax.dot_general(
                m, km, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).reshape(b, h, w, cout)

        f = jax.jit(conv_im2col)
        t_im = timeit("conv int8 im2col", f, x8, k8, warmup=2, steps=10, repeats=3)
        print(f"int8 im2col conv: {t_im*1e3:.2f} ms ({t_bf / t_im:.2f}x vs bf16 conv)")
    except Exception as e:
        print(f"int8 im2col FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    probe_matmul()
    probe_conv()
    # the lane-bound small-cout case that dominates the FusionStack
    probe_conv(cin=64, cout=32)
