"""A/B: FusionStack lowering attack (VERDICT r2 weak #2 / next-round item 3).

The FusionStack — the post-concat tail of MidasNetSemantics (fusion_blocks_0,
fusion_head_*, depth_head_* at full 448x576 resolution, 16-64 channels) — is
43% of flagship forward time (BASELINE.md round-2 breakdown, 31.6 ms of
74.2 ms at bs8). Its convs are stride-1 3x3/1x1 with cout in {16,32,64}: on
the MXU the output-channel dim pads to 128 lanes, so the natural question is
which lowering recovers the wasted lanes. Three experiments, one process,
interleave-free but same-session (each prints its own numbers):

1. **Lane probe** — 3x3 conv cin=64 at 448x576 bs8 with cout swept
   16..256. If time is flat up to cout=128, small-cout convs are lane-bound
   and any transform that trades FLOPs for lane occupancy is a wash by
   construction (time ~ HW * cin * K^2 * roundup(cout,128)); if time scales
   with cout, there is no padding waste to recover.

2. **Merged conv1+shortcut** — ResidualBlock's 3x3 conv1 and 1x1 shortcut
   read the same input (models/midas_semantics.py:44-55); embedding the 1x1
   in a 3x3 center tap and concatenating kernels turns two half-empty MXU
   passes into one. Same parameters, apply-time-only rewrite.

3. **Winograd F(2x2, 3x3)** — 2.25x fewer MACs for the dominant 64->64
   stride-1 3x3 convs (62% of FusionStack FLOPs), at the cost of 4x
   intermediate data (16 tap coefficients per 2x2 output tile) and core
   matmuls that contract only cin (64) instead of the direct conv's 9*cin
   (576). Whether the MAC saving survives the lane/HBM cost is exactly what
   the measurement decides.

The RESULT block at the bottom of this docstring records the measured verdict
(kept current, win or lose — documented negatives are the point of this file).

RESULT (TPU v5e via axon, bs8 bf16, 2026-08-18, /tmp/ab_fusion.log):

1. Lane probe CONFIRMS lane-bound small-cout convs: 3x3 cin=64 @448x576 runs
   8.1 / 8.4 / 7.6 / 7.7 ms at cout 16/32/64/128 (flat, 4.7->39.4 TFLOP/s),
   then 11.4 ms at cout=256. Time ~ HW*cin*K^2*roundup(cout,128) as predicted.
2. Merged conv1+shortcut at the fusion_head_0 shape ALONE is a wash (fwd
   0.95x, grad 0.93x — the post-split channel copies eat the lane win), but
   the FULL FusionStack tail with merge_entry=True wins 1.07x fwd
   (33.80 -> 31.65 ms) and 1.07x grad (70.37 -> 65.69 ms), rel-L2 vs the
   separate lowering 2.22e-04 (bf16 noise floor). Landed: the win comes from
   the merged entries deeper in the stack where the splits feed convs XLA
   fuses the slice into, not from the head block measured in isolation.
3. Winograd F(2x2,3x3) LOSES badly: fwd 0.18x (41.1 vs 7.4 ms), grad 0.12x.
   The 2.25x MAC saving is swamped by 16 tap matmuls that contract only
   cin=64 instead of 9*cin=576 — each runs far below the MXU's depth sweet
   spot — plus 4x intermediate HBM traffic. Documented negative; direct conv
   stays (it already runs at 20.6 TFLOP/s here).
4. Conv epilogue fusion is ALREADY FREE in eval form: conv+affine+relu 7.35 ms
   vs bare conv 7.40 ms (-0.8%). Train-stats BN costs +21.7% (the stats
   reduction is a second pass over the activation). No hand-fused kernel
   warranted; negative result kept as the justification.

Run from repo root: python benchmarks/ab_fusion_stack.py [batch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()  # warm restarts skip the remote compile helper


import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit

H, W = 448, 576


def conv3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv1(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ---------------------------------------------------------------- lane probe
def lane_probe(b):
    print("\n== 1. lane probe: 3x3 conv cin=64 @ %dx%dx bs%d bf16 ==" % (H, W, b))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, H, W, 64)), jnp.bfloat16)
    f = jax.jit(conv3)
    base = None
    for cout in (16, 32, 64, 128, 256):
        k = jnp.asarray(rng.standard_normal((3, 3, 64, cout)) * 0.05, jnp.bfloat16)
        sec = timeit(f"  cout={cout}", f, x, k)
        tf = 2.0 * b * H * W * 64 * cout * 9 / sec / 1e12
        if base is None:
            base = sec
        print(f"    -> {tf:6.2f} TFLOP/s   ({sec / base:4.2f}x cout=16 time)")


# ------------------------------------------------- merged conv1 + shortcut
def merged_resblock_entry(b):
    """ResidualBlock entry at the fusion_head_0 shape: conv1 (3x3 64->32) and
    shortcut (1x1 64->32) both read x. Merged: one 3x3 64->64 with the 1x1
    embedded at the center tap, split after."""
    print("\n== 2. merged conv1+shortcut (fusion_head_0: 64 -> 32+32) ==")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, H, W, 64)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 64, 32)) * 0.05, jnp.bfloat16)
    ks = jnp.asarray(rng.standard_normal((1, 1, 64, 32)) * 0.05, jnp.bfloat16)

    @jax.jit
    def separate(x, k1, ks):
        return conv3(x, k1), conv1(x, ks)

    @jax.jit
    def merged(x, k1, ks):
        ks3 = jnp.pad(ks, ((1, 1), (1, 1), (0, 0), (0, 0)))
        y = conv3(x, jnp.concatenate([k1, ks3], axis=-1))
        return y[..., :32], y[..., 32:]

    a1, a2 = jax.device_get(separate(x, k1, ks))
    b1, b2 = jax.device_get(merged(x, k1, ks))
    for a, c in ((a1, b1), (a2, b2)):
        rel = np.linalg.norm(np.float32(a) - np.float32(c)) / (
            np.linalg.norm(np.float32(a)) + 1e-9
        )
        assert rel < 2e-2, rel
    t_sep = timeit("  separate (two convs)", separate, x, k1, ks)
    t_mrg = timeit("  merged (one 64-cout conv)", merged, x, k1, ks)
    print(f"    -> merged fwd speedup {t_sep / t_mrg:4.2f}x")

    # and through the backward (what the train step sees)
    def loss_sep(k1, ks):
        y1, y2 = conv3(x, k1), conv1(x, ks)
        return jnp.sum(jnp.float32(y1)) + jnp.sum(jnp.float32(y2))

    def loss_mrg(k1, ks):
        ks3 = jnp.pad(ks, ((1, 1), (1, 1), (0, 0), (0, 0)))
        y = conv3(x, jnp.concatenate([k1, ks3], axis=-1))
        return jnp.sum(jnp.float32(y))

    g_sep = jax.jit(jax.grad(loss_sep, argnums=(0, 1)))
    g_mrg = jax.jit(jax.grad(loss_mrg, argnums=(0, 1)))
    t_gs = timeit("  separate grad", g_sep, k1, ks)
    t_gm = timeit("  merged grad", g_mrg, k1, ks)
    print(f"    -> merged grad speedup {t_gs / t_gm:4.2f}x")


# --------------------------------------------- full FusionStack merged A/B
def fusion_stack_merged_ab(b):
    """The real landing target: the flagship's whole post-concat tail
    (fusion_blocks_0 .. depth_head_1 at 448x576) with ResidualBlock's
    merge_entry on vs off — same params (the merge keeps the tree identical),
    fwd and train-style grad."""
    print("\n== 2b. FusionStack merge_entry A/B (full tail @%dx%dx128 bs%d) ==" % (H, W, b))
    import flax.linen as nn

    from mde_tpu.models.midas_semantics import ResidualBlock
    from mde_tpu.nn.blocks import BatchNorm, Conv
    from mde_tpu.train.trainer import _cast_floating

    class FusionStack(nn.Module):
        merge: bool = True

        @nn.compact
        def __call__(self, x):
            h = ResidualBlock(64, merge_entry=self.merge, name="fusion_blocks_0")(x)
            h = ResidualBlock(32, merge_entry=self.merge, name="fusion_head_0")(h)
            h = Conv(32, 3, 1, 1, name="fusion_head_1")(h)
            h = BatchNorm(True, None, name="fusion_head_bn")(h)
            h = nn.relu(h)
            h = ResidualBlock(16, merge_entry=self.merge, name="depth_head_0")(h)
            return Conv(1, 3, 1, 1, name="depth_head_1")(h)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, H, W, 128)), jnp.bfloat16)
    m_on, m_off = FusionStack(True), FusionStack(False)
    v = _cast_floating(m_off.init(jax.random.key(0), x[:1]), jnp.bfloat16)

    f_on = jax.jit(lambda v, x: m_on.apply(v, x))
    f_off = jax.jit(lambda v, x: m_off.apply(v, x))
    a = np.float32(jax.device_get(f_off(v, x)))
    c = np.float32(jax.device_get(f_on(v, x)))
    rel = np.linalg.norm(a - c) / (np.linalg.norm(a) + 1e-9)
    print(f"  rel-L2 merged vs separate (bf16): {rel:.2e}")
    assert rel < 2e-2, rel
    t_off = timeit("  separate fwd", f_off, v, x)
    t_on = timeit("  merged fwd", f_on, v, x)
    print(f"    -> merged fwd speedup {t_off / t_on:4.2f}x")

    g_on = jax.jit(jax.grad(lambda v, x: jnp.sum(jnp.float32(m_on.apply(v, x)))))
    g_off = jax.jit(jax.grad(lambda v, x: jnp.sum(jnp.float32(m_off.apply(v, x)))))
    t_goff = timeit("  separate grad", g_off, v, x)
    t_gon = timeit("  merged grad", g_on, v, x)
    print(f"    -> merged grad speedup {t_goff / t_gon:4.2f}x")


# ----------------------------------------------- conv epilogue fusion check
def epilogue_fusion_check(b):
    """Is a hand-fused conv-BN-ReLU epilogue worth writing (VERDICT r3 item 3
    suggestion)? Time conv alone vs conv+BN(train stats)+ReLU vs
    conv+BN(running stats)+ReLU at the FusionStack shape. If the epilogue adds
    ~nothing, XLA already fuses the elementwise tail into the conv's output
    loop and a Pallas epilogue kernel has no headroom by construction."""
    print("\n== 4. conv epilogue fusion: 3x3 64->64 @ %dx%d bs%d bf16 ==" % (H, W, b))
    import flax.linen as nn

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, H, W, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.bfloat16)

    f_conv = jax.jit(conv3)
    t_c = timeit("  conv only", f_conv, x, k)

    @jax.jit
    def conv_bn_eval_relu(x, k, scale, bias):
        y = conv3(x, k)
        return nn.relu(y * scale + bias)  # running-stats BN folds to affine

    t_e = timeit("  conv + affine(BN-eval) + relu", conv_bn_eval_relu, x, k, scale, bias)

    @jax.jit
    def conv_bn_train_relu(x, k, scale, bias):
        y = conv3(x, k)
        mu = jnp.mean(jnp.float32(y), axis=(0, 1, 2))
        var = jnp.var(jnp.float32(y), axis=(0, 1, 2))
        yn = (y - mu.astype(y.dtype)) * jax.lax.rsqrt(var + 1e-5).astype(y.dtype)
        return nn.relu(yn * scale + bias)

    t_t = timeit("  conv + BN(train stats) + relu", conv_bn_train_relu, x, k, scale, bias)
    print(
        f"    -> epilogue overhead: eval +{100 * (t_e / t_c - 1):.1f}%, "
        f"train-stats +{100 * (t_t / t_c - 1):.1f}% over bare conv"
    )


# ------------------------------------------------------ Winograd F(2x2,3x3)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd3x3(x, k):
    """F(2x2,3x3) stride-1 pad-1 conv, NHWC. Same function as conv3 up to fp
    reassociation. Transforms in the activation dtype; kernel transform fp32
    then cast (G has exact-in-bf16 0.5 entries anyway)."""
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    nh, nw = h // 2, w // 2
    dt = x.dtype

    u = jnp.einsum(
        "iu,uvcd,jv->ijcd", G, jnp.float32(k), G, precision="highest"
    ).astype(dt)  # (4,4,cin,cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[u,v] tile grid: strided slices of the padded input
    rows = [xp[:, r : r + 2 * nh : 2] for r in range(4)]
    d = jnp.stack(
        [jnp.stack([r_[:, :, c : c + 2 * nw : 2] for c in range(4)]) for r_ in rows]
    )  # (4,4,B,nh,nw,cin)
    bt = jnp.asarray(BT, dt)
    v = jnp.einsum("iu,uvbnmc,jv->ijbnmc", bt, d, bt)
    m = jnp.einsum("ijbnmc,ijcd->ijbnmd", v, u)
    at = jnp.asarray(AT, dt)
    y = jnp.einsum("pi,ijbnmd,qj->bnpmqd", at, m, at)  # (B,nh,2,nw,2,cout)
    return y.reshape(b, h, w, cout)


def winograd_ab(b):
    print("\n== 3. Winograd F(2x2,3x3) vs direct, 64->64 @ %dx%d bs%d ==" % (H, W, b))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, H, W, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)

    f_dir = jax.jit(conv3)
    f_win = jax.jit(winograd3x3)
    a = np.float32(jax.device_get(f_dir(x, k)))
    c = np.float32(jax.device_get(f_win(x, k)))
    rel = np.linalg.norm(a - c) / (np.linalg.norm(a) + 1e-9)
    print(f"  rel-L2 winograd vs direct (bf16): {rel:.2e}")
    assert rel < 5e-2, rel

    t_d = timeit("  direct conv fwd", f_dir, x, k)
    t_w = timeit("  winograd fwd", f_win, x, k)
    print(f"    -> winograd fwd speedup {t_d / t_w:4.2f}x "
          f"(direct {2*b*H*W*64*64*9/t_d/1e12:.1f} TFLOP/s)")

    g_d = jax.jit(jax.grad(lambda k: jnp.sum(jnp.float32(conv3(x, k)))))
    g_w = jax.jit(jax.grad(lambda k: jnp.sum(jnp.float32(winograd3x3(x, k)))))
    t_gd = timeit("  direct grad", g_d, k)
    t_gw = timeit("  winograd grad", g_w, k)
    print(f"    -> winograd grad speedup {t_gd / t_gw:4.2f}x")


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"platform={jax.devices()[0].platform} batch={b}")
    lane_probe(b)
    merged_resblock_entry(b)
    fusion_stack_merged_ab(b)
    epilogue_fusion_check(b)
    winograd_ab(b)


if __name__ == "__main__":
    main()
