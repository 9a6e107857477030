"""Within-process ablation timing of the flagship train step.

The axon TPU's throughput drifts heavily across sessions (CLAUDE.md), so the
only trustworthy breakdown is A/B inside ONE process. This times each suspect
component as its own jitted program (same batch, same dtype policy) plus a
"speed of light" conv anchor, and prints a table.

Run from the repo root: python benchmarks/profile_flagship.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()  # warm restarts skip the remote compile helper


import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, warmup=3, steps=10, repeats=3):
    """Median-of-repeats seconds per call; syncs via device_get of a scalar."""
    try:
        out = None
        for _ in range(warmup):
            out = fn(*args)
        _sync(out)
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(*args)
            _sync(out)
            best.append((time.perf_counter() - t0) / steps)
        sec = float(np.median(best))
        print(f"{name:42s} {sec * 1e3:9.2f} ms   (min {min(best)*1e3:.2f})", flush=True)
        return sec
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = (448, 576)
    print(f"platform={jax.devices()[0].platform} batch={batch} size={size}", flush=True)

    from mde_tpu.core import config as config_lib
    from mde_tpu.data import transforms as T
    from mde_tpu.models import build_model
    from mde_tpu.models.midas_semantics import CrossAttention, Dinov2Head, ResidualBlock
    from mde_tpu.models.midas_small import MidasNetSmall
    from mde_tpu.nn.vit import ViT
    from mde_tpu.ops.resize import resize_bilinear
    from mde_tpu.train import create_train_state, make_train_step
    from mde_tpu.train.trainer import _apply_model, _cast_floating

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    rng = np.random.default_rng(0)
    rgb_u8 = jnp.asarray(rng.integers(0, 255, (batch, *size, 3)).astype(np.uint8))
    depth = jnp.asarray(rng.uniform(0.5, 9.5, (batch, *size)).astype(np.float32))
    key = jax.random.key(1)

    # ---- 0. speed-of-light anchors ----
    x64 = jnp.asarray(rng.standard_normal((batch, *size, 64)), jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.01, jnp.bfloat16)

    @jax.jit
    def conv_anchor(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    sec = timeit("anchor conv3x3 64->64 @448x576 bf16", conv_anchor, x64, w64)
    if sec:
        fl = batch * size[0] * size[1] * 9 * 64 * 64 * 2
        print(f"{'':42s} -> {fl / sec / 1e12:.1f} TFLOP/s", flush=True)

    # big matmul anchor
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return a @ a

    sec = timeit("anchor matmul 4096^3 bf16", mm, a)
    if sec:
        print(f"{'':42s} -> {2 * 4096**3 / sec / 1e12:.1f} TFLOP/s", flush=True)

    # ---- 1. preprocessing pipeline ----
    pipe = T.make_train_pipeline(False, size)
    timeit("preprocess_train (resize+jitter+norm)", jax.jit(pipe), key, rgb_u8, depth)

    rgb_f = pipe(key, rgb_u8, depth)[0]
    rgb_bf = rgb_f.astype(jnp.bfloat16)

    # ---- 2. resize ops in isolation ----
    feat32 = jnp.asarray(rng.standard_normal((batch, 224, 280, 32)), jnp.bfloat16)
    timeit(
        "resize 224x280->448x576 x32ch bf16 (gather)",
        jax.jit(lambda x: resize_bilinear(x, size, align_corners=True)),
        feat32,
    )
    timeit(
        "resize rgb 448x576->224x280 (down)",
        jax.jit(lambda x: resize_bilinear(x, (224, 280), align_corners=True)),
        rgb_bf,
    )

    # ---- 3. submodules, forward AND fwd+bwd, bf16 params ----
    # The bwd row differentiates w.r.t. params AND float inputs (the real
    # train step needs input cotangents through every submodule except the
    # first), so per-component fwd+bwd sums are comparable to the full step.
    def bench_module(name, module, *inputs, method=None, bwd=True):
        vars_ = module.init(jax.random.key(0), *inputs)
        vars_bf = _cast_floating(vars_, jnp.bfloat16)

        @jax.jit
        def fwd(v, *xs):
            return module.apply(v, *xs)

        timeit(name, fwd, vars_bf, *inputs)
        if not bwd:
            return

        @jax.jit
        def fwdbwd(v, *xs):
            def f(v, *xs):
                out = module.apply(v, *xs)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32))

            return jax.grad(f, argnums=tuple(range(1 + len(xs))))(v, *xs)

        timeit(name + " +bwd", fwdbwd, vars_bf, *inputs)

    midas = MidasNetSmall(head_32=True)
    bench_module("MidasNetSmall fwd (enc+dec) bf16", midas, rgb_bf)

    vit = ViT("dinov2_vits14")
    rgb_half = resize_bilinear(rgb_bf, (224, 280), align_corners=True)
    vars_vit = vit.init(jax.random.key(0), rgb_half, n_layers=4)
    vars_vit = _cast_floating(vars_vit, jnp.bfloat16)

    @jax.jit
    def vit_fwd(v, x):
        return vit.apply(v, x, n_layers=4)

    timeit("ViT-S/14 fwd @224x280 bf16", vit_fwd, vars_vit, rgb_half)

    tokens = vit_fwd(vars_vit, rgb_half)
    head = Dinov2Head(128)
    vars_head = head.init(jax.random.key(0), tokens, 16, 20)
    vars_head = _cast_floating(vars_head, jnp.bfloat16)

    @jax.jit
    def head_fwd(v, t):
        return head.apply(v, t, 16, 20)

    timeit("Dinov2Head fwd bf16", head_fwd, vars_head, tokens)

    # bwd wrt params only: the head's input is the FROZEN ViT's output, so no
    # cotangent flows past it in the real step (ViT itself has no bwd at all —
    # frozen params, and the image input needs no gradient).
    @jax.jit
    def head_fwdbwd(v, t):
        def f(v):
            out = head.apply(v, t, 16, 20)
            return jnp.sum(out.astype(jnp.float32))

        return jax.grad(f)(v)

    timeit("Dinov2Head +bwd (params)", head_fwdbwd, vars_head, tokens)

    mfeat = jnp.asarray(rng.standard_normal((batch, *size, 32)), jnp.bfloat16)
    dfeat = jnp.asarray(rng.standard_normal((batch, *size, 32)), jnp.bfloat16)
    ca = CrossAttention(32)
    vars_ca = ca.init(jax.random.key(0), mfeat, dfeat)
    vars_ca = _cast_floating(vars_ca, jnp.bfloat16)

    @jax.jit
    def ca_fwd(v, a, b):
        return ca.apply(v, a, b)

    timeit("CrossAttention fwd @448x576 bf16", ca_fwd, vars_ca, mfeat, dfeat)

    @jax.jit
    def ca_fwdbwd(v, a, b):
        def f(v, a, b):
            return jnp.sum(ca.apply(v, a, b).astype(jnp.float32))

        return jax.grad(f, argnums=(0, 1, 2))(v, a, b)

    timeit("CrossAttention +bwd", ca_fwdbwd, vars_ca, mfeat, dfeat)

    # full-res fusion stack (fusion_blocks_0 .. depth_head_1)
    import flax.linen as nn

    from mde_tpu.nn.blocks import BatchNorm, Conv

    class FusionStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = ResidualBlock(64, name="fusion_blocks_0")(x)
            h = ResidualBlock(32, name="fusion_head_0")(h)
            h = Conv(32, 3, 1, 1, name="fusion_head_1")(h)
            h = BatchNorm(True, None, name="fusion_head_bn")(h)
            h = nn.relu(h)
            h = ResidualBlock(16, name="depth_head_0")(h)
            return Conv(1, 3, 1, 1, name="depth_head_1")(h)

    cat = jnp.concatenate([mfeat, dfeat], axis=-1)
    bench_module("FusionStack fwd @448x576x64 bf16", FusionStack(), cat)

    # ---- 4. full model forward / train step ----
    model = build_model(cfg.model)
    state = create_train_state(model, jax.random.key(0), rgb_f[:1], cfg)

    @jax.jit
    def full_fwd(params, bstats, x):
        return _apply_model(model, params, bstats, x, False)[0]

    params_bf = _cast_floating(state.params, jnp.bfloat16)
    timeit("FULL flagship fwd bf16", full_fwd, params_bf, state.batch_stats, rgb_bf)

    step = make_train_step(model, cfg)

    def train_call(state, key, rgb_u8, depth):
        return step(state, key, rgb_u8, depth)

    # time train step without donating issues: measure by stepping state forward
    try:
        for _ in range(3):
            state, metrics = step(state, key, rgb_u8, depth)
        _sync(metrics["loss"])
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, metrics = step(state, key, rgb_u8, depth)
            _sync(metrics["loss"])
            reps.append((time.perf_counter() - t0) / 10)
        sec = float(np.median(reps))
        print(f"{'FULL train step (fwd+bwd+AdamW)':42s} {sec * 1e3:9.2f} ms   "
              f"(min {min(reps)*1e3:.2f})  -> {batch / sec:.1f} img/s", flush=True)
    except Exception as e:
        print(f"FULL train step FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
