"""Root-cause the dpt_hybrid sweep outlier (VERDICT r4 Weak #3).

dpt_hybrid's forward CPU-vs-TPU rel-L2 has sat at 4.05e-2 for two rounds —
81% of the global 5e-2 sweep budget, ~40x the flagship — with no per-stage
localization. Suspects: (a) a real lowering fault in one stage, (b) cumulative
bf16-default-precision matmul noise through the zoo's DEEPEST trunk
(ResNetV2-50 preact stages + ViT-B/16 = ~40 matmul layers, each GroupNorm/
LayerNorm re-normalizing so RELATIVE error compounds instead of washing out),
amplified by weight standardization (StdConv divides kernels by their own std,
so every kernel is unit-variance and bf16's ~4e-3 relative quantization of the
standardized weights enters every layer at full strength).

The probe compares CPU-golden vs TPU at each trunk tap and vs depth:
  1. ResNetV2Stem taps: stage1 (/4), stage2 (/8), final (/16)
  2. the full hybrid model output
  3. a single StdConv and a GroupNorm in isolation
  4. (discriminator) the full ResNetV2Stem with fp64-free CPU fp32 weights but
     TPU matmuls forced to float32 precision (jax.default_matmul_precision) —
     if the error collapses, the outlier is bf16 accumulation, not a
     miscompile.

Run: JAX_PLATFORMS=axon,cpu python benchmarks/diag_dpt_hybrid.py

RESULT (2026-08-21, v5e via axon):
  StdConv 3->64 k7 s2            default   2.38e-3
  ResNetV2Stem taps s1/s2/final  default   1.17e-2 / 2.95e-2 / 1.06e-1
  ResNetV2Stem taps s1/s2/final  float32   5.79e-6 / 1.42e-5 / 5.54e-5
  DPT hybrid full                default   4.06e-2   (matches the sweep's 4.05e-2)
  DPT hybrid full                float32   1.88e-5
Reading: suspect (b) confirmed, (a) excluded — the outlier is cumulative
bf16-default-precision matmul error through the zoo's deepest trunk (relative
error roughly x2.5 per preact stage, each GroupNorm re-normalizing so it
compounds instead of washing out; a single StdConv contributes 2.4e-3, so no
single stage is anomalous). Forcing fp32 matmul precision collapses the
full-model error by 3 orders of magnitude, which a lowering miscompile could
not do. Consequence baked into tpu_numeric_sweep.py: uniform 1e-2 threshold +
automatic fp32-precision discriminator for the 1e-2..1e-1 band, replacing the
one-size 5e-2 budget.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def rel_l2(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12))


def compare(name, build_fn, x, precisions=("default",)):
    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    with jax.default_device(cpu):
        model = build_fn()
        variables = model.init(jax.random.key(0), x)
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        ref = jax.device_get(fwd(variables, x))
    put = lambda t: jax.device_put(t, accel)
    for prec in precisions:
        if prec == "default":
            got = jax.device_get(jax.jit(lambda v, x: model.apply(v, x))(
                put(variables), put(x)))
        else:
            with jax.default_matmul_precision(prec):
                got = jax.device_get(jax.jit(lambda v, x: model.apply(v, x))(
                    put(variables), put(x)))
        refs = jax.tree_util.tree_leaves(ref)
        gots = jax.tree_util.tree_leaves(got)
        rels = [rel_l2(r, g) for r, g in zip(refs, gots)]
        print(f"{name:36s} prec={prec:10s} rel_l2 " +
              "  ".join(f"{r:.3e}" for r in rels), flush=True)


def main():
    from mde_tpu.models.dpt import DPTDepthModel
    from mde_tpu.nn.resnetv2 import ResNetV2Stem, StdConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (1, 64, 96, 3)).astype(np.float32))

    compare("StdConv 3->64 k7 s2", lambda: StdConv(64, 7, 2), x)
    compare("ResNetV2Stem taps (s1,s2,final)", lambda: ResNetV2Stem(),
            x, precisions=("default", "float32"))

    class _Hybrid(DPTDepthModel):
        pass

    compare(
        "DPT hybrid full",
        lambda: DPTDepthModel(backbone="vitb_rn50_384", features=64,
                              non_negative=False),
        x, precisions=("default", "float32"),
    )


if __name__ == "__main__":
    main()
