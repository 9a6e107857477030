"""TPU-vs-CPU numeric cross-check over the model zoo.

The axon stack has produced at least one genuine XLA miscompile (CLAUDE.md:
jitted reshape+strided-slice lowering gave wrong values on TPU only), so every
model family that ships should have its forward checked against the CPU golden
once on the real chip. This sweeps the zoo at tiny /32- and window-divisible
shapes: init on CPU, run the identical fp32 forward on both backends.

Metric: RELATIVE L2 over the whole output plus max-abs-diff normalized by the
output std. Do NOT use element-wise relative error here — TPU matmuls/convs
run at bf16 default precision, and dividing an ordinary bf16-scale absolute
error by a near-zero output element manufactures O(10) "relative errors" out
of healthy lowerings (measured: a bare fp32 matmul shows elementwise-max-rel
13.3 but rel-L2 2e-3; precision="highest" drops it to 1e-3). A real
miscompile shows up as rel-L2 near or above 1.

Gate (two-tier since 2026-08-21): uniform rel-L2 < 1e-2; any case between
1e-2 and 1e-1 is automatically re-run with fp32 matmul precision, which
discriminates benign bf16 accumulation through deep trunks (collapses to
<1e-3 on both metrics -> OK(bf16-accum)) from a real miscompile (precision-
independent -> FAIL). Root-cause evidence in benchmarks/diag_dpt_hybrid.py:
dpt_hybrid's 4.06e-2 grows stage-by-stage through the ResNetV2 stem at bf16
(1.2e-2 -> 3.0e-2 -> 1.1e-1) and collapses to 1.9e-5 at fp32.

Run from the repo root: JAX_PLATFORMS=axon,cpu python benchmarks/tpu_numeric_sweep.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()  # warm restarts skip the remote compile helper


import jax
import jax.numpy as jnp
import numpy as np


def cases():
    from mde_tpu.models.depth_anything import DepthAnythingV2
    from mde_tpu.models.dpt import DPTDepthModel
    from mde_tpu.models.midas_net import MidasNet
    from mde_tpu.models.midas_semantics import MidasNetSemantics
    from mde_tpu.models.midas_small import MidasNetSmall
    from mde_tpu.models.simple_unet import SimpleUNet

    # non_negative=False / sigmoid heads: a ReLU'd depth output at random init
    # is frequently all-zero, which would make any TPU-side garbage invisible
    # (and makes agreement trivially exact).
    nn = dict(non_negative=False)
    return [
        ("simple_unet", lambda: SimpleUNet(), (1, 64, 96, 3)),
        ("midas_small", lambda: MidasNetSmall(features=64, **nn), (1, 64, 96, 3)),
        # LocalBins + DGR (VERDICT r3 Missing #2): the attractor chain,
        # per-level align-corners resizes and cumsum/log-binomial
        # (models/localbins.py; reference localbins_net.py:69-74,
        # localbins_layers.py:171-361) are exactly the slice/reshape/broadcast
        # class the CLAUDE.md axon-miscompile gate requires a CPU-vs-TPU
        # cross-check for. non_negative stays False so the rel-depth input to
        # the bins head is non-degenerate at random init.
        ("midas_small_lb_dgr",
         lambda: MidasNetSmall(features=64, use_lb=True, use_dgr=True, **nn),
         (1, 64, 96, 3)),
        # Flagship with the LocalBins tail (midas_semantics.py:261-265 path).
        ("flagship_lb",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42), use_lb=True),
         (1, 64, 96, 3)),
        # Default flagship (merge_residual_entry=True since 2026-08-18 — the
        # merged variant passed this sweep at rel-L2 1.04e-3 and won the
        # full-tail A/B 1.07x fwd/bwd, ab_fusion_stack.py RESULT block).
        ("flagship_semantics",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42)), (1, 64, 96, 3)),
        # Keep the unmerged lowering swept too, isolating the kernel-concat +
        # channel-range-split entry (models/midas_semantics.py
        # ResidualBlock.merge_entry) against the axon miscompile class
        # CLAUDE.md documents: if exactly one of this pair fails, the merged
        # entry lowering is the culprit.
        ("flagship_unmerged_entry",
         lambda: MidasNetSemantics(
             dinov2_image_size=(28, 42), merge_residual_entry=False),
         (1, 64, 96, 3)),
        ("midas_v21", lambda: MidasNet(**nn), (1, 64, 96, 3)),
        ("dpt_vitb16", lambda: DPTDepthModel(backbone="vitb16_384", features=64, **nn),
         (1, 64, 96, 3)),
        ("dpt_hybrid", lambda: DPTDepthModel(backbone="vitb_rn50_384", features=64, **nn),
         (1, 64, 96, 3)),
        ("dpt_beitb16", lambda: DPTDepthModel(backbone="beitb16_384", features=64, **nn),
         (1, 64, 96, 3)),
        ("dpt_swin2t16", lambda: DPTDepthModel(backbone="swin2t16_256", features=64, **nn),
         (1, 64, 64, 3)),
        ("dpt_swinl12", lambda: DPTDepthModel(backbone="swinl12_384", features=64, **nn),
         (1, 96, 96, 3)),
        ("dpt_levit", lambda: DPTDepthModel(
            backbone="levit_384", head_features_1=64, head_features_2=8, **nn),
         (1, 64, 64, 3)),
        ("da2_vits", lambda: DepthAnythingV2(size="vits", max_depth=10.0), (1, 56, 84, 3)),
        # next_vit last: largest init on the 1-core host (hierarchical
        # conv/transformer stages, ~200M params)
        ("dpt_next_vit", lambda: DPTDepthModel(
            backbone="next_vit_large_6m", features=64, **nn), (1, 64, 96, 3)),
    ]


def main():
    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    assert accel.platform != "cpu", "run with a TPU attached"
    rng = np.random.default_rng(0)
    worst = 0.0
    failures = []
    only = set(sys.argv[1:])  # optional case-name filter for selective reruns

    for name, build, shape in cases():
        if only and name not in only:
            continue
        try:
            with jax.default_device(cpu):
                model = build()
                x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                variables = model.init(jax.random.key(0), x, train=False)

                def fwd(v, x):
                    return model.apply(v, x, train=False)

                out_cpu = np.asarray(jax.jit(fwd)(variables, x))
            v_t = jax.device_put(variables, accel)
            x_t = jax.device_put(x, accel)
            out_tpu = np.asarray(jax.jit(fwd)(v_t, x_t))
            diff = out_tpu - out_cpu
            rel_l2 = float(np.linalg.norm(diff) / max(np.linalg.norm(out_cpu), 1e-12))
            # maxdiff normalizer: output std, floored at 1% of the output
            # SCALE. The LocalBins heads produce a near-CONSTANT map at random
            # init (sum(p*c) with near-uniform bin probabilities: measured
            # std 2e-5..2e-4 on mean 0.73), so a bare /std manufactures
            # O(10) "failures" out of uniform bf16-level noise (measured
            # 2026-08-19: flagship_lb maxdiff 2.4e-4 spread over 100% of
            # pixels — no localized-corruption signature, which is what this
            # metric exists to catch; a real phase/slice miscompile shows up
            # at the OUTPUT scale, far above the 1% floor).
            scale = float(np.abs(out_cpu).mean())
            denom = max(float(np.std(out_cpu)), 1e-2 * scale, 1e-12)
            max_over_std = float(np.max(np.abs(diff)) / denom)
            status = "OK" if rel_l2 < 1e-2 and max_over_std < 0.5 else "FAIL"
            extra = ""
            if status == "FAIL" and rel_l2 < 1e-1:
                # Two-tier gate (2026-08-21, diag_dpt_hybrid.py): deep trunks
                # legitimately accumulate bf16-default-precision matmul error
                # past a tight uniform threshold (dpt_hybrid: 4.06e-2 at bf16,
                # growing 1.2e-2 -> 1.1e-1 through the ResNetV2 stem taps),
                # while a real lowering miscompile corrupts INDEPENDENT of
                # matmul precision. Re-running the case with fp32 matmuls
                # discriminates: accumulation collapses (hybrid: 1.9e-5),
                # a miscompile stays. This replaces the old one-size 5e-2
                # threshold, under which the worst family had the least
                # headroom to catch its own miscompile.
                with jax.default_matmul_precision("float32"):
                    out32 = np.asarray(jax.jit(fwd)(v_t, x_t))
                rel32 = float(
                    np.linalg.norm(out32 - out_cpu)
                    / max(np.linalg.norm(out_cpu), 1e-12)
                )
                mos32 = float(np.max(np.abs(out32 - out_cpu)) / denom)
                extra = f"  fp32_rel_l2 {rel32:9.2e}"
                # localized corruption is precision-independent too — require
                # the fp32 re-run to clear BOTH metrics
                if rel32 < 1e-3 and mos32 < 0.5:
                    status = "OK(bf16-accum)"
            if status == "FAIL":
                failures.append(name)
            worst = max(worst, rel_l2)
            print(f"{name:24s} rel_l2 {rel_l2:9.2e}  maxdiff/std {max_over_std:9.2e}  {status}{extra}",
                  flush=True)
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {e}", flush=True)

    print(f"worst {worst:.2e}; failures: {failures or 'none'}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
