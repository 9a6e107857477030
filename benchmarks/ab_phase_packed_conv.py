"""A/B: output-phase-packed 3x3 conv vs direct, at the FusionStack tail shapes.

Follow-up to ab_fusion_stack.py's lane probe (RESULT 1: 3x3 conv time is flat
across cout 16..128 — small-cout convs pay for all 128 MXU lanes). The
phase-packed lowering (mde_tpu/ops/phase_pack.py) computes ph x pw output
phases in ONE strided conv whose out-channel dim carries the phases, then
depth-to-space restores the layout. Cycle model predicts:

  cout<=32, (2,2) phases: 2.25x fewer MXU cycles
  cout<=64, (2,1) phases: 1.50x fewer MXU cycles

against ONE extra HBM pass (the depth-to-space) per conv. The transposed-conv
analog of this transform LOST its A/B (nn/blocks.py ConvTranspose note)
because there was no cycle saving to pay for the interleave; here there is —
this measurement decides whether it survives end to end, fwd and grad.

Shapes = the flagship FusionStack tail convs at 448x576 bs8 bf16
(models/midas_semantics.py fusion_blocks_0 .. depth_head_1, post merge_entry):

  fb0.conv2 / fh0 entry   cin=64  cout=64   phases (2,1)
  fh0.conv2 / fh1         cin=32  cout=32   phases (2,2)
  dh0 merged entry        cin=32  cout=48   phases (2,1)
  dh0.conv2               cin=16  cout=16   phases (2,2)
  dh1                     cin=16  cout=1    phases (2,2)

Run from repo root: python benchmarks/ab_phase_packed_conv.py [batch]

RESULT (TPU v5e via axon, bs8 448x576 bf16, 2026-08-18): NEGATIVE — the
cycle model is wrong about what these convs are bound by. Packed loses on
every multi-channel tail shape, fwd AND grad:

  fb0.conv2/fh0-entry (64->64, (2,1))  0.76x fwd / 0.87x grad
  fh0.conv2/fh1       (32->32, (2,2))  0.67x / 0.80x
  dh0 merged entry    (32->48, (2,1))  0.82x / 0.72x
  dh0.conv2           (16->16, (2,2))  0.72x / 0.88x
  dh1 depth out       (16->1,  (2,2))  1.17x / 1.04x   (the one marginal win)

Diagnosis: direct-conv time is FLAT (~6.3-6.9 ms) across all five shapes —
including cout=1 — i.e. these layers are HBM/dispatch-bound, not MXU-cycle
bound at bs8 448x576, so saving MXU cycles buys nothing while the
depth-to-space adds a full extra HBM pass over the output. (The lane probe's
flat-cost-vs-cout observation was real, but the flatness comes from the
memory floor, not from lane padding.) The dh1 1.17x is a single conv worth
<2% of the tail and fails the repo's keep-it-simple bar for a special-case
lowering that would also need its own axon numeric-sweep gate. Not integrated;
op + CPU-golden tests kept as documentation (tests/test_phase_pack.py),
consistent with the Winograd and transposed-conv-phase negatives.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit
from mde_tpu.ops.phase_pack import best_phases, phase_packed_conv3x3

H, W = 448, 576

SHAPES = [
    ("fb0.conv2/fh0-entry", 64, 64),
    ("fh0.conv2/fh1      ", 32, 32),
    ("dh0 merged entry   ", 32, 48),
    ("dh0.conv2          ", 16, 16),
    ("dh1 depth out      ", 16, 1),
]


def direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def run(b: int) -> None:
    print(f"phase-packed conv A/B @ {H}x{W} bs{b} bf16 on {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    wins = []
    for name, cin, cout in SHAPES:
        phases = best_phases(cout)
        assert phases is not None, (name, cout)
        x = jnp.asarray(rng.standard_normal((b, H, W, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)

        f_d = jax.jit(direct)
        f_p = jax.jit(lambda x, k, ph=phases: phase_packed_conv3x3(x, k, ph))

        a = np.float32(jax.device_get(f_d(x, k)))
        c = np.float32(jax.device_get(f_p(x, k)))
        rel = np.linalg.norm(a - c) / (np.linalg.norm(a) + 1e-9)
        assert rel < 2e-2, (name, rel)

        print(f"\n== {name} cin={cin} cout={cout} phases={phases} "
              f"(numerics rel-L2 {rel:.1e}) ==")
        t_d = timeit("  direct fwd", f_d, x, k)
        t_p = timeit("  packed fwd", f_p, x, k)
        print(f"    -> packed fwd speedup {t_d / t_p:4.2f}x")

        g_d = jax.jit(jax.grad(
            lambda xx, kk: jnp.sum(jnp.float32(direct(xx, kk)) ** 2), (0, 1)))
        g_p = jax.jit(jax.grad(
            lambda xx, kk, ph=phases:
            jnp.sum(jnp.float32(phase_packed_conv3x3(xx, kk, ph)) ** 2), (0, 1)))
        gd = jax.device_get(g_d(x, k))
        gp = jax.device_get(g_p(x, k))
        grel = max(
            np.linalg.norm(np.float32(a1) - np.float32(b1))
            / (np.linalg.norm(np.float32(a1)) + 1e-9)
            for a1, b1 in zip(gd, gp)
        )
        assert grel < 5e-2, (name, grel)
        t_gd = timeit("  direct grad", g_d, x, k)
        t_gp = timeit("  packed grad", g_p, x, k)
        print(f"    -> packed grad speedup {t_gd / t_gp:4.2f}x  "
              f"(grad numerics rel-L2 {grel:.1e})")
        wins.append((name, t_d / t_p, t_gd / t_gp))

    print("\nsummary (fwd / grad speedups):")
    for name, fw, gw in wins:
        print(f"  {name}  {fw:4.2f}x / {gw:4.2f}x")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
