"""Output-phase-packed 3x3 convolution — an MXU lane-recovery lowering.

Motivation (measured, benchmarks/ab_fusion_stack.py lane probe, TPU v5e):
a stride-1 3x3 conv's cost on the MXU is ~ HW * K^2 * cin * roundup(cout, 128)
— flat across cout 16..128 — so every FusionStack tail conv (cout in
{1,16,32,64} at 448x576, models/midas_semantics.py) pays for 128 output lanes
and uses a fraction of them.

The rewrite: split the OUTPUT spatially into ph x pw phases and compute all
phases in one strided conv whose out-channel dim carries the phases.

    y[b, ph*i+di, pw*j+dj, c]  ==  y_packed[b, i, j, (di*pw+dj)*C + c]

where ``y_packed = conv(x, K, stride=(ph,pw), pad=1)`` and ``K`` is the 3x3
kernel embedded at offset (di, dj) of a (ph+2) x (pw+2) kernel for each phase
(zero taps contribute exactly 0 — fp32 MXU accumulation, same math). Phase
(di, dj) at packed position (i, j) then reads input rows ph*i+di-1 .. +1,
exactly the direct conv's taps; the union over phases is covered by the
enlarged kernel's footprint with pad 1 on each side.

Why it wins cycles on lane-bound convs (cout <= 128): per-output-position
contraction grows K^2 -> (ph+2)(pw+2) but positions shrink by ph*pw and the
lane padding absorbs the phase concat, so MXU cycles scale by
(ph+2)(pw+2) / (ph*pw*9) * ceil(ph*pw*cout/128)/ceil(cout/128):
  - (2,2) phases, cout<=32:  16/36 = 2.25x fewer cycles
  - (2,1) phases, cout<=64:  12/18 = 1.50x fewer cycles
The only overhead is ONE depth-to-space pass over the output (the input is
read directly by the strided conv — no pack pass).

MEASURED VERDICT (benchmarks/ab_phase_packed_conv.py RESULT, TPU 2026-08-18):
NEGATIVE at the FusionStack tail shapes — 0.67-0.88x on every multi-channel
conv, 1.17x only on the final cout=1 depth conv. The cycle model's premise
fails: direct-conv time is flat across cout 1..64 because these layers sit on
the HBM/dispatch floor, not the MXU-cycle roofline, so the saved lanes buy
nothing and the depth-to-space pass is pure added traffic. NOT integrated
into any model; kept (with tests/test_phase_pack.py) as the documented
negative, alongside the transposed-conv phase decomposition (nn/blocks.py
ConvTranspose note, same family of transform, same fate).

Axon-safety note (CLAUDE.md miscompile class): the depth-to-space uses
channel-RANGE slicing first (the documented safe form), then stack/transpose/
reshape with no subsequent slicing; it is nonetheless reshape-heavy, so any
model-level use must pass benchmarks/tpu_numeric_sweep.py on real TPU before
becoming a default (same gate the merged-entry lowering cleared).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pack_kernel_3x3(k3: jnp.ndarray, phases: Tuple[int, int]) -> jnp.ndarray:
    """Embed a (3,3,cin,C) kernel at every output-phase offset.

    Returns a ((ph+2), (pw+2), cin, ph*pw*C) kernel whose out-channel blocks
    are ordered g = di*pw + dj (row-major phases), matching
    :func:`depth_to_space`'s expectations.
    """
    ph, pw = phases
    parts = []
    for di in range(ph):
        for dj in range(pw):
            parts.append(
                jnp.pad(k3, ((di, ph - 1 - di), (dj, pw - 1 - dj), (0, 0), (0, 0)))
            )
    return jnp.concatenate(parts, axis=-1)


def depth_to_space(y: jnp.ndarray, phases: Tuple[int, int], features: int) -> jnp.ndarray:
    """(B, H/ph, W/pw, ph*pw*C) -> (B, H, W, C), channel block g = di*pw+dj.

    Channel-range slices first (the axon-safe slicing form), then a single
    stack/transpose/reshape interleave.
    """
    ph, pw = phases
    b, h, w, _ = y.shape
    groups = [y[..., g * features:(g + 1) * features] for g in range(ph * pw)]
    z = jnp.stack(groups, axis=3)                      # (B, h, w, G, C)
    z = z.reshape(b, h, w, ph, pw, features)           # split G -> (ph, pw)
    z = z.transpose(0, 1, 3, 2, 4, 5)                  # (B, h, ph, w, pw, C)
    return z.reshape(b, h * ph, w * pw, features)


def phase_packed_conv3x3(
    x: jnp.ndarray,
    k3: jnp.ndarray,
    phases: Tuple[int, int] = (2, 2),
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exactly ``conv2d(x, k3, stride 1, pad 1) [+ bias]`` via phase packing.

    ``x``: (B, H, W, cin) with H % ph == 0 and W % pw == 0;
    ``k3``: (3, 3, cin, C). Same math as the direct conv (zero taps add
    exactly 0); autodiff flows through the kernel construction, so this is a
    drop-in lowering under ``jax.grad``.
    """
    ph, pw = phases
    b, h, w, _ = x.shape
    if h % ph or w % pw:
        raise ValueError(f"input {h}x{w} not divisible by phases {phases}")
    c = k3.shape[-1]
    kk = pack_kernel_3x3(k3, phases)
    y = jax.lax.conv_general_dilated(
        x, kk, (ph, pw), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, ph * pw)
    return depth_to_space(y, phases, c)


def best_phases(cout: int) -> Optional[Tuple[int, int]]:
    """Pick the phase split that minimises MXU cycles for a 3x3 stride-1 conv.

    Cycle model (lane probe, ab_fusion_stack.py): cycles ~ positions *
    K_taps * ceil(total_cout / 128). Returns None when the direct conv is
    already optimal (cout > 64: packing can't beat 9 taps/output once the
    phase concat spills past 128 lanes).
    """
    def cycles(ph: int, pw: int) -> float:
        taps = (ph + 2) * (pw + 2)
        return taps / (ph * pw) * -(-ph * pw * cout // 128)

    best, cost = None, 9.0 * -(-cout // 128)  # direct conv
    for cand in ((2, 2), (2, 1), (1, 2)):
        c = cycles(*cand)
        if c < cost:
            best, cost = cand, c
    return best
