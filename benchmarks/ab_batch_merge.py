"""4-way interleaved A/B: {bs8, bs16} x {merged, unmerged ResidualBlock entry}.

Round-4 investigation of the bs8>bs16 per-image inversion (BENCH_r03/r04 and
a fresh ab_batch_size run agree; round-2's ab_batch_size said the opposite
BEFORE the merged-entry lowering flipped ON). If unmerged bs16 beats merged
bs16 per image while bs8 prefers merged, the merged entry is batch-sensitive
(2x activation footprint -> HBM pressure) and the default needs a batch gate.

Run from the repo root: python benchmarks/ab_batch_merge.py [windows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np



def run_pair(b, repeats, steps=8):
    """Interleaved merged-vs-unmerged at ONE batch size (2 states live —
    4 flagship states at once RESOURCE_EXHAUSTED the chip)."""
    import gc

    from mde_tpu.core import config as config_lib
    from mde_tpu.models.midas_semantics import MidasNetSemantics
    from mde_tpu.train import create_train_state, make_train_step

    size = (448, 576)
    rng = np.random.default_rng(0)
    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    key = jax.random.key(0)
    data = {
        "rgb": jnp.asarray(rng.integers(0, 255, (b, *size, 3)).astype(np.uint8)),
        "depth": jnp.asarray(rng.uniform(0.5, 5.0, (b, *size)).astype(np.float32)),
    }
    setups = {}
    for merged in (True, False):
        cfg = config_lib.defaults()
        cfg.framework.input_size = list(size)
        model = MidasNetSemantics(merge_residual_entry=merged)
        step = make_train_step(model, cfg)
        name = f"bs{b}_{'merged' if merged else 'unmerged'}"
        print(f"compiling {name}...", flush=True)
        state = create_train_state(model, jax.random.key(1), rgb_f, cfg, None)
        for i in range(3):
            state, m = step(state, jax.random.fold_in(key, i), data["rgb"], data["depth"])
        float(jax.device_get(m["loss"]))
        setups[name] = {"step": step, "state": state, "win": []}

    for r in range(repeats):
        for name, su in setups.items():
            st = su["state"]
            t0 = time.perf_counter()
            for i in range(steps):
                st, m = su["step"](st, jax.random.fold_in(key, 100 + r * steps + i),
                                   data["rgb"], data["depth"])
            float(jax.device_get(m["loss"]))
            dt = (time.perf_counter() - t0) / steps
            su["state"] = st
            su["win"].append(dt)
            print(f"window {r} {name:16s} {dt*1e3:8.2f} ms/step  {b/dt:6.2f} img/s", flush=True)

    print(f"RESULT bs{b} (medians):", flush=True)
    out = {}
    for name, su in setups.items():
        dt = float(np.median(su["win"]))
        out[name] = dt
        print(f"  {name:16s} {dt*1e3:8.2f} ms/step  {b/dt:6.2f} img/s  {dt/b*1e3:6.2f} ms/img", flush=True)
    setups.clear()
    gc.collect()
    return out


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r16 = run_pair(16, repeats)
    r8 = run_pair(8, repeats)
    print("\nSUMMARY ms/img:", flush=True)
    for k, v in {**r16, **r8}.items():
        b = 16 if "bs16" in k else 8
        print(f"  {k:16s} {v/b*1e3:6.2f} ms/img", flush=True)


if __name__ == "__main__":
    main()
