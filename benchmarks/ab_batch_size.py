"""Interleaved batch-size A/B of the flagship train step.

bench.py sweeps batches sequentially, so session-scale drift (tunnel weather,
compile-helper slowdown) can masquerade as a batch-size effect — r1's verdict
flagged "bs16 <= bs4" as a red flag. This script compiles the bs8 and bs16
step programs once, then runs ALTERNATING timed windows (8,16,8,16,...) so both
batches see the same drift; per-image medians are then directly comparable.

Run from the repo root: python benchmarks/ab_batch_size.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, shard_batch
    from mde_tpu.train import create_train_state, make_train_step

    import jax.numpy as jnp

    size = (448, 576)
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    mesh = None
    model = build_model(cfg.model)
    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    step = make_train_step(model, cfg)
    key = jax.random.key(0)

    rng = np.random.default_rng(0)
    setups = {}
    for b in (8, 16):
        batch = {
            "rgb": rng.integers(0, 255, (b, *size, 3)).astype(np.uint8),
            "depth": rng.uniform(0.5, 5.0, (b, *size)).astype(np.float32),
        }
        state = create_train_state(model, jax.random.key(1), rgb_f, cfg, mesh)
        data = shard_batch(batch, mesh)
        setups[b] = [state, data]
        print(f"compiling bs{b}...", flush=True)
        for i in range(3):  # compile + warm
            state, m = step(state, jax.random.fold_in(key, i), data["rgb"], data["depth"])
        float(jax.device_get(m["loss"]))
        setups[b][0] = state

    windows = {8: [], 16: []}
    steps_per_window = 8
    for r in range(6):  # 3 windows each, interleaved
        b = 8 if r % 2 == 0 else 16
        state, data = setups[b]
        t0 = time.perf_counter()
        for i in range(steps_per_window):
            state, m = step(
                state, jax.random.fold_in(key, 100 + r * 50 + i), data["rgb"], data["depth"]
            )
        float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / steps_per_window
        setups[b][0] = state
        windows[b].append(dt)
        print(f"window {r}: bs{b} {dt * 1e3:8.2f} ms/step  {b / dt:7.2f} img/s", flush=True)

    for b in (8, 16):
        med = float(np.median(windows[b]))
        print(f"bs{b}: median {med * 1e3:.2f} ms/step -> {b / med:.2f} img/s "
              f"({med / b * 1e3:.2f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
