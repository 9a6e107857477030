"""HBM footprint of the flagship train step at bs8 vs bs16 (VERDICT r4 #7).

BASELINE.md round-4 explains the measured ~14% per-image bs16 penalty with an
admitted guess: "at bs16 the 448x576x64 bf16 activation sets approach HBM
pressure where XLA's scheduling/remat choices differ". One memory-stats
capture each way converts the hypothesis into a fact or kills it: this runs
ONE compiled step per batch size in the same process and records
peak_bytes_in_use / bytes_limit around it (plus the per-step time, so the
session's perf context is attached to the memory fact).

Run: JAX_PLATFORMS=axon python benchmarks/ab_hbm_bs8_bs16.py
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

SIZE = (448, 576)


def stats():
    from mde_tpu.train.profiling import device_memory_stats

    s = (device_memory_stats() or [{}])[0]
    return s


def main():
    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.train import create_train_state, make_train_step

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    key = jax.random.key(1)

    for batch in (8, 16):
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, None
        )
        step = make_train_step(model, cfg)
        rgb = jnp.asarray(rng.integers(0, 255, (batch, *SIZE, 3)).astype(np.uint8))
        depth = jnp.asarray(rng.uniform(0.5, 9.5, (batch, *SIZE)).astype(np.float32))
        for i in range(3):
            state, m = step(state, jax.random.fold_in(key, i), rgb, depth)
        float(jax.device_get(m["loss"]))
        s0 = stats()
        t0 = time.perf_counter()
        for i in range(10):
            state, m = step(state, jax.random.fold_in(key, 100 + i), rgb, depth)
        float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / 10
        s1 = stats()
        peak = s1.get("peak_bytes_in_use")
        limit = s1.get("bytes_limit")
        print(
            f"bs{batch:2d}: {dt*1e3:8.2f} ms/step ({batch/dt:.1f} img/s)  "
            f"in_use={s1.get('bytes_in_use')}  peak={peak}  limit={limit}  "
            f"peak_pct={100*peak/limit:.1f}%" if peak and limit else
            f"bs{batch:2d}: {dt*1e3:8.2f} ms/step — memory_stats not exposed: {s1}",
            flush=True,
        )
        del state, step, rgb, depth


if __name__ == "__main__":
    main()
