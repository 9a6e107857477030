"""HBM footprint of the flagship train step at bs8 vs bs16 (VERDICT r4 #7).

BASELINE.md round-4 explains the measured ~14% per-image bs16 penalty with an
admitted guess: "at bs16 the 448x576x64 bf16 activation sets approach HBM
pressure where XLA's scheduling/remat choices differ". One memory-stats
capture each way converts the hypothesis into a fact or kills it: this runs
ONE compiled step per batch size in the same process and records
peak_bytes_in_use / bytes_limit around it (plus the per-step time, so the
session's perf context is attached to the memory fact).

Run: JAX_PLATFORMS=axon python benchmarks/ab_hbm_bs8_bs16.py

RESULT (2026-08-21, v5e via axon; runtime memory_stats not exposed by the
axon plugin — all None — so the fact comes from XLA's compile-time buffer
assignment via compiled.memory_analysis(), which is the authoritative number
for "how big is the live set"):
  bs 8: temp 12.69 GiB (args 0.38, out 0.36)   175.35 ms/step  45.6 img/s
  bs16: temp 14.49 GiB (args 0.39, out 0.36)   405.22 ms/step  39.5 img/s
Reading: the HBM-pressure hypothesis is CONFIRMED. bs8 already uses ~79% of
the 16 GiB HBM for temporaries; doubling the batch naively would need 25.4
GiB, and XLA instead compresses the bs16 live set to 14.49 GiB (43% below
2x) by rematerializing/rescheduling — the extra recompute+traffic is the
measured ~14% per-image penalty. best_batch=8 is not an artifact; it is the
largest batch whose activation set fits HBM without scheduler contortions.
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
        # Compile-time memory analysis of the exact step executable: the axon
        # plugin exposes no runtime memory_stats (first run, 2026-08-21 — all
        # None), but XLA's own buffer-assignment totals answer the question
        # the hypothesis asks: how big is the live activation/temp set.
        try:
            ma = step.lower(state, key, rgb, depth).compile().memory_analysis()
            gib = lambda x: (x or 0) / 2**30
            print(
                f"bs{batch:2d} memory_analysis: temp {gib(ma.temp_size_in_bytes):.2f} GiB  "
                f"args {gib(ma.argument_size_in_bytes):.2f}  "
                f"out {gib(ma.output_size_in_bytes):.2f}  "
                f"alias {gib(ma.alias_size_in_bytes):.2f}",
                flush=True,
            )
        except Exception as e:
            print(f"bs{batch:2d} memory_analysis unavailable: {type(e).__name__}: {e}",
                  flush=True)
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
