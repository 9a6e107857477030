"""Shared same-process A/B timing helper for the benchmark scripts.

One copy of the warmup / median-of-windows / forced-host-round-trip loop so a
fix to the sync pattern lands everywhere at once. The final ``device_get`` of
a value data-dependent on the last call is the load-bearing part: the axon
runtime has under-reported completion to ``block_until_ready``-style timing
before (CLAUDE.md), so every window is bounded by a real host round-trip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, warmup=3, steps=10, repeats=3, width=58):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    meds = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        meds.append((time.perf_counter() - t0) / steps)
    sec = float(np.median(meds))
    print(f"{name:{width}s} {sec * 1e3:8.3f} ms", flush=True)
    return sec
