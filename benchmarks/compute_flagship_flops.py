"""Precompute the flagship train step's analytic FLOPs (XLA cost analysis on
the CPU lowering) into benchmarks/flagship_flops.json.

bench.py's roofline fields (achieved_tflops, pct_of_conv_anchor) need
FLOPs/step; it first asks the live backend's ``lowered.cost_analysis()``, but
the axon PJRT plugin routes compilation through a remote helper and its cost
analysis is not guaranteed available. The textbook FLOP count of the lowered
program is platform-independent for this model (same HLO math), so a cached
CPU-side number keeps the roofline anchor alive when the live query fails.

Run from repo root (forces CPU before first backend use — the JAX_PLATFORMS
env var is ignored under the axon plugin, CLAUDE.md):

    python benchmarks/compute_flagship_flops.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.train import create_train_state, make_train_step

    size = (448, 576)
    batch = 2  # FLOPs scale linearly in batch; trace small for speed
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    model = build_model(cfg.model)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), cfg)
    step = make_train_step(model, cfg)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (batch, *size, 3)).astype(np.uint8)
    depth = rng.uniform(0.5, 9.5, (batch, *size)).astype(np.float32)

    lowered = step.lower(state, jax.random.key(1), rgb, depth)
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca["flops"])
    out = {
        "flops_per_image": flops / batch,
        "size": list(size),
        "batch_traced": batch,
        "method": "XLA cost_analysis of the lowered (pre-fusion) train step, CPU backend",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "flagship_flops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
