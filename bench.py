"""Benchmark: flagship train-step throughput on the available accelerator.

Measures images/sec of the full jitted training step (on-device preprocessing +
forward + SI loss + backward + AdamW) for the flagship MidasNetSemantics config
(448x576, the reference's config.yaml headline), sweeping batch sizes and
reporting the best. ``vs_baseline`` compares against the reference-stack torch
CPU measurement stored in benchmarks/baseline_cpu.json (see
benchmarks/torch_cpu_baseline.py — architecture-equivalent flagship on the
reference's own framework; its training recipe used batch 4 on one device,
src/main.py:26-31).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def measure_many(batches, size=(448, 576), warmup=3, steps=10, repeats=3):
    """Per-batch train throughput with INTERLEAVED timed windows.

    The axon tunnel's throughput drifts within a session, so sequential
    per-batch sweeps confound drift with batch-size effects (r1's "bs16 <=
    bs4" inversion; disproven by benchmarks/ab_batch_size.py — interleaved,
    bs16 is ~1.3x better per image). All programs are compiled first, then
    windows run round-robin so every batch sees the same drift; medians are
    comparable. Returns {batch: (img_per_sec, sec_per_step) | None}.
    """
    import jax
    import jax.numpy as jnp

    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, shard_batch
    from mde_tpu.train import create_train_state, make_train_step

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    model = build_model(cfg.model)
    n_dev = len(jax.devices())
    step = make_train_step(model, cfg)
    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    key = jax.random.key(1)
    rng = np.random.default_rng(0)

    setups, results = {}, {}
    for batch in batches:
        mesh = make_mesh(data=n_dev, model=1) if (n_dev > 1 and batch % n_dev == 0) else None
        try:
            state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
            batch_np = {
                "rgb": rng.integers(0, 255, (batch, *size, 3)).astype(np.uint8),
                "depth": rng.uniform(0.5, 9.5, (batch, *size)).astype(np.float32),
            }
            data = shard_batch(batch_np, mesh)
            for i in range(warmup):
                state, metrics = step(
                    state, jax.random.fold_in(key, i), data["rgb"], data["depth"]
                )
            float(jax.device_get(metrics["loss"]))
            setups[batch] = {"state": state, "data": data, "windows": []}
        except Exception as e:  # compile failure / OOM
            results[batch] = None
            print(f"# batch {batch} failed: {type(e).__name__}", flush=True)

    # NOTE on residency: all candidate states (params + Adam moments) and
    # batches coexist in HBM during the interleaved run — ~3x one state's
    # footprint, well within this chip for the flagship. A mid-loop failure
    # (OOM etc.) drops that batch's remaining windows but keeps the others.
    for r in range(repeats):
        for batch, su in setups.items():
            if su.get("dead"):
                continue
            state, data = su["state"], su["data"]
            try:
                t0 = time.perf_counter()
                for i in range(steps):
                    state, metrics = step(
                        state, jax.random.fold_in(key, 100 + r * steps + i),
                        data["rgb"], data["depth"],
                    )
                # device_get of the loss: a host round-trip of a value dependent
                # on every step in the chain — robust against async runtimes
                # under-reporting completion.
                float(jax.device_get(metrics["loss"]))
                su["windows"].append((time.perf_counter() - t0) / steps)
                su["state"] = state
            except Exception as e:
                su["dead"] = True
                print(f"# batch {batch} window failed: {type(e).__name__}", flush=True)

    for batch, su in setups.items():
        if su["windows"]:
            dt = float(np.median(su["windows"]))
            results[batch] = (batch / dt, dt)
        else:
            results[batch] = None
    return results


def measure(batch: int, size=(448, 576), warmup=3, steps=10, repeats=3):
    import jax
    import jax.numpy as jnp

    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.parallel import make_mesh, shard_batch
    from mde_tpu.train import create_train_state, make_train_step

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    model = build_model(cfg.model)

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1) if (n_dev > 1 and batch % n_dev == 0) else None

    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
    step = make_train_step(model, cfg)

    rng = np.random.default_rng(0)
    batch_np = {
        "rgb": rng.integers(0, 255, (batch, *size, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 9.5, (batch, *size)).astype(np.float32),
    }
    data = shard_batch(batch_np, mesh)
    key = jax.random.key(1)

    # Median of ``repeats`` timed windows of ``steps`` steps each: the axon
    # tunnel's throughput drifts within a session, and a single window is a
    # coin flip (VERDICT r1). Each window syncs via device_get of the loss — a
    # value data-dependent on every step in the chain — which is robust
    # against async runtimes under-reporting completion.
    for i in range(warmup):
        state, metrics = step(state, jax.random.fold_in(key, i), data["rgb"], data["depth"])
    float(jax.device_get(metrics["loss"]))
    windows = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(
                state, jax.random.fold_in(key, 100 + r * steps + i), data["rgb"], data["depth"]
            )
        float(jax.device_get(metrics["loss"]))
        windows.append((time.perf_counter() - t0) / steps)
    dt = float(np.median(windows))
    return batch / dt, dt


def measure_infer(batch: int, size=(448, 576), warmup=3, steps=20, repeats=3):
    """Forward-only (predict-path) throughput: preprocess + forward + resize to
    the native 426x560 submission size, as generate_test_predictions runs it."""
    import jax
    import jax.numpy as jnp

    from mde_tpu.core import config as config_lib
    from mde_tpu.models import build_model
    from mde_tpu.train import create_train_state, make_predict_step

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    model = build_model(cfg.model)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), cfg)
    step = make_predict_step(model, cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.integers(0, 255, (batch, *size, 3)).astype(np.uint8))
    for _ in range(warmup):
        out = step(state, rgb)
    _ = np.asarray(jax.device_get(out[0, 0, 0]))
    windows = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = step(state, rgb)
        # steps are independent but execute serially on the device; the final
        # device_get bounds the whole window.
        _ = np.asarray(jax.device_get(out[0, 0, 0]))
        windows.append((time.perf_counter() - t0) / steps)
    return batch / float(np.median(windows))


def main():
    import jax

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())
    # bs32 consistently fails in the remote tpu_compile_helper (HTTP 500 —
    # tunnel-side compiler limit, not device OOM); don't burn 4 min on it.
    candidates = [16, 8, 4] if platform != "cpu" else [4]
    results = measure_many(candidates)

    ok = {b: r for b, r in results.items() if r}
    if not ok:
        print(json.dumps({"metric": "train_images_per_sec_flagship", "value": 0.0,
                          "unit": "images/sec", "vs_baseline": None, "error": "all batches failed"}))
        return
    best_b = max(ok, key=lambda b: ok[b][0])
    best_ips = ok[best_b][0]

    try:
        infer_ips = measure_infer(best_b)
    except Exception as e:
        print(f"# infer bench failed: {type(e).__name__}", flush=True)
        infer_ips = None

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_cpu.json")
    vs = None
    baseline_ips = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline_ips = json.load(f).get("train_images_per_sec")
        if baseline_ips:
            vs = best_ips / baseline_ips

    record = {
        "metric": "train_images_per_sec_flagship",
        "value": round(best_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2) if vs else None,
        "platform": platform,
        "n_devices": n_dev,
        "best_batch": best_b,
        "sec_per_step": round(ok[best_b][1], 4),
        "per_batch": {str(b): (round(r[0], 3) if r else None) for b, r in results.items()},
        "infer_images_per_sec": round(infer_ips, 3) if infer_ips else None,
        "baseline_cpu_images_per_sec": baseline_ips,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
