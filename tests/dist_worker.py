"""Subprocess worker for tests/test_distributed.py.

Runs one process of a 2-process x 2-CPU-device JAX distributed job (Gloo
collectives) — the CPU-testable stand-in for multi-host TPU training over DCN.
Launched with XLA_FLAGS=--xla_force_host_platform_device_count=2 so the global
mesh has 4 devices across the two processes.

Modes:
  steps  — 3 deterministic train steps of SimpleUNet on a (data=4,) mesh from
           process-local row blocks of a fixed global batch; writes per-step
           losses and a params checksum. The launcher compares against the
           identical single-process 4-device run.
  fit    — a 2-epoch fit() over a shared synthetic dataset with
           HostLoader(process_shard=...), then test-prediction generation;
           writes the fit history (and, on process 0, the checkpoint path).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZE = (32, 48)


def build_cfg():
    from mde_tpu.core import config as config_lib

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    cfg.model.model_type = "U_Net"
    cfg.model.dinov2_type = None
    cfg.experiment.model_name = "dist_unet"
    return cfg


def run_steps(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mde_tpu.models import SimpleUNet
    from mde_tpu.parallel import make_mesh, shard_batch
    from mde_tpu.parallel.distributed import local_row_block
    from mde_tpu.train import create_train_state, make_train_step

    cfg = build_cfg()
    model = SimpleUNet()
    mesh = make_mesh(data=4, model=1)

    rng = np.random.default_rng(0)
    global_batch = {
        "rgb": rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32),
    }
    lo, hi = local_row_block(8)
    local = {k: v[lo:hi] for k, v in global_batch.items()}

    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, mesh
    )
    step = make_train_step(model, cfg)
    losses = []
    for i in range(3):
        data = shard_batch(dict(local), mesh)
        state, metrics = step(state, jax.random.key(100 + i), data["rgb"], data["depth"])
        losses.append(float(jax.device_get(metrics["loss"])))
    # jit (not eager) so the reduction over global arrays is the supported
    # multi-process path; output is replicated -> device_get works everywhere.
    abs_sum = jax.jit(
        lambda tree: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(tree))
    )
    param_sum = float(jax.device_get(abs_sum(state.params)))
    return {"losses": losses, "param_sum": param_sum,
            "n_devices": jax.device_count(), "process": jax.process_index()}


def run_tp(args):
    """One flagship train step on a (data=2, model=2) mesh spanning the two
    processes: Megatron TP shardings built cross-process (shard_params_tp's
    make_array_from_callback path) + GSPMD collectives over Gloo."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from mde_tpu.core import config as config_lib
    from mde_tpu.models import MidasNetSemantics
    from mde_tpu.parallel import make_mesh, shard_batch
    from mde_tpu.parallel.distributed import local_row_block
    from mde_tpu.train import create_train_state, make_train_step

    h, w = 64, 96
    cfg = config_lib.defaults()
    cfg.framework.input_size = [h, w]
    cfg.framework.native_size = [h, w]
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    mesh = make_mesh(data=2, model=2)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32), cfg, mesh
    )
    qkv = state.params["dinov2"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model"), qkv.sharding
    proj = state.params["dinov2"]["blocks_0"]["attn"]["proj"]["kernel"]
    assert proj.sharding.spec == P("model", None), proj.sharding

    rng = np.random.default_rng(0)
    global_batch = {
        "rgb": rng.integers(0, 255, (4, h, w, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (4, h, w)).astype(np.float32),
    }
    lo, hi = local_row_block(4)
    local = {k: v[lo:hi] for k, v in global_batch.items()}
    step = make_train_step(model, cfg)
    data = shard_batch(local, mesh)
    state, metrics = step(state, jax.random.key(1), data["rgb"], data["depth"])
    return {
        "loss": float(jax.device_get(metrics["loss"])),
        "process": jax.process_index(),
    }


def run_fit(args):
    import jax
    import jax.numpy as jnp

    from mde_tpu.data.dataset import DepthDataset
    from mde_tpu.data.loader import HostLoader
    from mde_tpu.models import SimpleUNet
    from mde_tpu.parallel import make_mesh
    from mde_tpu.train import create_train_state
    from mde_tpu.train.trainer import fit, generate_test_predictions

    cfg = build_cfg()
    cfg.training.n_epoch = 2
    model = SimpleUNet()
    mesh = make_mesh(data=4, model=1)
    shard = (jax.process_index(), jax.process_count())

    data_dir = args.data_dir
    train_ds = DepthDataset(
        os.path.join(data_dir, "train"), os.path.join(data_dir, "train_list.txt")
    )
    test_ds = DepthDataset(
        os.path.join(data_dir, "test"), os.path.join(data_dir, "test_list.txt"),
        has_gt=False,
    )
    train_loader = HostLoader(
        train_ds, indices=range(12), batch_size=4, shuffle=True, seed=3,
        num_workers=2, process_shard=shard,
    )
    val_loader = HostLoader(
        train_ds, indices=range(12, 16), batch_size=4, num_workers=2,
        process_shard=shard,
    )
    test_loader = HostLoader(test_ds, batch_size=4, num_workers=2, process_shard=shard)

    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, mesh
    )
    results_dir = os.path.join(data_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    state, history = fit(
        model, cfg, state, train_loader, val_loader, results_dir, mesh=mesh
    )
    predictions_dir = os.path.join(data_dir, "predictions")
    generate_test_predictions(model, cfg, state, test_loader, predictions_dir, mesh=mesh)
    from mde_tpu.parallel import distributed as dist

    dist.barrier("predictions_done")  # both processes' files visible below
    ckpt = os.path.join(results_dir, "best_model_dist_unet.pth")
    return {
        "history": history,
        "ckpt_exists": os.path.exists(ckpt),
        "process": jax.process_index(),
        "predictions": sorted(os.listdir(predictions_dir)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default="steps", choices=["steps", "fit", "tp"])
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()

    from mde_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        platform="cpu",
    )
    import jax

    assert jax.process_count() == args.num_processes

    runners = {"steps": run_steps, "fit": run_fit, "tp": run_tp}
    result = runners[args.mode](args)
    with open(f"{args.out}.p{args.process_id}.json", "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
