"""Multi-process (multi-host) training: 2 JAX processes x 2 CPU devices each,
coordinated via jax.distributed + Gloo collectives — the CPU-testable stand-in
for multi-host TPU pods over DCN (beyond-reference capability; the reference
is strictly single-process, SURVEY.md §2.6/§5.8).

The launcher spawns tests/dist_worker.py twice and checks:
  - the distributed 3-step run computes the SAME losses and parameters as the
    identical single-process run over a 4-device mesh (this process's first 4
    virtual devices);
  - both processes see identical replicated metrics;
  - a full fit() + prediction dump works process-sharded: one checkpoint
    (written by process 0 only), identical histories, and the prediction files
    partitioned across processes covering the full test set.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import SimpleUNet
from mde_tpu.parallel import make_mesh, shard_batch
from mde_tpu.train import create_train_state, make_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")
SIZE = (32, 48)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(mode: str, tmp_path, data_dir=None) -> list[dict]:
    port = _free_port()
    out = os.path.join(str(tmp_path), f"{mode}_result")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, WORKER,
            "--process-id", str(pid), "--num-processes", "2",
            "--coordinator", f"localhost:{port}",
            "--out", out, "--mode", mode,
        ]
        if data_dir:
            cmd += ["--data-dir", str(data_dir)]
        log = open(os.path.join(str(tmp_path), f"{mode}_p{pid}.log"), "w")
        procs.append(
            (subprocess.Popen(cmd, env=env, cwd=REPO, stdout=log, stderr=log), log)
        )
    results = []
    try:
        for pid, (p, log) in enumerate(procs):
            rc = p.wait(timeout=900)
            log.close()
            if rc != 0:
                with open(os.path.join(str(tmp_path), f"{mode}_p{pid}.log")) as f:
                    pytest.fail(f"worker {pid} rc={rc}:\n{f.read()[-4000:]}")
            with open(f"{out}.p{pid}.json") as f:
                results.append(json.load(f))
    finally:
        for p, log in procs:
            if p.poll() is None:
                p.kill()
    return results


def _single_process_reference():
    """The worker's 'steps' run on this process's own 4-device mesh."""
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    model = SimpleUNet()
    mesh = make_mesh(data=4, model=1)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32),
    }
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, mesh
    )
    step = make_train_step(model, cfg)
    losses = []
    for i in range(3):
        data = shard_batch(dict(batch), mesh)
        state, metrics = step(state, jax.random.key(100 + i), data["rgb"], data["depth"])
        losses.append(float(jax.device_get(metrics["loss"])))
    abs_sum = jax.jit(
        lambda tree: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(tree))
    )
    param_sum = float(jax.device_get(abs_sum(state.params)))
    return losses, param_sum


def test_two_process_steps_match_single_process(tmp_path):
    results = _launch("steps", tmp_path)
    assert [r["n_devices"] for r in results] == [4, 4]
    assert sorted(r["process"] for r in results) == [0, 1]
    # both processes observed identical replicated metrics
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=0)
    np.testing.assert_allclose(
        results[0]["param_sum"], results[1]["param_sum"], rtol=0
    )
    ref_losses, ref_param_sum = _single_process_reference()
    # Gloo's cross-process gradient all-reduce sums in a different order than
    # the single-process XLA reduction; observed loss deltas are ~1e-5
    # relative by step 3 (same class of ulp drift test_multichip tolerates
    # between 1- and 8-device reductions).
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-4)
    np.testing.assert_allclose(results[0]["param_sum"], ref_param_sum, rtol=1e-4)


def test_two_process_fit_end_to_end(tmp_path):
    from mde_tpu.data.synthetic import generate

    # n_test=5: one dividing batch of 4 (row blocks across processes) plus a
    # 1-row remainder that exercises the replicated-batch path end to end.
    generate(str(tmp_path / "data"), n_train=16, n_test=5, size=SIZE)
    results = _launch("fit", tmp_path, data_dir=tmp_path / "data")
    # identical histories on both processes (replicated reductions)
    np.testing.assert_allclose(
        results[0]["history"]["train_loss"], results[1]["history"]["train_loss"]
    )
    np.testing.assert_allclose(
        results[0]["history"]["val_loss"], results[1]["history"]["val_loss"]
    )
    assert len(results[0]["history"]["train_loss"]) == 2
    assert all(r["ckpt_exists"] for r in results)
    # prediction files cover the full test set (each process wrote its block;
    # the 1-row replicated remainder was written once, by process 0)
    assert results[0]["predictions"] == results[1]["predictions"] == [
        f"test_{i:06d}_depth.npy" for i in range(5)
    ]


def test_two_process_tp_step_matches_single_process(tmp_path, rng):
    """dp×tp spanning processes: a (data=2, model=2) flagship step across 2
    processes (TP shardings via make_array_from_callback, GSPMD collectives
    over Gloo) matches the identical single-process (2,2) mesh step."""
    import jax.numpy as jnp

    from mde_tpu.models import MidasNetSemantics

    results = _launch("tp", tmp_path)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=0)

    h, w = 64, 96
    cfg = config_lib.defaults()
    cfg.framework.input_size = [h, w]
    cfg.framework.native_size = [h, w]
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    mesh = make_mesh(data=2, model=2)  # first 4 of this process's 8 devices
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32), cfg, mesh
    )
    batch_rng = np.random.default_rng(0)
    batch = {
        "rgb": batch_rng.integers(0, 255, (4, h, w, 3)).astype(np.uint8),
        "depth": batch_rng.uniform(0.5, 5.0, (4, h, w)).astype(np.float32),
    }
    step = make_train_step(model, cfg)
    data = shard_batch(batch, mesh)
    _, metrics = step(state, jax.random.key(1), data["rgb"], data["depth"])
    ref_loss = float(jax.device_get(metrics["loss"]))
    np.testing.assert_allclose(results[0]["loss"], ref_loss, rtol=1e-4)


def test_two_process_main_tool(tmp_path):
    """The full training CLI under MDE_DIST_* env: both processes run
    python -m mde_tpu.tools.main; process 0 writes the checkpoint and the
    union of per-process prediction files covers the whole test set."""
    from mde_tpu.data.synthetic import generate

    data = tmp_path / "data"
    generate(str(data), n_train=16, n_test=5, size=SIZE)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        f"""
paths:
  data_dir: {data}
  results_dir: {tmp_path}/results
  predictions_dir: {tmp_path}/predictions
experiment:
  model_name: dist_cli_unet
  wandb_disable: True
training:
  n_epoch: 1
  batch_size: 4
model:
  model_type: U_Net
  dinov2_type: null
framework:
  input_size: [{SIZE[0]}, {SIZE[1]}]
  native_size: [{SIZE[0]}, {SIZE[1]}]
  num_workers: 1
  mesh: {{data: -1, model: 1}}
"""
    )
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "JAX_PLATFORMS")
        }
        env.update(
            JAX_PLATFORM_NAME="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            MDE_DIST_COORDINATOR=f"localhost:{port}",
            MDE_DIST_NUM_PROCESSES="2",
            MDE_DIST_PROCESS_ID=str(pid),
            MDE_DIST_CPU="1",
        )
        log = open(os.path.join(str(tmp_path), f"cli_p{pid}.log"), "w")
        procs.append(
            (subprocess.Popen(
                [sys.executable, "-m", "mde_tpu.tools.main",
                 "--config", str(cfg_path), "--data-dir", str(data)],
                env=env, cwd=REPO, stdout=log, stderr=log,
            ), log)
        )
    for pid, (p, log) in enumerate(procs):
        rc = p.wait(timeout=900)
        log.close()
        if rc != 0:
            with open(os.path.join(str(tmp_path), f"cli_p{pid}.log")) as f:
                pytest.fail(f"tools.main process {pid} rc={rc}:\n{f.read()[-4000:]}")
    assert os.path.exists(tmp_path / "results" / "best_model_dist_cli_unet.pth")
    preds = sorted(os.listdir(tmp_path / "predictions"))
    assert preds == [f"test_{i:06d}_depth.npy" for i in range(5)]


def test_local_row_block_contract():
    from mde_tpu.parallel.distributed import local_row_block

    # single-process semantics: the full batch
    assert local_row_block(8) == (0, 8)
    # explicit layout math: contiguous per-process blocks in process order
    assert local_row_block(8, process=0, count=2) == (0, 4)
    assert local_row_block(8, process=1, count=2) == (4, 8)
    with pytest.raises(ValueError, match="does not split"):
        local_row_block(7, process=0, count=2)


def test_host_loader_process_shard_partitions_batches():
    """The two process shards of a loader partition each global batch in order."""
    from mde_tpu.data.synthetic import generate
    import tempfile

    from mde_tpu.data.dataset import DepthDataset
    from mde_tpu.data.loader import HostLoader

    with tempfile.TemporaryDirectory() as root:
        train_list, _ = generate(root, n_train=8, n_test=1, size=(16, 24))
        ds = DepthDataset(os.path.join(root, "train"), train_list)
        full = HostLoader(ds, batch_size=4, shuffle=True, seed=5, num_workers=1)
        p0 = HostLoader(ds, batch_size=4, shuffle=True, seed=5, num_workers=1,
                        process_shard=(0, 2))
        p1 = HostLoader(ds, batch_size=4, shuffle=True, seed=5, num_workers=1,
                        process_shard=(1, 2))
        for bf, b0, b1 in zip(full, p0, p1):
            np.testing.assert_array_equal(
                bf["rgb"], np.concatenate([b0["rgb"], b1["rgb"]])
            )
            np.testing.assert_array_equal(
                bf["depth"], np.concatenate([b0["depth"], b1["depth"]])
            )
            assert bf["names"] == b0["names"] + b1["names"]


def test_host_loader_process_shard_replicates_nondividing_remainder():
    """A remainder batch that can't split over processes is yielded in full on
    every process and tagged _replicated (the 649 % batch_size test-set case)."""
    from mde_tpu.data.synthetic import generate
    import tempfile

    from mde_tpu.data.dataset import DepthDataset
    from mde_tpu.data.loader import HostLoader

    with tempfile.TemporaryDirectory() as root:
        train_list, _ = generate(root, n_train=7, n_test=1, size=(16, 24))
        ds = DepthDataset(os.path.join(root, "train"), train_list)
        batches = {
            p: list(HostLoader(ds, batch_size=4, num_workers=1, process_shard=(p, 2)))
            for p in range(2)
        }
        for p in range(2):
            assert [b["rgb"].shape[0] for b in batches[p]] == [2, 3]
            assert "_replicated" not in batches[p][0]
            assert batches[p][1]["_replicated"] is True
        # the replicated remainder is identical on both processes
        np.testing.assert_array_equal(batches[0][1]["rgb"], batches[1][1]["rgb"])
        assert batches[0][1]["names"] == batches[1][1]["names"]
        # drop_last still just drops it
        ok = HostLoader(ds, batch_size=4, num_workers=1, drop_last=True,
                        process_shard=(0, 2))
        assert sum(b["rgb"].shape[0] for b in ok) == 2  # one batch, half rows
