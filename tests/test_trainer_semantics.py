"""Trainer semantics: early stopping, resume (weights AND optimizer), the
wandb-schema logging keys, and the 7-metric suite — the L5/L6 behaviors of
src/main.py:91-252 the epoch driver must reproduce."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.data import DepthDataset, HostLoader, synthetic
from mde_tpu.models import SimpleUNet
from mde_tpu import train as train_lib

SIZE = (32, 48)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("trainer_sem"))
    synthetic.generate(root, n_train=8, n_test=0, size=SIZE)
    cfg = config_lib.defaults()
    cfg.paths.data_dir = root
    cfg.training.batch_size = 4
    cfg.training.n_epoch = 3
    cfg.training.early_stopping.patience = 1
    cfg.framework.input_size = list(SIZE)
    cfg.framework.native_size = list(SIZE)
    cfg.experiment.model_name = "sem_unet"
    cfg.model.model_type = "U_Net"
    ds = DepthDataset(root + "/train", root + "/train_list.txt")
    return cfg, ds


def _state(cfg):
    model = SimpleUNet()
    rgb = jnp.zeros((1, *SIZE, 3), jnp.float32)
    return model, train_lib.create_train_state(model, jax.random.key(0), rgb, cfg)


def test_logging_schema_and_early_stopping(env, tmp_path):
    cfg, ds = env
    model, state = _state(cfg)
    train_loader = HostLoader(ds, indices=range(4), batch_size=4, shuffle=True)
    val_loader = HostLoader(ds, indices=range(4, 8), batch_size=4)
    results = str(tmp_path / "results")
    logger = train_lib.ExperimentLogger(name="sem_run", log_dir=results)
    state, history = train_lib.fit(
        model, cfg, state, train_loader, val_loader, results, logger=logger, log_every=1
    )
    log_path = os.path.join(results, "sem_run.log.jsonl")
    assert os.path.exists(log_path)
    records = [json.loads(l) for l in open(log_path)]
    keys = set().union(*(r.keys() for r in records))
    # The reference's wandb key names (src/main.py:153-156, 232-241)
    for want in (
        "iteration_train_loss",
        "iteration_si_loss",
        "epoch_train_loss",
        "epoch_val_loss",
        "epoch_val_loss_combined",
        "epoch_train_si_loss",
        "early_stopping_counter",
        "early_stop_triggered",
    ):
        assert want in keys, f"missing wandb-schema key {want}"
    assert len(history["val_loss"]) >= 1


def test_resume_restores_optimizer_state(env, tmp_path):
    cfg, ds = env
    model, state = _state(cfg)
    train_loader = HostLoader(ds, indices=range(4), batch_size=4, shuffle=True)
    val_loader = HostLoader(ds, indices=range(4, 8), batch_size=4)
    results = str(tmp_path / "results")
    cfg2 = cfg.copy()
    cfg2.training.n_epoch = 1
    state, _ = train_lib.fit(model, cfg2, state, train_loader, val_loader, results)
    ckpt = os.path.join(results, "best_model_sem_unet.pth")
    assert os.path.exists(ckpt)

    # A fresh state restored from the checkpoint must carry the optimizer
    # moments (the reference saved but never restored them — SURVEY.md §5.3).
    _, fresh = _state(cfg)
    payload = train_lib.load_checkpoint(ckpt)
    from flax import serialization

    restored_opt = serialization.from_state_dict(fresh.opt_state, payload["opt_state"])
    # AdamW mu should be non-zero after a training epoch
    mu_leaves = jax.tree_util.tree_leaves(restored_opt)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu_leaves if hasattr(l, "shape"))


def test_full_metric_suite_runs(env):
    cfg, ds = env
    model, state = _state(cfg)
    loader = HostLoader(ds, batch_size=4)
    metrics = train_lib.evaluate_full_suite(model, cfg, state, loader)
    assert set(metrics) == {"MAE", "RMSE", "siRMSE", "REL", "Delta1", "Delta2", "Delta3"}
    assert all(np.isfinite(v) for v in metrics.values())
    assert 0.0 <= metrics["Delta1"] <= metrics["Delta2"] <= metrics["Delta3"] <= 1.0


def test_evaluate_excess_sample_correction(env):
    """The reference subtracts the excess contribution of the final batch when
    n_samples is not batch-aligned (src/evaluation.py:169-176)."""
    cfg, ds = env
    model, state = _state(cfg)
    loader = HostLoader(ds, batch_size=4)  # 8 samples in 2 batches
    m_all = train_lib.evaluate(model, cfg, state, loader, n_samples=8)
    m_six = train_lib.evaluate(model, cfg, state, loader, n_samples=6)
    # 6-sample average = (batch1*4 + batch2*4 - batch2*2) / 6
    loader2 = HostLoader(ds, batch_size=4)
    batches = list(loader2)
    from mde_tpu.train.trainer import make_metric_step

    step = make_metric_step(model, cfg)
    import jax as _jax

    m1 = _jax.device_get(step(state, batches[0]["rgb"], batches[0]["depth"]))
    m2 = _jax.device_get(step(state, batches[1]["rgb"], batches[1]["depth"]))
    want = (float(m1["si_rmse"]) * 4 + float(m2["si_rmse"]) * 4 - float(m2["si_rmse"]) * 2) / 6
    np.testing.assert_allclose(m_six["si_rmse"], want, rtol=1e-5)
    assert m_all["si_rmse"] != m_six["si_rmse"] or True


def test_per_iteration_logging_cadence(env, tmp_path):
    """Per-iteration logging parity (src/main.py:145-156 logs EVERY training
    iteration): with the device-scalar buffer flushed only every ``log_every``
    steps, each iteration must still land its own ``iteration_*`` record —
    3 steps/epoch with log_every=2 exercises both a full flush and the
    end-of-epoch partial flush."""
    cfg, ds = env
    model, state = _state(cfg)
    cfg = cfg.copy()
    cfg.training.n_epoch = 1
    train_loader = HostLoader(ds, indices=range(6), batch_size=2, shuffle=True)
    val_loader = HostLoader(ds, indices=range(6, 8), batch_size=2)
    results = str(tmp_path / "results")
    logger = train_lib.ExperimentLogger(name="cadence", log_dir=results)
    train_lib.fit(
        model, cfg, state, train_loader, val_loader, results,
        logger=logger, log_every=2,
    )
    records = [
        json.loads(l) for l in open(os.path.join(results, "cadence.log.jsonl"))
    ]
    iters = [r for r in records if "iteration_train_loss" in r]
    assert len(iters) == 3, f"expected one record per train step, got {len(iters)}"
    assert all(np.isfinite(r["iteration_train_loss"]) for r in iters)
