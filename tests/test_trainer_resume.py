"""Early-stopping state restoration on resume (VERDICT r3 Missing #3).

The reference saves best_val_loss / best_epoch / early_stopping_counter in the
checkpoint but never reads them back (/root/reference/src/main.py:98 restarts
``best_val_loss = float("inf")``), so the first post-resume epoch ALWAYS
overwrites the best checkpoint even when worse than the pre-kill best.
SURVEY §5.3 marks this class "fix, don't replicate": fit() takes
(best_val, best_epoch, es_counter) seeds and tools/main.py plumbs them from
the resume payload. These tests pin the fixed semantics:

1. a resumed run whose epochs are all WORSE must not touch best_model_*.pth;
2. the counter continues from its saved value (patience fires early);
3. a checkpoint saved at counter >= patience resumes straight to "done".
"""

import hashlib
import os

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from mde_tpu.core import config as config_lib
from mde_tpu.models import SimpleUNet
from mde_tpu.train import create_train_state, fit, load_checkpoint

SIZE = (32, 48)


def _cfg(n_epoch, patience=3, min_delta=0.0):
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    cfg.framework.native_size = list(SIZE)
    cfg.training.n_epoch = n_epoch
    cfg.training.early_stopping.patience = patience
    cfg.training.early_stopping.min_delta = min_delta
    return cfg


def _loaders(n_train=2, n_val=1, batch=4):
    def mk(n, seed_off):
        r = np.random.default_rng(2000 + seed_off)
        return [
            {
                "rgb": r.integers(0, 255, (batch, *SIZE, 3)).astype(np.uint8),
                "depth": r.uniform(0.5, 5.0, (batch, *SIZE)).astype(np.float32),
            }
            for _ in range(n)
        ]

    return mk(n_train, 0), mk(n_val, 1)


def _restored_state(model, cfg, ckpt):
    payload = load_checkpoint(ckpt)
    fresh = create_train_state(
        model, jax.random.key(7), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, None
    )
    template = jax.device_get(
        {"params": fresh.params, "batch_stats": fresh.batch_stats,
         "opt_state": fresh.opt_state}
    )
    restored = serialization.from_state_dict(
        template,
        {"params": payload["params"], "batch_stats": payload["batch_stats"],
         "opt_state": payload["opt_state"]},
    )
    return (
        fresh.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        ),
        payload,
    )


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_resume_worse_epoch_does_not_overwrite_best(tmp_path):
    model = SimpleUNet()
    train_loader, val_loader = _loaders()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)

    # Phase 1: one epoch, best checkpoint saved, then "kill".
    cfg = _cfg(n_epoch=1)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, None)
    fit(model, cfg, state, train_loader, val_loader, str(tmp_path), seed=0)
    ckpt = os.path.join(str(tmp_path), f"best_model_{cfg.experiment.model_name}.pth")
    assert os.path.exists(ckpt)
    before = _sha(ckpt)

    # Phase 2: resume with a min_delta so large no epoch can count as an
    # improvement — i.e. every post-resume epoch is "worse" than the saved
    # best. With the saved best_val seeded in, the checkpoint must survive
    # untouched; without it (the reference defect) best_val restarts at inf
    # and the first epoch would overwrite.
    cfg2 = _cfg(n_epoch=3, patience=10, min_delta=1e9)
    resumed, payload = _restored_state(model, cfg2, ckpt)
    assert np.isfinite(payload["best_val_loss"])
    fit(
        model, cfg2, resumed, train_loader, val_loader, str(tmp_path),
        start_epoch=int(payload["epoch"]), seed=0,
        best_val=float(payload["best_val_loss"]),
        best_epoch=payload["best_epoch"],
        es_counter=int(payload["early_stopping_counter"]),
    )
    assert _sha(ckpt) == before, "resumed worse epochs overwrote the best checkpoint"

    # Control: the defect path (no seeds) DOES overwrite — guards against the
    # test passing vacuously (e.g. identical re-save bytes).
    resumed_bad, _ = _restored_state(model, cfg2, ckpt)
    fit(
        model, cfg2, resumed_bad, train_loader, val_loader, str(tmp_path),
        start_epoch=int(payload["epoch"]), seed=0,
    )
    assert _sha(ckpt) != before, (
        "control run (best_val restarted at inf) should have overwritten"
    )


def test_resume_counter_continuity(tmp_path):
    """Seeding es_counter=2 with patience=3 must stop after ONE more
    non-improving epoch — the counter continues, it doesn't restart at 0."""
    model = SimpleUNet()
    train_loader, val_loader = _loaders()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    cfg = _cfg(n_epoch=10, patience=3, min_delta=1e9)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, None)
    _, history = fit(
        model, cfg, state, train_loader, val_loader, str(tmp_path), seed=0,
        best_val=0.0, es_counter=2,
    )
    assert len(history["val_loss"]) == 1, history

    # Fresh counter for contrast: patience=3 takes 3 epochs to trigger.
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, None)
    _, history = fit(
        model, cfg, state, train_loader, val_loader, str(tmp_path / "fresh"),
        seed=0, best_val=0.0,
    )
    assert len(history["val_loss"]) == 3, history


def test_resume_already_converged_runs_zero_epochs(tmp_path):
    model = SimpleUNet()
    train_loader, val_loader = _loaders()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    cfg = _cfg(n_epoch=5, patience=2, min_delta=1e9)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, None)
    _, history = fit(
        model, cfg, state, train_loader, val_loader, str(tmp_path), seed=0,
        best_val=0.0, es_counter=2,
    )
    assert history["val_loss"] == [], history
