"""Mesh-resident ``fit()`` integration (VERDICT r2 item 5): the epoch driver —
early stopping, best checkpoint, kill+resume — has to WORK under a device
mesh, not just a single sharded step.

All runs use deterministic list loaders (fixed batch order) so resumed
training sees the identical key/batch stream: fit() derives each step's key
from fold_in(root_key, epoch) + iteration, which is absolute in epoch index.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import SimpleUNet
from mde_tpu.parallel import make_mesh, replicate
from mde_tpu.train import create_train_state, fit, load_checkpoint

SIZE = (32, 48)


def _cfg(n_epoch, patience=2, min_delta=0.0):
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    cfg.framework.native_size = list(SIZE)
    cfg.training.n_epoch = n_epoch
    cfg.training.early_stopping.patience = patience
    cfg.training.early_stopping.min_delta = min_delta
    return cfg


def _loaders(rng, n_train=2, n_val=1, batch=8):
    def mk(n, seed_off):
        r = np.random.default_rng(1000 + seed_off)
        return [
            {
                "rgb": r.integers(0, 255, (batch, *SIZE, 3)).astype(np.uint8),
                "depth": r.uniform(0.5, 5.0, (batch, *SIZE)).astype(np.float32),
            }
            for _ in range(n)
        ]

    return mk(n_train, 0), mk(n_val, 1)


def test_fit_multi_epoch_on_mesh_with_early_stopping(rng, tmp_path):
    """Multi-epoch fit() on the 8-device mesh; min_delta set high enough that
    no epoch counts as an improvement after the first, so early stopping must
    actually fire before n_epoch."""
    cfg = _cfg(n_epoch=6, patience=2, min_delta=100.0)
    mesh = make_mesh(data=8, model=1)
    model = SimpleUNet()
    train_loader, val_loader = _loaders(rng)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), cfg, mesh
    )
    state, history = fit(
        model, cfg, state, train_loader, val_loader, str(tmp_path), mesh=mesh,
        log_every=1,
    )
    # first epoch improves (inf -> value), epochs 2..3 hit the patience=2
    assert len(history["val_loss"]) == 3, history
    assert np.isfinite(history["train_loss"]).all()
    # best checkpoint exists and params stayed mesh-replicated
    import os

    assert os.path.exists(
        os.path.join(str(tmp_path), f"best_model_{cfg.experiment.model_name}.pth")
    )
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    assert len(p0.sharding.device_set) == 8


def test_fit_kill_resume_bitmatch_on_mesh(rng, tmp_path):
    """Train 4 epochs uninterrupted vs 2 epochs + kill + restore-from-best +
    2 more epochs, all on the 8-device mesh: final params bit-match.
    min_delta=-inf-ish so every epoch saves a best checkpoint (the kill point
    is then exactly the epoch-2 state, optimizer moments included)."""
    mesh = make_mesh(data=8, model=1)
    model = SimpleUNet()
    train_loader, val_loader = _loaders(rng)
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)

    cfg_a = _cfg(n_epoch=4, patience=10, min_delta=-1e9)
    state_a = create_train_state(model, jax.random.key(0), rgb_f, cfg_a, mesh)
    state_a, _ = fit(
        model, cfg_a, state_a, train_loader, val_loader,
        str(tmp_path / "a"), mesh=mesh, seed=0,
    )
    want = jax.device_get(state_a.params)

    cfg_b = _cfg(n_epoch=2, patience=10, min_delta=-1e9)
    state_b = create_train_state(model, jax.random.key(0), rgb_f, cfg_b, mesh)
    state_b, _ = fit(
        model, cfg_b, state_b, train_loader, val_loader,
        str(tmp_path / "b"), mesh=mesh, seed=0,
    )
    # "kill": discard state_b; a fresh process restores from the best ckpt
    ckpt = str(tmp_path / "b" / f"best_model_{cfg_b.experiment.model_name}.pth")
    payload = load_checkpoint(ckpt)
    fresh = create_train_state(model, jax.random.key(99), rgb_f, cfg_b, mesh)
    template = jax.device_get(
        {"params": fresh.params, "batch_stats": fresh.batch_stats,
         "opt_state": fresh.opt_state}
    )
    from flax import serialization

    restored = serialization.from_state_dict(
        template,
        {"params": payload["params"], "batch_stats": payload["batch_stats"],
         "opt_state": payload["opt_state"]},
    )
    resumed = fresh.replace(
        params=replicate(restored["params"], mesh),
        batch_stats=replicate(restored["batch_stats"], mesh),
        opt_state=replicate(restored["opt_state"], mesh),
    )
    cfg_c = _cfg(n_epoch=4, patience=10, min_delta=-1e9)
    resumed, _ = fit(
        model, cfg_c, resumed, train_loader, val_loader,
        str(tmp_path / "c"), mesh=mesh, seed=0, start_epoch=int(payload["epoch"]),
    )
    got = jax.device_get(resumed.params)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_fit_one_epoch_dp_tp_mesh_flagship(rng, tmp_path):
    """One fit() epoch on a (4,2) dp x tp mesh with the flagship: exercises
    the epoch driver + eval + best-checkpoint save with TP-SHARDED leaves
    through save_checkpoint (host gather of 'model'-axis shards)."""
    import os

    from mde_tpu.models import MidasNetSemantics

    h, w = 64, 96
    cfg = _cfg(n_epoch=1)
    cfg.framework.input_size = [h, w]
    cfg.framework.native_size = [h, w]
    mesh = make_mesh(data=4, model=2)
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    r = np.random.default_rng(5)
    train_loader = [
        {
            "rgb": r.integers(0, 255, (8, h, w, 3)).astype(np.uint8),
            "depth": r.uniform(0.5, 5.0, (8, h, w)).astype(np.float32),
        }
        for _ in range(2)
    ]
    val_loader = train_loader[:1]
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32), cfg, mesh
    )
    from jax.sharding import PartitionSpec as P

    qkv = state.params["dinov2"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")  # really TP-sharded

    state, history = fit(
        model, cfg, state, train_loader, val_loader, str(tmp_path), mesh=mesh,
    )
    assert np.isfinite(history["train_loss"]).all()
    ckpt = os.path.join(str(tmp_path), f"best_model_{cfg.experiment.model_name}.pth")
    assert os.path.exists(ckpt)
    payload = load_checkpoint(ckpt)
    leaves = jax.tree_util.tree_leaves(payload["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves if np.asarray(l).dtype.kind == "f")