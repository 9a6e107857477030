"""PR1 end-to-end slice (BASELINE.json config #1): tiny SimpleUNet overfits 16
synthetic images on CPU — exercises config, data, model, loss, jitted AdamW
train step, early-stopping driver, checkpointing and prediction dump."""

import os

import numpy as np
import pytest

import jax

from mde_tpu.core import config as config_lib
from mde_tpu.data import DepthDataset, HostLoader, synthetic
from mde_tpu.models import SimpleUNet
from mde_tpu import train as train_lib

SIZE = (48, 64)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("overfit_data"))
    synthetic.generate(root, n_train=16, n_test=4, size=SIZE)
    cfg = config_lib.defaults()
    cfg.paths.data_dir = root
    cfg.training.batch_size = 8
    cfg.training.n_epoch = 1
    cfg.framework.input_size = list(SIZE)
    cfg.framework.native_size = list(SIZE)
    cfg.framework.learning_rate = 1e-3  # overfit faster than the reference lr
    cfg.experiment.model_name = "overfit_unet"
    cfg.model.model_type = "U_Net"
    return cfg


def test_overfit_16_images(cfg):
    ds = DepthDataset(cfg.paths.data_dir + "/train", cfg.paths.data_dir + "/train_list.txt")
    model = SimpleUNet()
    loader = HostLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2)
    batch0 = next(iter(loader))
    from mde_tpu.data.transforms import preprocess_eval

    rgb0, _ = preprocess_eval(
        jax.numpy.asarray(batch0["rgb"]),
        jax.numpy.asarray(batch0["depth"]),
        input_size=tuple(SIZE),
    )
    state = train_lib.create_train_state(model, jax.random.key(0), rgb0, cfg)
    step = train_lib.make_train_step(model, cfg)

    losses = []
    key = jax.random.key(1)
    for it in range(60):
        for batch in loader:
            key = jax.random.fold_in(key, it)
            state, metrics = step(state, key, batch["rgb"], batch["depth"])
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # Strong overfit: final loss far below initial
    assert losses[-1] < 0.25 * losses[0], f"no overfit: {losses[0]:.4f} -> {losses[-1]:.4f}"
    assert losses[-1] < 0.05, f"final loss too high: {losses[-1]:.4f}"


def test_fit_driver_and_predictions(cfg, tmp_path):
    ds = DepthDataset(cfg.paths.data_dir + "/train", cfg.paths.data_dir + "/train_list.txt")
    test_ds = DepthDataset(
        cfg.paths.data_dir + "/test", cfg.paths.data_dir + "/test_list.txt", has_gt=False
    )
    model = SimpleUNet()
    train_loader = HostLoader(ds, indices=range(12), batch_size=4, shuffle=True, num_workers=2)
    val_loader = HostLoader(ds, indices=range(12, 16), batch_size=4, num_workers=1)
    test_loader = HostLoader(test_ds, batch_size=4, num_workers=1)

    from mde_tpu.data.transforms import preprocess_eval

    batch0 = next(iter(train_loader))
    rgb0, _ = preprocess_eval(
        jax.numpy.asarray(batch0["rgb"]),
        jax.numpy.asarray(batch0["depth"]),
        input_size=tuple(SIZE),
    )
    state = train_lib.create_train_state(model, jax.random.key(0), rgb0, cfg)
    results_dir = str(tmp_path / "results")
    state, history = train_lib.fit(
        model, cfg, state, train_loader, val_loader, results_dir
    )
    assert len(history["val_loss"]) == 1
    ckpt = os.path.join(results_dir, "best_model_overfit_unet.pth")
    assert os.path.exists(ckpt)

    # Metric evaluation protocol runs
    metrics = train_lib.evaluate(model, cfg, state, val_loader, n_samples=4)
    assert set(metrics) == {"si_rmse", "abs_rel", "delta_1", "delta_2", "delta_3"}
    assert 0.0 <= metrics["delta_1"] <= 1.0

    # Prediction dump: one .npy per test image, at native size, named by the
    # depth token of the list entry (src/util.py:318)
    pred_dir = str(tmp_path / "predictions")
    train_lib.generate_test_predictions(model, cfg, state, test_loader, pred_dir)
    files = sorted(os.listdir(pred_dir))
    assert files == [f"test_{i:06d}_depth.npy" for i in range(4)]
    arr = np.load(os.path.join(pred_dir, files[0]))
    assert arr.shape == tuple(SIZE) and arr.dtype == np.float32


def test_checkpoint_roundtrip(cfg, tmp_path):
    import jax.numpy as jnp

    from mde_tpu.data.transforms import preprocess_eval
    from mde_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = SimpleUNet()
    rgb = jnp.zeros((1, *SIZE, 3), jnp.float32)
    state = train_lib.create_train_state(model, jax.random.key(0), rgb, cfg)
    path = str(tmp_path / "ckpt.pth")
    save_checkpoint(path, {"epoch": 3, "params": state.params, "opt_state": state.opt_state})
    restored = load_checkpoint(
        path, template={"epoch": 0, "params": state.params, "opt_state": state.opt_state}
    )
    assert restored["epoch"] == 3
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored["params"])
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_matches_torch_simple_unet():
    """Parity check in the spirit of src/evaluation.py:64-65 (param-count print):
    our SimpleUNet must have exactly the parameter count of the notebook model."""
    import torch.nn as tnn

    class TorchUNetBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            self.bn2 = tnn.BatchNorm2d(cout)

    class TorchSimpleUNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc1 = TorchUNetBlock(3, 64)
            self.enc2 = TorchUNetBlock(64, 128)
            self.dec2 = TorchUNetBlock(128 + 64, 64)
            self.dec1 = TorchUNetBlock(64, 32)
            self.final = tnn.Conv2d(32, 1, 1)

    want = sum(p.numel() for p in TorchSimpleUNet().parameters())
    import jax.numpy as jnp

    variables = SimpleUNet().init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    got = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert got == want, f"param count {got} != torch {want}"
