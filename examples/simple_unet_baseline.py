"""Course-baseline walkthrough — the monocular-depth-example-notebook equivalent.

The reference ships this flow as a 23-cell notebook (SimpleUNet trained with
MSE at the native 426x560 resolution, then eval + test-prediction dump). Same
recipe here as a runnable script on the JAX stack: SimpleUNet (2-level UNet,
sigmoid*10 head — notebook cells 10-11), MSE loss (cell ~15), INPUT_SIZE
(426, 560) (cell 4), AdamW lr=1e-4 wd=1e-4 batch 4.

Usage:  python examples/simple_unet_baseline.py [--data-dir data] [--epochs 1]
(no data dir -> a small synthetic CIL-format dataset is generated)
"""

from __future__ import annotations

import os as _os
import sys as _sys

# run-from-anywhere: background shells may start outside the repo root, and
# PYTHONPATH breaks the axon plugin (CLAUDE.md) — self-insert instead
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from mde_tpu.core import config as config_lib
from mde_tpu.data import DepthDataset, HostLoader, split_train_val, synthetic
from mde_tpu.data.transforms import preprocess_eval, preprocess_train
from mde_tpu.models import SimpleUNet
from mde_tpu.train import TrainState, create_train_state, generate_test_predictions

INPUT_SIZE = (426, 560)  # notebook cell 4: trains at the native resolution


def mse_loss(pred, target):
    """The notebook baseline trains with plain MSE (not scale-invariant)."""
    return jnp.mean(jnp.square(pred - target))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)
    args = p.parse_args()

    data_dir = args.data_dir
    if data_dir is None:
        data_dir = tempfile.mkdtemp(prefix="cil_synth_")
        print(f"No --data-dir given; generating synthetic data in {data_dir}")
        synthetic.generate(data_dir, n_train=32, n_test=8, size=INPUT_SIZE)

    cfg = config_lib.defaults()
    cfg.framework.input_size = list(INPUT_SIZE)
    cfg.framework.native_size = list(INPUT_SIZE)
    cfg.experiment.model_name = "simple_unet_baseline"
    cfg.model.model_type = "U_Net"
    cfg.training.batch_size = args.batch_size

    full = DepthDataset(os.path.join(data_dir, "train"), os.path.join(data_dir, "train_list.txt"))
    tr_idx, va_idx = split_train_val(len(full), 0.15, seed=0)
    train_loader = HostLoader(full, tr_idx, args.batch_size, shuffle=True, drop_last=True)
    val_loader = HostLoader(full, va_idx, args.batch_size)

    model = SimpleUNet()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *INPUT_SIZE, 3), jnp.float32), cfg
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, key, rgb_u8, depth_raw):
        rgb, depth = preprocess_train(key, rgb_u8, depth_raw, input_size=INPUT_SIZE)

        def loss_fn(params):
            pred, stats = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb, train=True, mutable=["batch_stats"],
            )
            return mse_loss(pred, depth), stats["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads).replace(batch_stats=stats), loss

    @jax.jit
    def val_step(state, rgb_u8, depth_raw):
        rgb, depth = preprocess_eval(rgb_u8, depth_raw, input_size=INPUT_SIZE)
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, rgb, train=False
        )
        return mse_loss(pred, depth)

    key = jax.random.key(1)
    for epoch in range(args.epochs):
        t0 = time.time()
        tl, n = 0.0, 0
        for i, batch in enumerate(train_loader):
            state, loss = train_step(
                state, jax.random.fold_in(key, epoch * 10000 + i), batch["rgb"], batch["depth"]
            )
            tl += float(loss) * batch["rgb"].shape[0]
            n += batch["rgb"].shape[0]
        vl, m = 0.0, 0
        for batch in val_loader:
            vl += float(val_step(state, batch["rgb"], batch["depth"])) * batch["rgb"].shape[0]
            m += batch["rgb"].shape[0]
        print(
            f"Epoch {epoch + 1}/{args.epochs}: train MSE {tl / max(n,1):.4f}, "
            f"val MSE {vl / max(m,1):.4f} ({time.time() - t0:.1f}s)"
        )

    test_list = os.path.join(data_dir, "test_list.txt")
    if os.path.exists(test_list):
        test_ds = DepthDataset(os.path.join(data_dir, "test"), test_list, has_gt=False)
        test_loader = HostLoader(test_ds, batch_size=args.batch_size)
        out_dir = "predictions_simple_unet"
        generate_test_predictions(model, cfg, state, test_loader, out_dir)
        print(f"Test predictions saved to {out_dir}/")


if __name__ == "__main__":
    main()
