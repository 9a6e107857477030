"""Depth-Anything-V2-small fine-tune recipe, end-to-end (BASELINE config #5).

The last BASELINE.json config without its own driver: fine-tune
DepthAnythingV2(size='vits') on CIL-geometry data through the production
`fit()` loop, then dump 426x560 `.npy` predictions and encode the Kaggle
`predictions.csv` (byte-compatible with /root/reference/create_prediction_csv.py).

DA-V2 is a DINOv2 trunk + DPT head (models/depth_anything.py); inputs must be
/14-divisible, so the recipe trains at 448x588 (14*32 x 14*42 — the closest
/14 grid >= the reference's 448x576 training size) and resizes predictions
back to the native 426x560 exactly as src/util.py:305-322 does. Weights train
from scratch unless --pretrained-pth points at a converted DA-V2 checkpoint
(zero egress here); the metric head (--max-depth) clamps with sigmoid*max.

Usage:  python examples/da2_finetune.py [--data-dir data] [--epochs 2]
"""

from __future__ import annotations

import os as _os
import sys as _sys

# run-from-anywhere: background shells may start outside the repo root, and
# PYTHONPATH breaks the axon plugin (CLAUDE.md) — self-insert instead
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import tempfile

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.data import DepthDataset, HostLoader, split_train_val, synthetic
from mde_tpu.models import DepthAnythingV2
from mde_tpu.parallel import make_training_mesh
from mde_tpu.tools.create_prediction_csv import process_depth_maps
from mde_tpu.train import (
    ExperimentLogger,
    create_train_state,
    fit,
    generate_test_predictions,
)

INPUT_SIZE = (448, 588)  # /14-divisible (DINOv2 trunk), nearest >= 448x576


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-depth", type=float, default=10.0,
                   help="metric-depth clamp (sigmoid*max); CIL depths are <10m")
    p.add_argument("--pretrained-pth", default=None,
                   help="optional local converted DA-V2 checkpoint")
    p.add_argument("--results-dir", default="results")
    args = p.parse_args()

    data_dir = args.data_dir
    if data_dir is None:
        data_dir = tempfile.mkdtemp(prefix="cil_synth_")
        print(f"No --data-dir given; generating synthetic data in {data_dir}")
        synthetic.generate(data_dir, n_train=32, n_test=8, size=(426, 560))

    cfg = config_lib.defaults()
    cfg.experiment.model_name = "da2_finetune"
    cfg.framework.input_size = list(INPUT_SIZE)
    cfg.training.batch_size = args.batch_size
    cfg.training.n_epoch = args.epochs
    # pure SI loss (the reference's flagship loss config, config.yaml:34-42)
    cfg.model.loss_function.si_loss_alpha = 1
    cfg.model.loss_function.grad_loss_alpha = 0
    cfg.model.loss_function.edge_loss_alpha = 0

    full = DepthDataset(
        os.path.join(data_dir, "train"), os.path.join(data_dir, "train_list.txt")
    )
    tr_idx, va_idx = split_train_val(len(full), 0.15, seed=0)
    train_loader = HostLoader(full, tr_idx, args.batch_size, shuffle=True, drop_last=True)
    val_loader = HostLoader(full, va_idx, args.batch_size)

    mesh = make_training_mesh(cfg, args.batch_size)
    model = DepthAnythingV2(size="vits", max_depth=args.max_depth)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *INPUT_SIZE, 3), jnp.float32), cfg, mesh
    )

    if args.pretrained_pth and os.path.exists(args.pretrained_pth):
        from mde_tpu.train.torch_import import import_torch_checkpoint

        params, stats, report = import_torch_checkpoint(
            args.pretrained_pth, state.params, state.batch_stats,
            "DepthAnythingV2_vits",
        )
        state = state.replace(params=params, batch_stats=stats)
        print(f"Warm start: loaded {report['loaded']} tensors")

    logger = ExperimentLogger(name="da2_finetune", disabled=False,
                              log_dir=args.results_dir)
    state, history = fit(
        model, cfg, state, train_loader, val_loader, args.results_dir,
        logger=logger, mesh=mesh,
    )
    print("val losses per epoch:", [round(v, 4) for v in history["val_loss"]])

    # predictions + Kaggle csv (src/util.py:292-328 -> create_prediction_csv.py)
    test_list = os.path.join(data_dir, "test_list.txt")
    test_ds = DepthDataset(os.path.join(data_dir, "test"), test_list, has_gt=False)
    test_loader = HostLoader(test_ds, None, args.batch_size)
    pred_dir = os.path.join(args.results_dir, "predictions_da2")
    generate_test_predictions(model, cfg, state, test_loader, pred_dir, mesh=mesh)
    csv_path = os.path.join(args.results_dir, "predictions_da2.csv")
    process_depth_maps(pred_dir, test_list, csv_path)
    print(f"predictions: {pred_dir}  csv: {csv_path}")


if __name__ == "__main__":
    main()
