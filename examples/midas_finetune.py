"""MiDaS fine-tune walkthrough — the midas.ipynb equivalent.

The reference's second notebook loads MiDaS_small from torch.hub, wraps it in
nn.DataParallel and fine-tunes with the scale-invariant loss at 448x576
(midas.ipynb cells 19-21). The equivalent here: MidasNetSmall (optionally warm-
started from a local .pth via the torch importer — torch.hub downloads are not
possible in a zero-egress environment), data-parallel over all local devices via
the ('data','model') mesh instead of DataParallel, SI loss, AdamW.

Usage:  python examples/midas_finetune.py [--data-dir data] [--epochs 1]
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
from mde_tpu.models import MidasNetSmall
from mde_tpu.parallel import make_training_mesh
from mde_tpu.train import ExperimentLogger, create_train_state, fit

INPUT_SIZE = (448, 576)  # multiples of 32 (and of 14 for the semantics variant)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--pretrained-pth", default=None,
                   help="optional local midas_v21_small_256.pt to warm-start from")
    args = p.parse_args()

    data_dir = args.data_dir
    if data_dir is None:
        data_dir = tempfile.mkdtemp(prefix="cil_synth_")
        print(f"No --data-dir given; generating synthetic data in {data_dir}")
        synthetic.generate(data_dir, n_train=32, n_test=8, size=(426, 560))

    cfg = config_lib.defaults()
    cfg.experiment.model_name = "midas_finetune"
    cfg.model.model_type = "MiDaS_small"
    cfg.model.dinov2_type = None
    cfg.training.batch_size = args.batch_size
    cfg.training.n_epoch = args.epochs
    # pure SI loss, as midas.ipynb cell 19
    cfg.model.loss_function.si_loss_alpha = 1
    cfg.model.loss_function.grad_loss_alpha = 0
    cfg.model.loss_function.edge_loss_alpha = 0

    full = DepthDataset(os.path.join(data_dir, "train"), os.path.join(data_dir, "train_list.txt"))
    tr_idx, va_idx = split_train_val(len(full), 0.15, seed=0)
    train_loader = HostLoader(full, tr_idx, args.batch_size, shuffle=True, drop_last=True)
    val_loader = HostLoader(full, va_idx, args.batch_size)

    mesh = make_training_mesh(cfg, args.batch_size)
    model = MidasNetSmall()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *INPUT_SIZE, 3), jnp.float32), cfg, mesh
    )

    if args.pretrained_pth and os.path.exists(args.pretrained_pth):
        from mde_tpu.train.torch_import import import_torch_checkpoint

        params, stats, report = import_torch_checkpoint(
            args.pretrained_pth, state.params, state.batch_stats, "MiDaS_small"
        )
        state = state.replace(params=params, batch_stats=stats)
        print(f"Warm start: loaded {report['loaded']} tensors from {args.pretrained_pth}")

    logger = ExperimentLogger(name="midas_finetune", disabled=False, log_dir="results")
    state, history = fit(
        model, cfg, state, train_loader, val_loader, "results", logger=logger, mesh=mesh
    )
    print("val losses per epoch:", [round(v, 4) for v in history["val_loss"]])


if __name__ == "__main__":
    main()
