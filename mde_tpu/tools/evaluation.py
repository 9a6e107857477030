"""Standalone metric evaluation — the equivalent of ``python src/evaluation.py``.

Protocol parity (src/evaluation.py:99-185): load best_model_{model_name}.pth per
config, print the trainable-parameter count, evaluate the first N_SAMPLES=1000
samples of the *train* list (batch 4, no shuffle, no augmentation — the
reference's own choice, kept for comparability) and print average SI loss
(sqroot), AbsRel, and delta at 1.05^j thresholds with last-batch excess
correction.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..data import DepthDataset, HostLoader
from ..parallel import make_training_mesh
from ..train import evaluate
from ..train.trainer import FROZEN_SUBTREES
from .common import bootstrap_model, parse_config, resolve_paths


def count_trainable_params(params) -> int:
    """Count only trainable parameters, excluding frozen subtrees.

    The reference counts ``p.requires_grad`` params only (src/evaluation.py:64-65),
    which excludes the frozen DINOv2 backbone (src/network/midas_semantics.py:169-172).
    Our equivalent of requires_grad=False is the optimizer partition over
    ``FROZEN_SUBTREES``; apply the same filter here so the printed number matches
    the reference for the flagship.
    """
    total = 0
    for top_key, subtree in dict(params).items():
        if top_key in FROZEN_SUBTREES:
            continue
        total += sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(subtree)
        )
    return total


def main():
    cfg, args = parse_config("Evaluate a depth model checkpoint")
    paths = resolve_paths(cfg)
    ckpt = os.path.join(paths["results_dir"], f"best_model_{cfg.experiment.model_name}.pth")
    print(f"Loading model {cfg.model.model_type} from {ckpt}")
    mesh = make_training_mesh(cfg, int(cfg.training.batch_size))
    model, state, _ = bootstrap_model(cfg, mesh, checkpoint=ckpt)

    n_params = count_trainable_params(state.params)
    print(f"Number of trainable parameters in the model: {n_params}")

    dataset = DepthDataset(paths["train_dir"], paths["train_list"], has_gt=True)
    loader = HostLoader(
        dataset,
        batch_size=int(cfg.training.batch_size),
        shuffle=False,
        num_workers=int(cfg.framework.num_workers),
    )
    n_samples = int(cfg.framework.eval_n_samples)
    metrics = evaluate(model, cfg, state, loader, mesh=mesh, n_samples=n_samples)

    base = float(cfg.framework.eval_base_thres)
    print(f"Average Scale-Invariant Loss: {metrics['si_rmse']}")
    print(f"Average Absolute Relative Error: {metrics['abs_rel']}")
    for j in range(1, int(cfg.framework.eval_n_delta) + 1):
        print(f"Average Delta {base**j} Threshold: {metrics[f'delta_{j}']}")


if __name__ == "__main__":
    main()
