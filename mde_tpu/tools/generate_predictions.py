"""Submission pipeline — equivalent of ``python src/generate_predictions.py``.

Loads the configured checkpoint, forwards the test list, saves 426x560 ``.npy``
predictions, then encodes predictions.csv directly (the reference shells out to
create_prediction_csv.py via os.system, src/generate_predictions.py:50 — same
result, no subprocess).
"""

from __future__ import annotations

import os

from ..parallel import make_training_mesh
from ..data import DepthDataset, HostLoader
from ..train import generate_test_predictions
from .common import bootstrap_model, parse_config, resolve_paths
from .create_prediction_csv import process_depth_maps


def main():
    cfg, args = parse_config("Generate test predictions + Kaggle CSV")
    paths = resolve_paths(cfg)
    ckpt = os.path.join(paths["results_dir"], f"best_model_{cfg.experiment.model_name}.pth")
    mesh = make_training_mesh(cfg, int(cfg.training.batch_size))
    model, state, _ = bootstrap_model(cfg, mesh, checkpoint=ckpt)

    test_ds = DepthDataset(paths["test_dir"], paths["test_list"], has_gt=False)
    loader = HostLoader(
        test_ds,
        batch_size=int(cfg.training.batch_size),
        num_workers=int(cfg.framework.num_workers),
    )
    generate_test_predictions(model, cfg, state, loader, paths["predictions_dir"], mesh=mesh)
    process_depth_maps(
        predictions_dir=paths["predictions_dir"],
        test_list_file=paths["test_list"],
        output_csv="predictions.csv",
    )


if __name__ == "__main__":
    main()
