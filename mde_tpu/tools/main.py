"""Training entry point — the equivalent of ``python src/main.py``.

Same config-driven flow as the reference (src/main.py:529-711): load config.yaml,
build train/val/test loaders from the 85/15 split, construct the configured model
(resuming from best_model_{name}.pth if training.resume_training.resume), AdamW,
train with early stopping + best-checkpointing + wandb-schema logging, then dump
426x560 test predictions. Differences: runs data-parallel over all local devices
via a ('data','model') mesh, and accepts --config/--data-dir flags (the reference
hardcodes per-user paths).
"""

from __future__ import annotations

import os
import time

import jax

from ..train import ExperimentLogger, evaluate_full_suite, fit, generate_test_predictions
from ..parallel import make_training_mesh
from .common import bootstrap_model, build_loaders, parse_config, resolve_paths


def main():
    cfg, args = parse_config("Train a depth model (TPU-native)")
    paths = resolve_paths(cfg)
    os.makedirs(paths["results_dir"], exist_ok=True)
    os.makedirs(paths["predictions_dir"], exist_ok=True)

    current_time = time.strftime("%Y%m%d-%H%M%S")
    resume = bool(cfg.training.resume_training.resume)
    logger = ExperimentLogger(
        project="MonocularDepthEstimation",
        name=f"{cfg.experiment.model_name}_{current_time}",
        run_id=cfg.training.resume_training.get("run_id") if resume else None,
        resume=resume,
        config={
            "epochs": cfg.training.n_epoch,
            "batch_size": cfg.training.batch_size,
            "learning_rate": cfg.framework.learning_rate,
            "model_name": cfg.experiment.model_name,
            "run_time": current_time,
            "resume_training": resume,
            "early_stopping": {
                "patience": cfg.training.early_stopping.patience,
                "min_delta": cfg.training.early_stopping.min_delta,
            },
        },
        disabled=bool(cfg.experiment.wandb_disable),
        log_dir=paths["results_dir"],
    )

    mesh = make_training_mesh(cfg, int(cfg.training.batch_size))
    print(f"Devices: {jax.devices()}  mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    loaders = build_loaders(cfg, paths, train=True)
    print(
        f"Train size: {loaders['train'].num_samples}, "
        f"Validation size: {loaders['val'].num_samples}"
    )

    model, state, payload = bootstrap_model(cfg, mesh)
    start_epoch = (
        int(cfg.training.resume_training.resume_from_epoch) if resume else 0
    )
    # Resume the early-stopping state alongside the weights (the reference
    # saves these fields but never reads them back — src/main.py:98 — so its
    # first post-resume epoch always clobbers the best checkpoint; SURVEY
    # §5.3 marks that "fix, don't replicate").
    es_seed = {}
    if resume and payload is not None:
        es_seed = {
            "best_val": float(payload.get("best_val_loss", float("inf"))),
            "best_epoch": payload.get("best_epoch"),
            "es_counter": int(payload.get("early_stopping_counter", 0)),
        }
        print(
            f"Resumed early-stopping state: best_val={es_seed['best_val']:.4f} "
            f"(epoch {es_seed['best_epoch']}), counter={es_seed['es_counter']}"
        )

    print("Starting training...")
    state, _ = fit(
        model,
        cfg,
        state,
        loaders["train"],
        loaders["val"],
        paths["results_dir"],
        logger=logger,
        mesh=mesh,
        start_epoch=start_epoch,
        seed=int(cfg.framework.seed),
        **es_seed,
    )

    if bool(cfg.opt.get("evaluate_best_model", False)):
        # The 7-metric validation evaluation + metrics file. The reference
        # carries this flow commented out (src/main.py:692-704); here it works.
        print("Evaluating model on validation set...")
        metrics = evaluate_full_suite(model, cfg, state, loaders["val"], mesh=mesh)
        print("\nValidation Metrics:")
        for name, value in metrics.items():
            print(f"{name}: {value:.4f}")
        with open(os.path.join(paths["results_dir"], "validation_metrics.txt"), "w") as f:
            for name, value in metrics.items():
                f.write(f"{name}: {value:.4f}\n")

    if "test" in loaders:
        print("Generating predictions for test set...")
        generate_test_predictions(
            model, cfg, state, loaders["test"], paths["predictions_dir"], mesh=mesh
        )
    print(f"Results saved to {paths['results_dir']}")
    print(f"All test depth map predictions saved to {paths['predictions_dir']}")


if __name__ == "__main__":
    main()
