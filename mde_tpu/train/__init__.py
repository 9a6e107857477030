from .trainer import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    make_metric_step,
    make_predict_step,
    fit,
    evaluate,
    evaluate_full_suite,
    generate_test_predictions,
)
from .checkpoint import save_checkpoint, load_checkpoint
from .export import export_predict, save_exported, load_exported, ExportedPredictor
from .logging import ExperimentLogger
from .profiling import StepTimer, device_memory_stats, trace

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "make_metric_step",
    "make_predict_step",
    "fit",
    "evaluate",
    "evaluate_full_suite",
    "generate_test_predictions",
    "save_checkpoint",
    "load_checkpoint",
    "export_predict",
    "save_exported",
    "load_exported",
    "ExportedPredictor",
    "ExperimentLogger",
    "StepTimer",
    "device_memory_stats",
    "trace",
]
