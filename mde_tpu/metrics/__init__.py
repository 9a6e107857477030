from .metrics import (
    delta_thres,
    absolute_relative_error,
    masked_si_rmse,
    evaluation_metrics,
    full_metric_suite,
)

__all__ = [
    "delta_thres",
    "absolute_relative_error",
    "masked_si_rmse",
    "evaluation_metrics",
    "full_metric_suite",
]
