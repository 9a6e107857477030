from .losses import (
    scale_invariant_loss,
    silog_loss,
    gradient_loss,
    edge_aware_loss,
    per_pixel_scale_invariant_loss,
    combined_loss,
)

__all__ = [
    "scale_invariant_loss",
    "silog_loss",
    "gradient_loss",
    "edge_aware_loss",
    "per_pixel_scale_invariant_loss",
    "combined_loss",
]
