"""Depth-Anything-V2 (small) — the stretch model family (BASELINE.json config #5).

Depth-Anything-V2's architecture is a DINOv2 trunk with a DPT head: four
intermediate ViT layers reassembled to a feature pyramid, a RefineNet fusion
cascade, and a monocular depth head. Those are exactly the components this
framework already ships (nn/vit.py DINOv2-style trunk with pos-embed
interpolation; the Dinov2Head reassembly of models/midas_semantics.py follows
dpt_depth.py:32-153, which the reference itself vendored from Depth-Anything),
so the model is their composition:

  DINOv2-S/14 (taps = all 4 quarters for small: layers [2, 5, 8, 11])
  -> per-tap 1x1 projections + 4x/2x/id/stride-2 resizes -> scratch(64)
  -> 4 size-targeted fusion blocks -> conv head -> ReLU depth.

Weights train from scratch here (zero egress); a converted DA-V2 checkpoint
drops onto the same module tree via train/torch_import once available.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import Conv
from ..nn.vit import VIT_CONFIGS, ViT
from ..ops.resize import resize_bilinear
from .midas_semantics import Dinov2Head

# Per-size tap layers and head widths (DA-V2 model cards).
DA2_CONFIGS = {
    "vits": ("dinov2_vits14", (2, 5, 8, 11), 64, (48, 96, 192, 384)),
    "vitb": ("dinov2_vitb14", (2, 5, 8, 11), 128, (96, 192, 384, 768)),
    "vitl": ("dinov2_vitl14", (4, 11, 17, 23), 256, (256, 512, 1024, 1024)),
}


class DepthAnythingV2(nn.Module):
    size: str = "vits"
    max_depth: Optional[float] = None  # metric variant clamps with sigmoid*max
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) normalized RGB -> (B, H, W) depth. H, W must be
        multiples of 14."""
        variant, hooks, features, out_channels = DA2_CONFIGS[self.size]
        patch = VIT_CONFIGS[variant][3]
        b, h, w, _ = x.shape
        ph, pw = h // patch, w // patch

        taps = ViT(variant, name="pretrained")(x, out_indices=hooks, train=train)
        feat32 = Dinov2Head(
            features,
            out_channels=tuple(out_channels),
            train=train,
            axis_name=self.axis_name,
            name="depth_head",
        )(taps, ph, pw)
        # Dinov2Head ends at 32ch, 14*ph x 14*pw; finish with the DA head:
        # 1x1 -> ReLU already applied; conv 32 -> 1, ReLU, resize to input.
        out = Conv(1, 1, name="final")(feat32)
        if self.max_depth is not None:
            out = nn.sigmoid(out) * self.max_depth
        else:
            out = nn.relu(out)
        out = resize_bilinear(out, (h, w), align_corners=True)
        return out[..., 0]
