"""Model factory: config-driven construction and checkpoint loading.

Mirrors the dispatch of the reference's ``init_model`` (src/main.py:395-465) and
``load_model`` (src/util.py:222-238 / src/evaluation.py:42-66):

  model_type        dinov2_type   ->  model
  "MiDaS_small"     set           ->  MidasNetSemantics(features=64, lite3, expand)
  "MiDaS_small"     null          ->  MidasNet_small   (features=64, lite3, expand)
  "MiDaS"           -             ->  MidasNet (full, ResNeXt101 encoder)
  "DPT_Hybrid"      -             ->  DPTDepthModel(backbone=vitb_rn50_384)
  "U_Net"           -             ->  SimpleUNet (evaluation.py:52-53)

Pretrained-weight bootstrapping differs from the reference by necessity: the
reference wget-downloads MiDaS release checkpoints at startup (src/main.py:445-447);
this environment has no egress, so weights load only from a local ``.pth`` or
native checkpoint when one exists (the shape-filtered strict=False merge
semantics of src/main.py:451-464 live in train/torch_import.py).
"""

from __future__ import annotations

import os
from typing import Optional

from .dpt import DPTDepthModel
from .midas_net import MidasNet
from .midas_semantics import MidasNetSemantics
from .midas_small import MidasNetSmall
from .simple_unet import SimpleUNet


def build_model(model_cfg, axis_name: Optional[str] = None):
    """Construct the Flax module for a config ``model`` section."""
    model_type = model_cfg.model_type
    network_cfg = model_cfg.get("network", model_cfg)
    use_lb = bool(network_cfg.get("use_lb", False))
    use_dgr = bool(network_cfg.get("use_dgr", False))

    if model_type == "MiDaS_small":
        if model_cfg.get("dinov2_type") is not None:
            return MidasNetSemantics(
                features=64,
                backbone="efficientnet_lite3",
                dinov2_type=model_cfg.dinov2_type,
                non_negative=True,
                use_lb=use_lb,
                use_dgr=use_dgr,
                axis_name=axis_name,
            )
        return MidasNetSmall(
            features=64,
            backbone="efficientnet_lite3",
            non_negative=True,
            expand=True,
            use_lb=use_lb,
            use_dgr=use_dgr,
            axis_name=axis_name,
        )
    if model_type == "MiDaS":
        return MidasNet(features=256, non_negative=True, axis_name=axis_name)
    if model_type == "DPT_Hybrid":
        return DPTDepthModel(backbone="vitb_rn50_384", non_negative=True, axis_name=axis_name)
    if model_type == "DPT_Large":
        return DPTDepthModel(backbone="vitl16_384", non_negative=True, axis_name=axis_name)
    if model_type == "U_Net":
        return SimpleUNet(axis_name=axis_name)
    if model_type.startswith("DepthAnythingV2"):
        # e.g. "DepthAnythingV2_vits" (stretch family, BASELINE.json config #5)
        from .depth_anything import DepthAnythingV2

        size = model_type.split("_")[-1] if "_" in model_type else "vits"
        return DepthAnythingV2(size=size, axis_name=axis_name)
    raise ValueError(f"Unknown model_type: {model_type!r}")


def init_model(config, axis_name: Optional[str] = None):
    """Reference init_model: build + optionally resume from the best checkpoint.

    Returns (model, checkpoint_payload_or_None); the caller restores params into
    its TrainState (the functional split of src/main.py:434-442).
    """
    model = build_model(config.model, axis_name=axis_name)
    resume_cfg = config.training.get("resume_training")
    if resume_cfg is not None and resume_cfg.get("resume"):
        best = os.path.join(
            config.paths.results_dir, f"best_model_{config.experiment.model_name}.pth"
        )
        if os.path.exists(best):
            from ..train.checkpoint import load_checkpoint

            return model, load_checkpoint(best)
        print(f"No best model found at {best}. Starting from scratch weights.")
    return model, None
