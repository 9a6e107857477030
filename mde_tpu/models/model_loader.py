"""MiDaS-style model loader: the ``default_models`` table + builder.

Parity surface for src/network/model_loader.py (a MiDaS-repo vestige the
reference carries; its ``default_models`` table names 14 checkpoints and
``load_model`` builds model + per-model preprocessing transform). Here the
table maps every reference entry to this framework's constructor, its input
geometry, and the named numpy preprocessing pipeline from
data/midas_transforms.py. Checkpoint paths are honored when the file exists
(no egress to download releases); ``openvino`` entries are inference-engine
specific and intentionally unsupported. Every other entry — including the
ViT-hybrid (``dpt_hybrid_384``, models/dpt.py) — builds a real model.
"""

from __future__ import annotations

import os
from typing import Optional

from .dpt import DPTDepthModel
from .midas_net import MidasNet
from .midas_small import MidasNetSmall

# name -> (builder kwargs or None, input (h, w), transform pipeline name)
DEFAULT_MODELS = {
    "dpt_beit_large_512": (dict(backbone="beitl16_512"), (512, 512), "beit512"),
    "dpt_beit_large_384": (dict(backbone="beitl16_384"), (384, 384), "dpt"),
    "dpt_beit_base_384": (dict(backbone="beitb16_384"), (384, 384), "dpt"),
    "dpt_swin2_large_384": (dict(backbone="swin2l24_384"), (384, 384), "swin384"),
    "dpt_swin2_base_384": (dict(backbone="swin2b24_384"), (384, 384), "swin384"),
    "dpt_swin2_tiny_256": (dict(backbone="swin2t16_256"), (256, 256), "swin256"),
    "dpt_swin_large_384": (dict(backbone="swinl12_384"), (384, 384), "swin384"),
    "dpt_next_vit_large_384": (dict(backbone="next_vit_large_6m"), (384, 384), "dpt"),
    "dpt_levit_224": (dict(backbone="levit_384", head_features_1=64, head_features_2=8), (224, 224), "levit"),
    "dpt_large_384": (dict(backbone="vitl16_384"), (384, 384), "dpt"),
    "dpt_hybrid_384": (dict(backbone="vitb_rn50_384"), (384, 384), "dpt"),
    "midas_v21_384": ("midas", (384, 384), "default"),
    "midas_v21_small_256": ("midas_small", (256, 256), "small"),
    "openvino_midas_v21_small_256": (None, (256, 256), "small"),
}


def load_model(
    model_type: str = "dpt_beit_large_512",
    model_path: Optional[str] = None,
    axis_name: Optional[str] = None,
):
    """Build (model, input_size, transform) for a default_models entry.

    ``transform`` is the matching numpy preprocessing pipeline (host-side,
    arbitrary-image inference); training uses the fused on-device pipeline
    instead. If ``model_path`` points at an existing checkpoint it is the
    caller's job to restore it (train.checkpoint / train.torch_import).
    """
    if model_type not in DEFAULT_MODELS:
        raise ValueError(f"Unknown model_type {model_type!r}; have {sorted(DEFAULT_MODELS)}")
    spec, size, transform_name = DEFAULT_MODELS[model_type]
    if spec is None:
        raise NotImplementedError(
            f"{model_type!r} is registered but unsupported "
            "(openvino is an inference-engine-specific backend)"
        )
    if spec == "midas":
        model = MidasNet(axis_name=axis_name)
    elif spec == "midas_small":
        model = MidasNetSmall(axis_name=axis_name)
    else:
        model = DPTDepthModel(axis_name=axis_name, **spec)

    from ..data.midas_transforms import transforms

    transform = transforms()[transform_name]
    if model_path and not os.path.exists(model_path):
        print(f"Note: checkpoint {model_path} not found; model is randomly initialized.")
    return model, size, transform
