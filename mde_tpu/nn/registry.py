"""Encoder registry: the reference's 12-name ``_make_encoder`` dispatch surface.

Mirrors src/network/blocks.py:32-130 — every backbone name the reference
dispatches on is registered here with its per-level channel table, so models and
tools can query the full surface. All names are implemented: convolutional
backbones (the efficientnet-lite family, resnext101_wsl) build directly through
this registry's 4-feature-map interface, while token/hierarchical backbones
(ViT/BEiT/Swin/LeViT/Next-ViT — the "vit"/"dpt" markers below) are ROUTED to
models.dpt's reassembly path; make_encoder raises for those names on purpose so
a caller can't silently get the wrong feature contract.
"""

from __future__ import annotations

from typing import Callable, Optional

from .efficientnet import EfficientNetLite, lite_stage_channels
from .resnext import ResNetBackbone

# name -> (channel table for _make_scratch, builder | "vit" | "dpt" | None)
# "vit"/"dpt" markers: token/hierarchical backbones consumed through
# models.dpt's reassembly rather than the 4-feature-map interface.
ENCODER_REGISTRY: dict[str, tuple[list[int], Optional[Callable]]] = {
    "beitl16_512": ([256, 512, 1024, 1024], "dpt"),
    "beitl16_384": ([256, 512, 1024, 1024], "dpt"),
    "beitb16_384": ([96, 192, 384, 768], "dpt"),
    "swin2l24_384": ([192, 384, 768, 1536], "dpt"),
    "swin2b24_384": ([128, 256, 512, 1024], "dpt"),
    "swin2t16_256": ([96, 192, 384, 768], "dpt"),
    "swinl12_384": ([192, 384, 768, 1536], "dpt"),
    # The reference's own next_vit import is broken (backbones/next_vit.py:8
    # imports an absent external/ dir — SURVEY.md §7.5); ours is implemented
    # from the paper and consumed through models.dpt.
    "next_vit_large_6m": ([96, 256, 512, 1024], "dpt"),
    "levit_384": ([384, 512, 768], "dpt"),
    "vitl16_384": ([256, 512, 1024, 1024], "vit"),
    "vitb_rn50_384": ([256, 512, 768, 768], "dpt"),
    "vitb16_384": ([96, 192, 384, 768], "vit"),
    "resnext101_wsl": ([256, 512, 1024, 2048], lambda axis_name=None: ResNetBackbone(axis_name=axis_name)),
}
for _v in ("efficientnet_lite0", "efficientnet_lite1", "efficientnet_lite2",
           "efficientnet_lite3", "efficientnet_lite4"):
    ENCODER_REGISTRY[_v] = (
        lite_stage_channels(_v),
        (lambda v: lambda axis_name=None: EfficientNetLite(v, axis_name))(_v),
    )


def encoder_channels(backbone: str) -> list[int]:
    if backbone not in ENCODER_REGISTRY:
        raise ValueError(f"Backbone {backbone!r} not in registry")
    return list(ENCODER_REGISTRY[backbone][0])


def make_encoder(backbone: str, axis_name: Optional[str] = None):
    """Build the stage-sliced feature backbone for ``backbone``.

    ViT-family names are consumed directly by models/dpt.py (token backbones
    don't fit the 4-feature-map interface without the DPT reassembly).
    """
    if backbone not in ENCODER_REGISTRY:
        raise ValueError(f"Backbone {backbone!r} not in registry")
    _, builder = ENCODER_REGISTRY[backbone]
    if builder in ("vit", "dpt"):
        raise NotImplementedError(
            f"Backbone {backbone!r} is a token/hierarchical backbone consumed "
            "through models.dpt.DPTDepthModel, not the 4-feature-map interface"
        )
    return builder(axis_name=axis_name)
