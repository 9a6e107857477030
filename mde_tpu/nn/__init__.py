from .blocks import (
    Conv,
    ConvTranspose,
    ResidualConvUnit,
    ResidualConvUnitCustom,
    FeatureFusionBlock,
    FeatureFusionBlockCustom,
    ScratchConvs,
)

__all__ = [
    "Conv",
    "ConvTranspose",
    "ResidualConvUnit",
    "ResidualConvUnitCustom",
    "FeatureFusionBlock",
    "FeatureFusionBlockCustom",
    "ScratchConvs",
]
