from .blocks import (
    Conv,
    ConvTranspose,
    ResidualConvUnit,
    ResidualConvUnitCustom,
    FeatureFusionBlock,
    FeatureFusionBlockCustom,
    ScratchConvs,
)
from .fuse import discover_conv_bn_pairs, fold_conv_bn, fuse_model_params

__all__ = [
    "Conv",
    "ConvTranspose",
    "ResidualConvUnit",
    "ResidualConvUnitCustom",
    "FeatureFusionBlock",
    "FeatureFusionBlockCustom",
    "ScratchConvs",
    "discover_conv_bn_pairs",
    "fold_conv_bn",
    "fuse_model_params",
]
