from .simple_unet import SimpleUNet, UNetBlock
from .midas_small import MidasNetSmall, DGR
from .midas_semantics import MidasNetSemantics, CrossAttention, ResidualBlock, Dinov2Head
from .midas_net import MidasNet
from .dpt import DPT, DPTDepthModel
from .localbins import LocalBinsBlock
from .factory import build_model, init_model

__all__ = [
    "SimpleUNet",
    "UNetBlock",
    "MidasNetSmall",
    "DGR",
    "MidasNetSemantics",
    "CrossAttention",
    "ResidualBlock",
    "Dinov2Head",
    "MidasNet",
    "DPT",
    "DPTDepthModel",
    "LocalBinsBlock",
    "build_model",
    "init_model",
]
