from .simple_unet import SimpleUNet, UNetBlock
from .midas_small import MidasNetSmall, DGR
from .midas_semantics import MidasNetSemantics, CrossAttention, ResidualBlock, Dinov2Head
from .midas_net import MidasNet
from .dpt import DPT, DPTDepthModel
from .localbins import LocalBinsBlock
from .depth_anything import DepthAnythingV2
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
    "DepthAnythingV2",
    "build_model",
    "init_model",
]
