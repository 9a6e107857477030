from .resize import resize_bilinear, upsample2x
from .window_attention import windowed_cross_attention
from . import image

__all__ = ["resize_bilinear", "upsample2x", "windowed_cross_attention", "image"]
