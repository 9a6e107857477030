from .simple_unet import SimpleUNet, UNetBlock

__all__ = ["SimpleUNet", "UNetBlock"]
