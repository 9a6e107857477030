from . import config
from .config import ConfigNode

__all__ = ["config", "ConfigNode"]
