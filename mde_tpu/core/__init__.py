from . import compilation_cache, config
from .config import ConfigNode

__all__ = ["compilation_cache", "config", "ConfigNode"]
