"""Misc utilities shared across the framework (the grab-bag role of the
reference's src/util.py non-loss helpers)."""

from __future__ import annotations

import os


def ensure_dir(directory: str) -> None:
    """mkdir -p (src/util.py:288-290)."""
    os.makedirs(directory, exist_ok=True)


def remove_module_prefix(state_dict: dict) -> dict:
    """Strip one leading 'module.' from every key (DataParallel checkpoints,
    src/util.py:14-22). Re-exported from train.torch_import for convenience."""
    from ..train.torch_import import remove_module_prefix as _strip

    return {_strip(k): v for k, v in state_dict.items()}


def count_params(params) -> int:
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
