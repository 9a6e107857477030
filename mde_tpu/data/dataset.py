"""List-file depth dataset (host side: decode only).

Mirrors the reference ``DepthDataset`` contract (src/dataset.py:8-70): a
whitespace-split list file of ``<rgb>.png <depth>.npy`` pairs (train) or lines
whose first token is the RGB file (test), loaded relative to ``data_dir``. The
third element returned per sample is the raw list-file entry, used downstream to
name predictions (src/util.py:318 takes ``filenames[i].split(' ')[1]``).

Unlike the reference, no tensor transforms happen here — the host's only job is
decoding PNG -> uint8 HWC and ``np.load`` -> float32 depth; every resize/augment/
normalize runs batched on-device (see data/transforms.py). This keeps the host
loop cheap enough to overlap fully with TPU compute.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image


class DepthDataset:
    def __init__(self, data_dir: str, list_file: str, has_gt: bool = True):
        self.data_dir = data_dir
        self.has_gt = has_gt
        with open(list_file, "r") as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        self.entries = lines
        self.pairs = [ln.split() for ln in lines]

    def __len__(self) -> int:
        return len(self.entries)

    def paths(self, idx: int) -> tuple[str, Optional[str]]:
        tokens = self.pairs[idx]
        rgb = os.path.join(self.data_dir, tokens[0])
        depth = os.path.join(self.data_dir, tokens[1]) if self.has_gt else None
        return rgb, depth

    def load(self, idx: int) -> tuple[np.ndarray, Optional[np.ndarray], str]:
        """Returns (rgb uint8 HWC, depth float32 HW or None, list-file entry)."""
        tokens = self.pairs[idx]
        rgb_path = os.path.join(self.data_dir, tokens[0])
        rgb = np.asarray(Image.open(rgb_path).convert("RGB"), dtype=np.uint8)
        depth = None
        if self.has_gt:
            depth_path = os.path.join(self.data_dir, tokens[1])
            depth = np.load(depth_path).astype(np.float32)
        return rgb, depth, self.entries[idx]


def split_train_val(n: int, val_fraction: float = 0.15, seed: int = 0):
    """Deterministic 85/15 split.

    The reference uses ``torch.manual_seed(0)`` + ``random_split``
    (src/main.py:610-619); torch's Philox stream is not reproducible from JAX, so
    we document a fixed numpy permutation instead (SURVEY.md §7.4 item 6). Same
    sizes (train = int(0.85 * n)), different membership — acceptable because the
    reference's split is arbitrary.
    """
    train_size = int((1.0 - val_fraction) * n)
    perm = np.random.default_rng(seed).permutation(n)
    return perm[:train_size], perm[train_size:]
