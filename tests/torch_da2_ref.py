"""Depth-Anything-V2 (small) torch reconstruction for import-map parity.

Reference-naming torch build of the DA-V2 release architecture — DINOv2 trunk
named ``pretrained``, DPT head named ``depth_head`` — as the checkpoint-side
fixture for tests/test_da2_torch_parity.py. The building blocks are reused
from tests/torch_flagship_ref.py (the reference itself vendored this head
from Depth-Anything: /root/reference/src/network/dpt_depth.py:32-153), with
the DA-V2 release deltas on top:

- arbitrary trunk tap indices ([2, 5, 8, 11] for vits, the DA-V2 model card's
  ``intermediate_layer_idx``) instead of last-4;
- head at features=64 with out_channels (48, 96, 192, 384);
- ``scratch.output_conv2`` carries the full depth tail
  [conv->32, ReLU, conv->1, ReLU, Identity], so the final 1x1 lives at
  checkpoint key ``depth_head.scratch.output_conv2.2`` — mapped to
  models/depth_anything.py's top-level ``final`` conv by
  train/torch_import.py::map_depth_anything_key.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_flagship_ref import (
    DinoVisionTransformer,
    FeatureFusionBlock_custom,
    _Scratch,
)


class DA2Trunk(DinoVisionTransformer):
    """DINOv2 trunk with taps at arbitrary block indices (DA-V2 semantics:
    get_intermediate_layers(x, idx, norm=True), patch tokens only)."""

    def get_intermediate_layers_at(self, x, idx):
        b, _, h, w = x.shape
        ph, pw = h // self.patch, w // self.patch
        t = self.patch_embed(x).flatten(2).transpose(1, 2)
        cls_pos, patch_pos = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        if (ph, pw) != tuple(self.pos_grid):
            grid = patch_pos.reshape(1, *self.pos_grid, -1).permute(0, 3, 1, 2)
            sx = float(ph + 0.1) / self.pos_grid[0]
            sy = float(pw + 0.1) / self.pos_grid[1]
            grid = F.interpolate(
                grid, scale_factor=(sx, sy), mode="bicubic", antialias=False
            )
            assert grid.shape[-2:] == (ph, pw)
            patch_pos = grid.permute(0, 2, 3, 1).reshape(1, ph * pw, -1)
        t = t + patch_pos
        cls = (self.cls_token + cls_pos).expand(b, -1, -1)
        t = torch.cat([cls, t], dim=1)
        want = set(idx)
        outs = {}
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in want:
                outs[i] = t
        return [self.norm(outs[i])[:, 1:] for i in idx]


class DPTHeadDA2(nn.Module):
    """DA-V2 DPTHead (use_clstoken=False): projects + resize_layers + scratch
    cascade, output_conv1, bilinear to the 14x grid, output_conv2 tail."""

    def __init__(self, in_channels=384, features=64, out_channels=(48, 96, 192, 384)):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(in_channels, c, 1) for c in out_channels]
        )
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(out_channels[0], out_channels[0], 4, 4, 0),
            nn.ConvTranspose2d(out_channels[1], out_channels[1], 2, 2, 0),
            nn.Identity(),
            nn.Conv2d(out_channels[3], out_channels[3], 3, 2, 1),
        ])
        self.scratch = _Scratch()
        for i, c in enumerate(out_channels):
            self.scratch.add_module(
                f"layer{i + 1}_rn", nn.Conv2d(c, features, 3, 1, 1, bias=False)
            )
        for i in range(1, 5):
            self.scratch.add_module(
                f"refinenet{i}", FeatureFusionBlock_custom(features, expand=False)
            )
        self.scratch.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        self.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True),
            nn.Identity(),
        )

    def forward(self, taps, ph, pw):
        outs = []
        for i, t in enumerate(taps):
            g = t.permute(0, 2, 1).reshape(t.shape[0], t.shape[-1], ph, pw)
            outs.append(self.resize_layers[i](self.projects[i](g)))
        l1 = self.scratch.layer1_rn(outs[0])
        l2 = self.scratch.layer2_rn(outs[1])
        l3 = self.scratch.layer3_rn(outs[2])
        l4 = self.scratch.layer4_rn(outs[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = F.interpolate(out, (ph * 14, pw * 14), mode="bilinear", align_corners=True)
        return self.scratch.output_conv2(out)


class DepthAnythingV2Torch(nn.Module):
    """vits composition: trunk taps [2, 5, 8, 11] -> DPTHeadDA2 -> (B, H, W)."""

    def __init__(self, idx=(2, 5, 8, 11), features=64,
                 out_channels=(48, 96, 192, 384)):
        super().__init__()
        self.idx = tuple(idx)
        self.pretrained = DA2Trunk()
        self.depth_head = DPTHeadDA2(384, features, out_channels)

    def forward(self, x):
        _, _, h, w = x.shape
        ph, pw = h // 14, w // 14
        taps = self.pretrained.get_intermediate_layers_at(x, self.idx)
        return self.depth_head(taps, ph, pw).squeeze(1)
