"""timm-semantics torch reconstruction of the hybrid ResNetV2 stem.

Matches timm's vit_base_r50_s16_384 backbone as the reference loads it
(src/network/backbones/vit.py:120-205): StdConv2dSame (weight standardization
eps 1e-6 + TF-SAME asymmetric padding), GroupNormAct(32) pre-activation
bottlenecks, 'same' stem with MaxPool2dSame, layers (3, 4, 9). Naming matches
the checkpoint surface (stem.conv/stem.norm, stages.N.blocks.M.*).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _same_pad(size, k, s):
    if size % s == 0:
        total = max(k - s, 0)
    else:
        total = max(k - (size % s), 0)
    return total // 2, total - total // 2


class StdConv2dSame(nn.Conv2d):
    def __init__(self, in_ch, out_ch, k, stride=1, bias=False):
        super().__init__(in_ch, out_ch, k, stride, 0, bias=bias)

    def forward(self, x):
        ph = _same_pad(x.shape[2], self.kernel_size[0], self.stride[0])
        pw = _same_pad(x.shape[3], self.kernel_size[1], self.stride[1])
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        w = self.weight
        w = (w - w.mean(dim=(1, 2, 3), keepdim=True)) / torch.sqrt(
            w.var(dim=(1, 2, 3), unbiased=False, keepdim=True) + 1e-6)
        return F.conv2d(x, w, self.bias, self.stride, 0)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, ch):
        super().__init__(32, ch, eps=1e-5)

    def forward(self, x):
        return F.relu(super().forward(x))


class PreActBottleneckTorch(nn.Module):
    def __init__(self, in_ch, planes, stride=1):
        super().__init__()
        out_ch = planes * 4
        self.norm1 = GroupNormAct(in_ch)
        self.conv1 = StdConv2dSame(in_ch, planes, 1)
        self.norm2 = GroupNormAct(planes)
        self.conv2 = StdConv2dSame(planes, planes, 3, stride)
        self.norm3 = GroupNormAct(planes)
        self.conv3 = StdConv2dSame(planes, out_ch, 1)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2dSame(in_ch, out_ch, 1, stride)

    def forward(self, x):
        x_preact = self.norm1(x)
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.conv(x_preact)
        out = self.conv1(x_preact)
        out = self.conv2(self.norm2(out))
        out = self.conv3(self.norm3(out))
        return out + shortcut


class ResNetV2Torch(nn.Module):
    """Returns (stage1 /4, stage2 /8, final /16)."""

    def __init__(self, layers=(3, 4, 9)):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = StdConv2dSame(3, 64, 7, 2)
        self.stem.norm = GroupNormAct(64)
        self.stages = nn.ModuleList()
        in_ch = 64
        for si, depth in enumerate(layers):
            planes = 64 * 2 ** si
            stage = nn.Module()
            blocks = []
            for bi in range(depth):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(PreActBottleneckTorch(in_ch, planes, stride))
                in_ch = planes * 4
            stage.blocks = nn.ModuleList(blocks)
            self.stages.append(stage)

    def forward(self, x):
        t = self.stem.norm(self.stem.conv(x))
        ph = _same_pad(t.shape[2], 3, 2)
        pw = _same_pad(t.shape[3], 3, 2)
        t = F.pad(t, (pw[0], pw[1], ph[0], ph[1]), value=float("-inf"))
        t = F.max_pool2d(t, 3, 2)
        feats = []
        for stage in self.stages:
            for blk in stage.blocks:
                t = blk(t)
            feats.append(t)
        return feats
