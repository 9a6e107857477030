"""Reference-naming torch reconstruction of MiDaS v2.1 (MidasNet).

State-dict keys match what a real midas_v21_384.pt carries: the torchvision
ResNeXt bottleneck naming under the _make_resnet_backbone Sequential slicing
(src/network/blocks.py:189-199 — pretrained.layer1 = Sequential(conv1, bn1,
relu, maxpool, resnet.layer1); layer2..4 raw stages), plain FeatureFusionBlocks
(blocks.py:282-314: in-place `output += rcu1(skip)`, 2x align_corners=True
upsample) and the v2.1 head Sequential (src/network/midas_net.py:37-44).

Depth is parameterizable so the parity test can run a reduced (2,2,2,2)
encoder — every per-block op is identical to the full (3,4,23,3) WSL net.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, groups=32, base_width=8,
                 downsample=False):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * self.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * self.expansion),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


def _make_stage(inplanes, planes, blocks, stride):
    layers = [Bottleneck(inplanes, planes, stride,
                         downsample=(stride != 1 or inplanes != planes * 4))]
    for _ in range(1, blocks):
        layers.append(Bottleneck(planes * 4, planes))
    return nn.Sequential(*layers)


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        out = self.relu(x)
        out = self.conv1(out)
        out = self.relu(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)

    def forward(self, *xs):
        output = xs[0]
        if len(xs) == 2:
            output = output + self.resConfUnit1(xs[1])
        output = self.resConfUnit2(output)
        return F.interpolate(output, scale_factor=2, mode="bilinear",
                             align_corners=True)


class MidasNetTorch(nn.Module):
    def __init__(self, features=256, layers=(3, 4, 23, 3), non_negative=True):
        super().__init__()
        stem_conv = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        stem_bn = nn.BatchNorm2d(64)
        stage1 = _make_stage(64, 64, layers[0], 1)
        self.pretrained = nn.Module()
        self.pretrained.layer1 = nn.Sequential(
            stem_conv, stem_bn, nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1), stage1
        )
        self.pretrained.layer2 = _make_stage(256, 128, layers[1], 2)
        self.pretrained.layer3 = _make_stage(512, 256, layers[2], 2)
        self.pretrained.layer4 = _make_stage(1024, 512, layers[3], 2)

        self.scratch = nn.Module()
        for i, ch in enumerate((256, 512, 1024, 2048)):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", FeatureFusionBlock(features))
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, 128, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            nn.Conv2d(128, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1, 1, 0),
            nn.ReLU(True) if non_negative else nn.Identity(),
        )

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4)
        p3 = self.scratch.refinenet3(p4, r3)
        p2 = self.scratch.refinenet2(p3, r2)
        p1 = self.scratch.refinenet1(p2, r1)
        return torch.squeeze(self.scratch.output_conv(p1), dim=1)
