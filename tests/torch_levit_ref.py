"""timm-semantics torch reconstruction of dpt_levit_224 (levit_384 trunk).

Naming matches the real checkpoint surface: timm levit_384 under
``pretrained.model`` (ConvNorm stem ``patch_embed.{0,2,4,6}``, flat ``blocks``
Sequential with Residual-wrapped Attention/FFN and unwrapped
AttentionSubsample, LinearNorm 'c'+'bn' everywhere, insertion-order
attention-bias tables), plus the MiDaS DPT side: 3-level scratch,
``scratch.stem_transpose`` ConvTransposeNorm pair and the
head_features_1=64/head_features_2=8 monocular head
(src/network/backbones/levit.py, dpt_depth.py:219-222,269-287).
"""

from __future__ import annotations

import itertools

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_dpt_ref import FeatureFusionBlockCustom


class ConvNorm(nn.Module):
    def __init__(self, in_ch, out_ch, k=1, stride=1, pad=0):
        super().__init__()
        self.c = nn.Conv2d(in_ch, out_ch, k, stride, pad, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return self.bn(self.c(x))


class ConvTransposeNorm(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, stride=2, pad=1):
        super().__init__()
        self.c = nn.ConvTranspose2d(in_ch, out_ch, k, stride, pad, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return self.bn(self.c(x))


class LinearNorm(nn.Module):
    def __init__(self, in_f, out_f):
        super().__init__()
        self.c = nn.Linear(in_f, out_f, bias=False)
        self.bn = nn.BatchNorm1d(out_f)

    def forward(self, x):
        x = self.c(x)
        return self.bn(x.flatten(0, 1)).reshape_as(x)


class Residual(nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, x):
        return x + self.m(x)


def _bias_idxs(res, stride=1):
    pts = list(itertools.product(range(res), range(res)))
    qpts = pts if stride == 1 else [
        (i, j) for i in range(0, res, stride) for j in range(0, res, stride)
    ]
    order, rows = {}, []
    for p1 in qpts:
        row = []
        for p2 in pts:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in order:
                order[off] = len(order)
            row.append(order[off])
        rows.append(row)
    return torch.tensor(rows, dtype=torch.long), len(order)


class Attention(nn.Module):
    def __init__(self, dim, kd, nh, attn_ratio, res):
        super().__init__()
        self.nh, self.kd, self.vd = nh, kd, kd * attn_ratio
        h = nh * (2 * kd + self.vd)
        self.qkv = LinearNorm(dim, h)
        self.proj = nn.Sequential(nn.Hardswish(), LinearNorm(nh * self.vd, dim))
        idxs, nuniq = _bias_idxs(res)
        self.register_buffer("attention_bias_idxs", idxs)
        self.attention_biases = nn.Parameter(torch.zeros(nh, nuniq))

    def forward(self, x):
        b, n, c = x.shape
        h = self.qkv(x).view(b, n, self.nh, -1)
        q, k, v = h.split([self.kd, self.kd, self.vd], dim=3)
        attn = (q.permute(0, 2, 1, 3) @ k.permute(0, 2, 3, 1)) * self.kd ** -0.5
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        out = (attn @ v.permute(0, 2, 1, 3)).transpose(1, 2).reshape(b, n, -1)
        return self.proj(out)


class Subsample(nn.Module):
    def __init__(self, stride, res):
        super().__init__()
        self.stride, self.res = stride, res

    def forward(self, x):
        b, n, c = x.shape
        x = x.view(b, self.res, self.res, c)[:, ::self.stride, ::self.stride]
        return x.reshape(b, -1, c)


class AttentionSubsample(nn.Module):
    def __init__(self, in_dim, out_dim, kd, nh, attn_ratio, res, stride):
        super().__init__()
        self.nh, self.kd, self.vd = nh, kd, kd * attn_ratio
        self.kv = LinearNorm(in_dim, nh * (kd + self.vd))
        self.q = nn.Sequential(Subsample(stride, res), LinearNorm(in_dim, nh * kd))
        self.proj = nn.Sequential(nn.Hardswish(), LinearNorm(nh * self.vd, out_dim))
        idxs, nuniq = _bias_idxs(res, stride)
        self.register_buffer("attention_bias_idxs", idxs)
        self.attention_biases = nn.Parameter(torch.zeros(nh, nuniq))

    def forward(self, x):
        b, n, c = x.shape
        kv = self.kv(x).view(b, n, self.nh, -1)
        k, v = kv.split([self.kd, self.vd], dim=3)
        q = self.q(x).view(b, -1, self.nh, self.kd)
        attn = (q.permute(0, 2, 1, 3) @ k.permute(0, 2, 3, 1)) * self.kd ** -0.5
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        out = (attn @ v.permute(0, 2, 1, 3)).transpose(1, 2).reshape(b, q.shape[1], -1)
        return self.proj(out)


def _ffn(dim):
    return Residual(nn.Sequential(
        LinearNorm(dim, dim * 2), nn.Hardswish(), LinearNorm(dim * 2, dim)))


class Levit384(nn.Module):
    """timm levit_384 forward_features with hook taps at flat blocks."""

    def __init__(self):
        super().__init__()
        widths = (48, 96, 192, 384)
        stem, in_ch = [], 3
        for wch in widths:
            stem.append(ConvNorm(in_ch, wch, 3, 2, 1))
            stem.append(nn.Hardswish())
            in_ch = wch
        self.patch_embed = nn.Sequential(*stem[:-1])  # no act after last conv

        dims, heads, grids = (384, 512, 768), (6, 9, 12), (14, 7, 4)
        blocks = []
        for si in range(3):
            if si > 0:
                in_dim, out_dim = dims[si - 1], dims[si]
                blocks.append(AttentionSubsample(
                    in_dim, out_dim, 32, in_dim // 32, 4, grids[si - 1], 2))
                blocks.append(_ffn(out_dim))
            for _ in range(4):
                blocks.append(Residual(Attention(dims[si], 32, heads[si], 2, grids[si])))
                blocks.append(_ffn(dims[si]))
        self.blocks = nn.Sequential(*blocks)

    def forward_taps(self, x, hooks=(3, 11, 21)):
        t = self.patch_embed(x)
        b, c, gh, gw = t.shape
        t = t.flatten(2).transpose(1, 2)
        taps = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hooks:
                taps.append(t)
        return taps


class DPTLevitTorch(nn.Module):
    def __init__(self, features=256):
        super().__init__()
        self.pretrained = nn.Module()
        self.pretrained.model = Levit384()
        self.scratch = nn.Module()
        for i, ch in enumerate((384, 512, 768)):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        for i in (1, 2, 3):
            setattr(self.scratch, f"refinenet{i}", FeatureFusionBlockCustom(features))
        self.scratch.stem_transpose = nn.Sequential(
            ConvTransposeNorm(features, features // 2), nn.Hardswish(),
            ConvTransposeNorm(features // 2, features // 4), nn.Hardswish(),
        )
        hf1, hf2 = features // 4, 8
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(hf1, hf1 // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(hf1 // 2, hf2, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(hf2, 1, 1),
            nn.ReLU(True),
            nn.Identity(),
        )

    def forward(self, x):
        b = x.shape[0]
        taps = self.pretrained.model.forward_taps(x)
        grids = (14, 7, 4)
        levels = [t.transpose(1, 2).reshape(b, -1, g, g)
                  for t, g in zip(taps, grids)]
        r1 = self.scratch.layer1_rn(levels[0])
        r2 = self.scratch.layer2_rn(levels[1])
        r3 = self.scratch.layer3_rn(levels[2])
        p3 = self.scratch.refinenet3(r3, size=r2.shape[2:])
        p2 = self.scratch.refinenet2(p3, r2, size=r1.shape[2:])
        p1 = self.scratch.refinenet1(p2, r1)
        p1 = self.scratch.stem_transpose(p1)
        return torch.squeeze(self.scratch.output_conv(p1), dim=1)
