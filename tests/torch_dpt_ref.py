"""Reference-naming torch reconstruction of a MiDaS DPT (token-ViT backbone).

State-dict keys match a dpt_large_384/dpt_hybrid-style checkpoint's token-ViT
surface: timm VisionTransformer under ``pretrained.model`` (fused qkv, no
LayerScale), the act_postprocess readout/project/resize Sequentials of
src/network/backbones/utils.py:144-249, `_resize_pos_embed` bilinear pos-embed
interpolation (backbones/vit.py:16-30), FeatureFusionBlock_custom cascade with
explicit size targeting (src/network/dpt_depth.py:252-257) and the monocular
head (dpt_depth.py:277-285).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Transpose(nn.Module):
    def __init__(self, d0, d1):
        super().__init__()
        self.d0, self.d1 = d0, d1

    def forward(self, x):
        return x.transpose(self.d0, self.d1)


class ProjectReadout(nn.Module):
    """backbones/utils.py:26-39: fold cls into every patch token."""

    def __init__(self, in_features, start_index=1):
        super().__init__()
        self.start_index = start_index
        self.project = nn.Sequential(nn.Linear(2 * in_features, in_features), nn.GELU())

    def forward(self, x):
        readout = x[:, 0].unsqueeze(1).expand_as(x[:, self.start_index:])
        features = torch.cat((x[:, self.start_index:], readout), -1)
        return self.project(features)


class TimmAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TimmBlock(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TimmAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TimmMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, patch)


class TimmViT(nn.Module):
    def __init__(self, dim=768, depth=12, num_heads=12, patch=16, pos_grid=24):
        super().__init__()
        self.patch = patch
        self.pos_grid = pos_grid
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, pos_grid * pos_grid + 1, dim))
        self.patch_embed = PatchEmbed(dim, patch)
        self.blocks = nn.ModuleList(TimmBlock(dim, num_heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def _resize_pos_embed(self, gh, gw):
        """backbones/vit.py:16-30."""
        posemb_tok, posemb_grid = self.pos_embed[:, :1], self.pos_embed[0, 1:]
        gs_old = int(math.sqrt(len(posemb_grid)))
        posemb_grid = posemb_grid.reshape(1, gs_old, gs_old, -1).permute(0, 3, 1, 2)
        posemb_grid = F.interpolate(posemb_grid, size=(gh, gw), mode="bilinear")
        posemb_grid = posemb_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        return torch.cat([posemb_tok, posemb_grid], dim=1)

    def forward_taps(self, x, hooks):
        b, _, h, w = x.shape
        gh, gw = h // self.patch, w // self.patch
        pos = self._resize_pos_embed(gh, gw)
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat((self.cls_token.expand(b, -1, -1), t), dim=1)
        t = t + pos
        taps = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hooks:
                taps.append(t)
        return taps


class ResidualConvUnitCustom(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1, bias=True)
        self.activation = nn.ReLU(False)  # non-inplace (dpt_depth.py:24)

    def forward(self, x):
        out = self.activation(x)
        out = self.conv1(out)
        out = self.activation(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlockCustom(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnitCustom(features)
        self.resConfUnit2 = ResidualConvUnitCustom(features)
        self.out_conv = nn.Conv2d(features, features, 1, 1, 0, bias=True)

    def forward(self, *xs, size=None):
        output = xs[0]
        if len(xs) == 2:
            output = output + self.resConfUnit1(xs[1])
        output = self.resConfUnit2(output)
        if size is None:
            output = F.interpolate(output, scale_factor=2, mode="bilinear",
                                   align_corners=True)
        else:
            output = F.interpolate(output, size=size, mode="bilinear",
                                   align_corners=True)
        return self.out_conv(output)


class DPTTorch(nn.Module):
    """Token-ViT DPT with reference naming (vitb dims by default)."""

    def __init__(self, features=64, dim=768, depth=12, num_heads=12,
                 hooks=(2, 5, 8, 11), out_channels=(96, 192, 384, 768),
                 non_negative=True):
        super().__init__()
        self.hooks = tuple(hooks)
        vit = TimmViT(dim, depth, num_heads)
        self.pretrained = nn.Module()
        self.pretrained.model = vit
        c1, c2, c3, c4 = out_channels
        self.pretrained.act_postprocess1 = nn.Sequential(
            ProjectReadout(dim), Transpose(1, 2), nn.Identity(),
            nn.Conv2d(dim, c1, 1), nn.ConvTranspose2d(c1, c1, 4, 4),
        )
        self.pretrained.act_postprocess2 = nn.Sequential(
            ProjectReadout(dim), Transpose(1, 2), nn.Identity(),
            nn.Conv2d(dim, c2, 1), nn.ConvTranspose2d(c2, c2, 2, 2),
        )
        self.pretrained.act_postprocess3 = nn.Sequential(
            ProjectReadout(dim), Transpose(1, 2), nn.Identity(),
            nn.Conv2d(dim, c3, 1),
        )
        self.pretrained.act_postprocess4 = nn.Sequential(
            ProjectReadout(dim), Transpose(1, 2), nn.Identity(),
            nn.Conv2d(dim, c4, 1), nn.Conv2d(c4, c4, 3, 2, 1),
        )
        self.scratch = nn.Module()
        for i, ch in enumerate(out_channels):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", FeatureFusionBlockCustom(features))
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True) if non_negative else nn.Identity(),
            nn.Identity(),
        )

    def forward(self, x):
        b, _, h, w = x.shape
        gh, gw = h // 16, w // 16
        taps = self.pretrained.model.forward_taps(x, self.hooks)

        def unflatten(t):
            return t.transpose(1, 2).reshape(b, -1, gh, gw)

        posts = [self.pretrained.act_postprocess1, self.pretrained.act_postprocess2,
                 self.pretrained.act_postprocess3, self.pretrained.act_postprocess4]
        levels = []
        for tap, post in zip(taps, posts):
            t = unflatten(post[0](tap))  # readout -> (B, C, gh, gw)
            for m in list(post)[3:]:
                t = m(t)
            levels.append(t)
        l1, l2, l3, l4 = levels
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4, size=r3.shape[2:])
        p3 = self.scratch.refinenet3(p4, r3, size=r2.shape[2:])
        p2 = self.scratch.refinenet2(p3, r2, size=r1.shape[2:])
        p1 = self.scratch.refinenet1(p2, r1)
        return torch.squeeze(self.scratch.output_conv(p1), dim=1)
