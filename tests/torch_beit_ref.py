"""timm-semantics torch reconstruction of a DPT-BEiT (beitb16-style trunk).

Per-block decomposed relative position bias with timm's cls-slot tail order
[cls->tok, tok->cls, cls->cls], fused qkv with separate q/v biases (k zero),
gamma_1/gamma_2 LayerScale residuals, no absolute pos-embed. DPT side reuses
the act_postprocess/scratch/head of tests/torch_dpt_ref.py.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_dpt_ref import (
    DPTTorch,
    ProjectReadout,
    TimmMlp,
)


def _beit_rel_index(h, w):
    coords = torch.stack(torch.meshgrid(
        torch.arange(h), torch.arange(w), indexing="ij"))
    flat = coords.flatten(1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    num_rel = (2 * h - 1) * (2 * w - 1)
    idx = torch.zeros((h * w + 1, h * w + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel      # cls -> token
    idx[0:, 0] = num_rel + 1  # token -> cls
    idx[0, 0] = num_rel + 2   # cls -> cls
    return idx


class BeitAttention(nn.Module):
    def __init__(self, dim, num_heads, grid):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        num_rel = (2 * grid[0] - 1) * (2 * grid[1] - 1)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel + 3, num_heads))
        self.register_buffer("relative_position_index", _beit_rel_index(*grid))

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = (attn + bias.unsqueeze(0)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class BeitBlock(nn.Module):
    def __init__(self, dim, num_heads, grid):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BeitAttention(dim, num_heads, grid)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TimmMlp(dim, dim * 4)
        self.gamma_1 = nn.Parameter(torch.ones(dim))
        self.gamma_2 = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        return x + self.gamma_2 * self.mlp(self.norm2(x))


class BeitTrunk(nn.Module):
    def __init__(self, dim=768, depth=12, num_heads=12, patch=16, grid=(4, 6)):
        super().__init__()
        self.patch = patch
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.blocks = nn.ModuleList(
            BeitBlock(dim, num_heads, grid) for _ in range(depth))

    def forward_taps(self, x, hooks):
        b = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat((self.cls_token.expand(b, -1, -1), t), dim=1)
        taps = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hooks:
                taps.append(t)
        return taps


class DPTBeitTorch(DPTTorch):
    """DPTTorch with the ViT trunk swapped for BEiT (same reassembly/scratch)."""

    def __init__(self, features=64, grid=(4, 6)):
        super().__init__(features=features)
        self.pretrained.model = BeitTrunk(grid=grid)
