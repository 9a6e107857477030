"""timm-semantics torch reconstruction of a Swin V1 backbone (tiny dims).

Naming and math follow timm SwinTransformer as the reference's swin backbones
load it (src/network/backbones/swin.py + swin_common.py): 4x4 patch embed +
norm, pre-norm blocks with fused-qkv window attention and learned relative
position bias, torch.roll shifted windows with the 9-region attention mask,
and PatchMerging at stage end with timm's (even,even),(odd,even),(even,odd),
(odd,odd) concat order — the order our flax PatchMerging differs on, which the
import map's channel-group permutation must bridge.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins, ws, h, w):
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def rel_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, num_heads))

    def forward(self, x, mask=None):
        bnw, n, c = x.shape
        hd = c // self.num_heads
        qkv = self.qkv(x).reshape(bnw, n, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        bias = self.relative_position_bias_table[rel_index(self.ws).view(-1)]
        bias = bias.view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bnw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.view(bnw, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
        return self.proj(out)


class SwinBlockTorch(nn.Module):
    def __init__(self, dim, num_heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, num_heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def _mask(self, h, w, ws, shift):
        if shift == 0:
            return None
        img = torch.zeros(1, h, w, 1)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img[:, hs, wsl, :] = cnt
                cnt += 1
        win = window_partition(img, ws).view(-1, ws * ws)
        diff = win.unsqueeze(1) - win.unsqueeze(2)
        return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))

    def forward(self, x):
        b, h, w, c = x.shape
        ws = min(self.window, h, w)
        shift = self.shift if ws < min(h, w) else 0
        sc = x
        t = self.norm1(x)
        if shift > 0:
            t = torch.roll(t, (-shift, -shift), dims=(1, 2))
        wins = window_partition(t, ws)
        mask = self._mask(h, w, ws, shift)
        out = self.attn(wins, mask)
        out = window_reverse(out, ws, h, w)
        if shift > 0:
            out = torch.roll(out, (shift, shift), dims=(1, 2))
        x = sc + out
        t = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(t)))


class PatchMergingTorch(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class SwinTorch(nn.Module):
    """Stage-sliced forward: returns the four pre-downsample stage outputs."""

    def __init__(self, embed=32, depths=(2, 2, 2, 2), heads=(2, 4, 8, 16), window=8):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(embed)
        self.layers = nn.ModuleList()
        for si, (d, nh) in enumerate(zip(depths, heads)):
            dim = embed * 2 ** si
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                SwinBlockTorch(dim, nh, window, 0 if bi % 2 == 0 else window // 2)
                for bi in range(d)
            )
            if si < len(depths) - 1:
                layer.downsample = PatchMergingTorch(dim)
            self.layers.append(layer)

    def forward(self, x):
        t = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        t = self.patch_embed.norm(t)
        feats = []
        for si, layer in enumerate(self.layers):
            for blk in layer.blocks:
                t = blk(t)
            feats.append(t)
            if hasattr(layer, "downsample"):
                t = layer.downsample(t)
        return feats


class WindowAttentionV2(nn.Module):
    """timm SwinV2 attention: cosine similarity with learned clamped logit
    scale, continuous log-CPB MLP bias, separate q/v biases (k bias zero)."""

    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        self.logit_scale = nn.Parameter(torch.log(10 * torch.ones(num_heads, 1, 1)))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, num_heads, bias=False),
        )

    def _log_coords(self):
        ws = self.ws
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1).float()
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel = rel / max(ws - 1, 1) * 8.0
        return torch.sign(rel) * torch.log2(torch.abs(rel) + 1.0) / torch.log2(torch.tensor(8.0))

    def forward(self, x, mask=None):
        bnw, n, c = x.shape
        hd = c // self.num_heads
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale,
                            max=torch.log(torch.tensor(100.0))).exp()
        attn = attn * scale
        bias = self.cpb_mlp(self._log_coords()).permute(2, 0, 1)
        attn = attn + 16.0 * torch.sigmoid(bias)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bnw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.view(bnw, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
        return self.proj(out)


class SwinBlockTorchV2(SwinBlockTorch):
    """Post-norm V2 block over WindowAttentionV2."""

    def __init__(self, dim, num_heads, window, shift):
        nn.Module.__init__(self)
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttentionV2(dim, num_heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        b, h, w, c = x.shape
        ws = min(self.window, h, w)
        shift = self.shift if ws < min(h, w) else 0
        t = x
        if shift > 0:
            t = torch.roll(t, (-shift, -shift), dims=(1, 2))
        wins = window_partition(t, ws)
        out = self.attn(wins, self._mask(h, w, ws, shift))
        out = window_reverse(out, ws, h, w)
        if shift > 0:
            out = torch.roll(out, (shift, shift), dims=(1, 2))
        x = x + self.norm1(out)
        return x + self.norm2(self.mlp.fc2(F.gelu(self.mlp.fc1(x))))


class PatchMergingTorchV2(nn.Module):
    """V2: reduction first (timm concat order), then norm on 2C."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.norm(self.reduction(x))


class SwinTorchV2(SwinTorch):
    def __init__(self, embed=32, depths=(2, 2, 2, 2), heads=(2, 4, 8, 16), window=2):
        nn.Module.__init__(self)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(embed)
        self.layers = nn.ModuleList()
        for si, (d, nh) in enumerate(zip(depths, heads)):
            dim = embed * 2 ** si
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                SwinBlockTorchV2(dim, nh, window, 0 if bi % 2 == 0 else window // 2)
                for bi in range(d)
            )
            if si < len(depths) - 1:
                layer.downsample = PatchMergingTorchV2(dim)
            self.layers.append(layer)
