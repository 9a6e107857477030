"""Reference-stack CPU baseline measurement.

The reference cannot run verbatim in this environment (no timm/kornia/torch.hub
downloads — SURVEY.md §1 external weights), so this script measures an
architecture-equivalent PyTorch implementation of the flagship config
(MiDaS_small + frozen DINOv2-ViT-S/14 semantics branch, 448x576, batch 4, AdamW
+ scale-invariant loss — src/configs/config.yaml + src/main.py:26-31) built
independently from the same published architecture specs this framework uses.
It is deliberately *favorable* to the reference: efficient batched windowed
attention instead of the reference's Python window loop, no host data loading,
no wandb, inference_mode-free.

Writes benchmarks/baseline_cpu.json: {"train_images_per_sec": ..., metadata}.
bench.py reads that file to compute vs_baseline.
"""

from __future__ import annotations

import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


# ---------------- EfficientNet-Lite3 (spec-identical to mde_tpu/nn/efficientnet.py)
def _round_filters(f, w, d=8):
    f *= w
    new = max(d, int(f + d / 2) // d * d)
    if new < 0.9 * f:
        new += d
    return int(new)


class MBConvLite(nn.Module):
    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        layers = []
        if e != 1:
            layers += [nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.ReLU6(True)]
        layers += [
            nn.Conv2d(mid, mid, k, s, k // 2, groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU6(True),
            nn.Conv2d(mid, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
        ]
        self.block = nn.Sequential(*layers)
        self.residual = s == 1 and cin == cout

    def forward(self, x):
        h = self.block(x)
        return h + x if self.residual else h


class EffLite3Encoder(nn.Module):
    STAGES = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
              (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]

    def __init__(self, width=1.2, depth=1.4):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32), nn.ReLU6(True))
        cin = 32
        self.stages = nn.ModuleList()
        for si, (e, c, r, s, k) in enumerate(self.STAGES):
            cout = _round_filters(c, width)
            reps = r if si in (0, 6) else int(math.ceil(r * depth))
            blocks = []
            for bi in range(reps):
                blocks.append(MBConvLite(cin, cout, k, s if bi == 0 else 1, e))
                cin = cout
            self.stages.append(nn.Sequential(*blocks))

    def forward(self, x):
        h = self.stem(x)
        feats = []
        for st in self.stages:
            h = st(h)
            feats.append(h)
        return feats[1], feats[2], feats[4], feats[6]  # 32/48/136/384


# ---------------- Decoder (RefineNet-custom, expand)
class RCU(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.c1 = nn.Conv2d(c, c, 3, 1, 1)
        self.c2 = nn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        h = self.c1(F.relu(x))
        h = self.c2(F.relu(h))
        return h + x


class FFB(nn.Module):
    def __init__(self, c, expand):
        super().__init__()
        self.r1 = RCU(c)
        self.r2 = RCU(c)
        self.out = nn.Conv2d(c, c // 2 if expand else c, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.r1(skip)
        x = self.r2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out(x)


# ---------------- ViT-S/14 (DINOv2 architecture, random init, frozen)
class ViTBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.n1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.g1 = nn.Parameter(torch.full((d,), 1e-5))
        self.n2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d))
        self.g2 = nn.Parameter(torch.full((d,), 1e-5))

    def forward(self, x):
        h = self.n1(x)
        h, _ = self.attn(h, h, h, need_weights=False)
        x = x + self.g1 * h
        return x + self.g2 * self.mlp(self.n2(x))


class ViTS14(nn.Module):
    def __init__(self, d=384, depth=12, heads=6):
        super().__init__()
        self.patch = nn.Conv2d(3, d, 14, 14)
        self.blocks = nn.ModuleList([ViTBlock(d, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(d)
        self.pos = nn.Parameter(torch.zeros(1, 16 * 20 + 1, d))
        self.cls = nn.Parameter(torch.zeros(1, 1, d))

    def forward(self, x):
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls.expand(t.shape[0], -1, -1), t], 1) + self.pos
        outs = []
        for i, b in enumerate(self.blocks):
            t = b(t)
            if i >= len(self.blocks) - 4:
                outs.append(self.norm(t)[:, 1:])
        return outs


class Dinov2Head(nn.Module):
    def __init__(self, din=384, feats=128, out_ch=(128, 256, 512, 512)):
        super().__init__()
        self.proj = nn.ModuleList([nn.Conv2d(din, c, 1) for c in out_ch])
        self.resize = nn.ModuleList([
            nn.ConvTranspose2d(out_ch[0], out_ch[0], 4, 4),
            nn.ConvTranspose2d(out_ch[1], out_ch[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(out_ch[3], out_ch[3], 3, 2, 1),
        ])
        self.rn = nn.ModuleList([nn.Conv2d(c, feats, 3, 1, 1, bias=False) for c in out_ch])
        self.ffb = nn.ModuleList([FFB(feats, False) for _ in range(4)])
        self.out1 = nn.Conv2d(feats, feats // 2, 3, 1, 1)
        self.out2 = nn.Conv2d(feats // 2, 32, 3, 1, 1)

    def forward(self, taps, ph, pw):
        lv = []
        for i, t in enumerate(taps):
            g = t.transpose(1, 2).reshape(t.shape[0], -1, ph, pw)
            lv.append(self.resize[i](self.proj[i](g)))
        l1, l2, l3, l4 = [rn(v) for rn, v in zip(self.rn, lv)]
        p4 = self.ffb[3](l4)
        p4 = F.interpolate(p4, size=l3.shape[2:], mode="bilinear", align_corners=True)
        p3 = F.interpolate(self.ffb[2](p4, l3), size=l2.shape[2:], mode="bilinear", align_corners=True)
        p2 = F.interpolate(self.ffb[1](p3, l2), size=l1.shape[2:], mode="bilinear", align_corners=True)
        p1 = self.ffb[0](p2, l1)
        out = self.out1(p1)
        out = F.interpolate(out, (ph * 14, pw * 14), mode="bilinear", align_corners=True)
        return F.relu(self.out2(out))


class WindowedCrossAttention(nn.Module):
    def __init__(self, dim=32, heads=8, ws=16):
        super().__init__()
        self.h, self.ws, self.dim = heads, ws, dim
        self.red = nn.Sequential(*[m for _ in range(3) for m in
                                   (nn.Conv2d(dim, dim, 3, 2, 1), nn.BatchNorm2d(dim), nn.ReLU(True))])
        self.nq, self.nk, self.nv, self.no = (nn.LayerNorm(dim) for _ in range(4))
        self.q, self.k, self.v = (nn.Linear(dim, dim, bias=False) for _ in range(3))
        self.proj = nn.Linear(dim, dim)
        self.up = nn.Sequential(*[m for _ in range(3) for m in
                                  (nn.ConvTranspose2d(dim, dim, 4, 2, 1), nn.BatchNorm2d(dim), nn.ReLU(True))])

    def forward(self, x, ctx):
        b, c, H, W = x.shape
        xr, cr = self.red(x), self.red(ctx)
        h, w = xr.shape[2:]
        ws = self.ws
        hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
        xr = F.pad(xr, (0, wp - w, 0, hp - h))
        cr = F.pad(cr, (0, wp - w, 0, hp - h))

        def windows(t):
            t = t.reshape(b, c, hp // ws, ws, wp // ws, ws).permute(0, 2, 4, 3, 5, 1)
            return t.reshape(b, -1, ws * ws, c)

        q = self.q(self.nq(windows(xr)))
        k = self.k(self.nk(windows(cr)))
        v = self.v(self.nv(windows(cr)))
        hd = c // self.h
        def split(t):
            return t.reshape(b, t.shape[1], t.shape[2], self.h, hd)
        att = torch.einsum("bnqhd,bnkhd->bnhqk", split(q), split(k)) * hd**-0.5
        att = att.softmax(-1)
        o = torch.einsum("bnhqk,bnkhd->bnqhd", att, split(v)).reshape(b, -1, ws * ws, c)
        o = self.proj(self.no(o))
        o = o.reshape(b, hp // ws, wp // ws, ws, ws, c).permute(0, 5, 1, 3, 2, 4)
        o = o.reshape(b, c, hp, wp)[:, :, :h, :w]
        return self.up(o) + x


class ResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.sc = (nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout))
                   if cin != cout else nn.Identity())

    def forward(self, x):
        h = F.relu(self.b1(self.c1(x)))
        h = self.b2(self.c2(h))
        return F.relu(h + self.sc(x))


class FlagshipTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = EffLite3Encoder()
        chans = (32, 48, 136, 384)
        feats = (64, 128, 256, 512)
        self.rn = nn.ModuleList([nn.Conv2d(c, f, 3, 1, 1, bias=False) for c, f in zip(chans, feats)])
        self.ffb4 = FFB(512, True)
        self.ffb3 = FFB(256, True)
        self.ffb2 = FFB(128, True)
        self.ffb1 = FFB(64, False)
        self.head0 = nn.Conv2d(64, 32, 3, 1, 1)
        self.head2 = nn.Conv2d(32, 32, 3, 1, 1)
        self.vit = ViTS14()
        for p in self.vit.parameters():
            p.requires_grad = False
        self.dhead = Dinov2Head()
        self.xattn = WindowedCrossAttention()
        self.fusion = ResBlock(64, 64)
        self.fhead = nn.Sequential(ResBlock(64, 32), nn.Conv2d(32, 32, 3, 1, 1),
                                   nn.BatchNorm2d(32), nn.ReLU(True))
        self.dh = nn.Sequential(ResBlock(32, 16), nn.Conv2d(16, 1, 3, 1, 1), nn.ReLU(True))

    def forward(self, x):
        l1, l2, l3, l4 = self.enc(x)
        r = [rn(v) for rn, v in zip(self.rn, (l1, l2, l3, l4))]
        p4 = self.ffb4(r[3])
        p3 = self.ffb3(p4, r[2])
        p2 = self.ffb2(p3, r[1])
        p1 = self.ffb1(p2, r[0])
        h = self.head0(p1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear")
        midas = F.relu(self.head2(h))
        xd = F.interpolate(x, (224, 280), mode="bilinear", align_corners=True)
        taps = self.vit(xd)
        dino = self.dhead(taps, 16, 20)
        dino = F.interpolate(dino, midas.shape[2:], mode="bilinear", align_corners=True)
        att = self.xattn(midas, dino)
        fused = self.fusion(torch.cat([att, midas], 1))
        return self.dh(self.fhead(fused)).squeeze(1)


def si_loss(pred, target, eps=1e-6):
    d = torch.log(pred + eps) - torch.log(target + eps)
    n = d[0].numel()
    return (d.pow(2).flatten(1).sum(1) / n - d.flatten(1).sum(1).pow(2) / n**2).mean()


def main(batch=4, size=(448, 576), warmup=1, steps=3):
    model = FlagshipTorch()
    n_params = sum(p.numel() for p in model.parameters())
    opt = torch.optim.AdamW([p for p in model.parameters() if p.requires_grad], lr=1e-4, weight_decay=1e-4)
    x = torch.randn(batch, 3, *size)
    y = torch.rand(batch, *size) * 9 + 0.5

    def step():
        opt.zero_grad()
        loss = si_loss(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = (time.time() - t0) / steps
    ips = batch / dt
    result = {
        "train_images_per_sec": ips,
        "sec_per_step": dt,
        "batch": batch,
        "input_size": list(size),
        "model_params": n_params,
        "device": "cpu",
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "note": "architecture-equivalent flagship (MiDaS_small + frozen DINOv2-S "
        "semantics) train step; favorable-to-reference batched window attention",
    }
    out = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
