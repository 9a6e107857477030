"""LeViT-384 backbone (3-stage hybrid conv/attention) for the DPT-LeViT variant.

The reference loads timm levit_384 and taps blocks [3, 11, 21] (stage ends),
treating it as a 3-level pyramid with channels [384, 512, 768]
(src/network/blocks.py:89-95, dpt_depth.py:182,219-222) plus a 2x-upsampling
``stem_b4_transpose`` head stage (src/network/backbones/levit.py:86-96).

Architecture facts (LeViT paper / timm levit_384): a 4-conv stride-2 stem
(48/96/192/384 channels, hardswish) to /16 resolution, then three stages of
attention blocks (dims 384/512/768, heads 6/9/12, key_dim 32, attn_ratio 2,
mlp_ratio 2, depth 4 each) with attention-subsample downsampling between stages.
Every linear is Linear+BatchNorm (LeViT's BN-everywhere design); attention uses
learned per-offset bias tables. Token grids are handled for arbitrary /16
input grids by building the bias index statically per grid.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .blocks import BatchNorm, Conv


@functools.lru_cache(maxsize=64)
def _bias_index(h: int, w: int, stride: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Returns (unique offsets (K,2), index (Hq*Wq, H*W)) for attention bias.

    Queries live on the (possibly strided) grid; keys on the full grid.
    """
    pts = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1).reshape(-1, 2)
    q_pts = pts[:: 1] if stride == 1 else (
        np.stack(
            np.meshgrid(np.arange(0, h, stride), np.arange(0, w, stride), indexing="ij"), -1
        ).reshape(-1, 2)
    )
    offs = np.abs(q_pts[:, None, :] - pts[None, :, :])  # (Q, K, 2)
    uniq, idx = np.unique(offs.reshape(-1, 2), axis=0, return_inverse=True)
    return uniq, idx.reshape(offs.shape[0], offs.shape[1])


class LinearBN(nn.Module):
    features: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, use_bias=False, name="linear")(x)
        return BatchNorm(not self.train, self.axis_name, name="bn")(x)


class LevitAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    grid: tuple[int, int]
    down_stride: int = 1  # 2 => attention-subsample (queries on strided grid)
    out_dim: Optional[int] = None
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h, w = self.grid
        nh = self.num_heads
        kd = self.key_dim
        vd = self.key_dim * self.attn_ratio
        out_dim = self.out_dim or self.dim

        kv = LinearBN(nh * (kd + vd), self.train, self.axis_name, name="kv")(x)
        k = kv[..., : nh * kd].reshape(b, n, nh, kd)
        v = kv[..., nh * kd :].reshape(b, n, nh, vd)
        if self.down_stride == 1:
            q_in = x
            qh, qw = h, w
        else:
            grid_x = x.reshape(b, h, w, c)[:, :: self.down_stride, :: self.down_stride]
            qh, qw = grid_x.shape[1], grid_x.shape[2]
            q_in = grid_x.reshape(b, qh * qw, c)
        q = LinearBN(nh * kd, self.train, self.axis_name, name="q")(q_in)
        q = q.reshape(b, qh * qw, nh, kd)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (kd**-0.5)
        uniq, idx = _bias_index(h, w, self.down_stride)
        table = self.param(
            "attention_biases", nn.initializers.zeros, (nh, len(uniq))
        )
        logits = logits + table[:, jnp.asarray(idx)][None]

        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = out.reshape(b, qh * qw, nh * vd)
        out = nn.hard_swish(out)
        return LinearBN(out_dim, self.train, self.axis_name, name="proj")(out)


class LevitMlp(nn.Module):
    dim: int
    ratio: int = 2
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        h = LinearBN(self.dim * self.ratio, self.train, self.axis_name, name="fc1")(x)
        h = nn.hard_swish(h)
        return LinearBN(self.dim, self.train, self.axis_name, name="fc2")(h)


class LeViT(nn.Module):
    """levit_384; __call__ -> 3 NHWC maps at /16, /32, /64.

    Taps follow the reference's flat-block hook indices [3, 11, 21]
    (dpt_depth.py:182, _make_levit_backbone levit.py:23-52): stage 1 after its
    2nd attention+MLP pair, stages 2/3 after their 1st — NOT at stage ends. In
    timm's flat ``blocks`` Sequential each pair occupies two slots and each
    inter-stage AttentionSubsample+MLP two more, so levit_384 runs 0..27 and
    the hooks land mid-stage. Post-tap stage-1/2 blocks still run (they feed
    the next stage); stage-3 blocks past the last tap (flat 22..27) are dead
    compute in the reference — the hook output never depends on them — so we
    neither build nor run them (their checkpoint keys are documented dead in
    train/torch_import.py::map_dpt_levit_key)."""

    dims: tuple = (384, 512, 768)
    heads: tuple = (6, 9, 12)
    depths: tuple = (4, 4, 4)
    key_dim: int = 32
    hooks: tuple = (3, 11, 21)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # Conv stem: /16, hardswish between convs.
        c0 = self.dims[0]
        widths = (c0 // 8, c0 // 4, c0 // 2, c0)
        h = x
        for i, wch in enumerate(widths):
            h = Conv(wch, 3, 2, 1, use_bias=False, name=f"stem_conv{i}")(h)
            h = BatchNorm(not train, self.axis_name, name=f"stem_bn{i}")(h)
            if i < 3:
                h = nn.hard_swish(h)
        b, gh, gw, _ = h.shape
        tokens = h.reshape(b, gh * gw, c0)

        feats = []
        grid = (gh, gw)
        flat = 0  # timm flat block index
        last_hook = max(self.hooks)
        for si, (dim, nh, depth) in enumerate(zip(self.dims, self.heads, self.depths)):
            if si > 0:
                # Attention subsample: queries on the /2 grid, out_dim = new dim.
                prev_dim = self.dims[si - 1]
                tokens = LevitAttention(
                    prev_dim, self.key_dim, prev_dim // self.key_dim, 4,
                    grid, down_stride=2, out_dim=dim,
                    train=train, axis_name=self.axis_name,
                    name=f"downsample{si}_attn",
                )(tokens)
                grid = ((grid[0] + 1) // 2, (grid[1] + 1) // 2)
                res = tokens
                mlp = LevitMlp(dim, 2, train, self.axis_name, name=f"downsample{si}_mlp")
                tokens = res + mlp(tokens)
                flat += 2
            for bi in range(depth):
                if flat > last_hook:
                    break  # dead tail of the final stage
                tokens = tokens + LevitAttention(
                    dim, self.key_dim, nh, 2, grid,
                    train=train, axis_name=self.axis_name,
                    name=f"stage{si}_attn{bi}",
                )(tokens)
                tokens = tokens + LevitMlp(
                    dim, 2, train, self.axis_name, name=f"stage{si}_mlp{bi}"
                )(tokens)
                if flat in self.hooks or flat + 1 in self.hooks:
                    feats.append(tokens.reshape(b, grid[0], grid[1], dim))
                flat += 2
        return tuple(feats)


class StemB4Transpose(nn.Module):
    """The DPT-LeViT 4x upsampling head stem: stem_b4_transpose(in, out, hswish)
    (backbones/levit.py:86-96) = ConvTransposeNorm(in->out, k3 s2 p1, bias-free
    + BN) + hardswish, then ConvTransposeNorm(out->out//2) + hardswish. The
    reference hardcodes (256, 128) so the head sees 64 channels
    (dpt_depth.py:221)."""

    out_channels: int  # first stage's output; second halves it again
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from .blocks import ConvTranspose

        x = ConvTranspose(self.out_channels, 3, 2, 1, use_bias=False, name="up1")(x)
        x = BatchNorm(not self.train, self.axis_name, name="up1_bn")(x)
        x = nn.hard_swish(x)
        x = ConvTranspose(self.out_channels // 2, 3, 2, 1, use_bias=False, name="up2")(x)
        x = BatchNorm(not self.train, self.axis_name, name="up2_bn")(x)
        return nn.hard_swish(x)
