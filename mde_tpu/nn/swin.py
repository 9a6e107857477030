"""Swin / SwinV2 hierarchical transformer backbones for DPT variants.

The reference wires timm Swin models through forward hooks at the end of each
stage and unflattens tokens to 2D maps (src/network/backbones/swin_common.py:13-52,
swin.py, swin2.py). This Flax implementation returns the four stage feature maps
directly (NHWC at /4 /8 /16 /32 with channels C*(1,2,4,8)).

Architectural facts per variant (timm model cards the reference depends on):
- swinl12_384   (V1): embed 192, depths (2,2,18,2), heads (6,12,24,48), window 12
- swin2l24_384  (V2): embed 192, same depths/heads, window 24
- swin2b24_384  (V2): embed 128, depths (2,2,18,2), heads (4,8,16,32), window 24
- swin2t16_256  (V2): embed 96,  depths (2,2,6,2),  heads (3,6,12,24), window 16

V1 blocks are pre-norm with a learned relative-position-bias table; V2 blocks are
post-norm with cosine attention (learned per-head logit scale) and a continuous
log-CPB MLP bias. Shifted windows alternate blocks; attention masks for shifted
windows are built statically per grid under jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .blocks import LayerNorm
from .vit import Mlp

SWIN_CONFIGS = {
    # name: (version, embed, depths, heads, window)
    "swinl12_384": (1, 192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
    "swin2l24_384": (2, 192, (2, 2, 18, 2), (6, 12, 24, 48), 24),
    "swin2b24_384": (2, 128, (2, 2, 18, 2), (4, 8, 16, 32), 24),
    "swin2t16_256": (2, 96, (2, 2, 6, 2), (3, 6, 12, 24), 16),
}


def swin_stage_channels(variant: str) -> list[int]:
    _, embed, _, _, _ = SWIN_CONFIGS[variant]
    return [embed * m for m in (1, 2, 4, 8)]


@functools.lru_cache(maxsize=64)
def _v1_rel_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (T, T)


@functools.lru_cache(maxsize=64)
def _v2_log_coords(window: int) -> np.ndarray:
    """Log-spaced continuous relative coords for the V2 CPB MLP, (T, T, 2)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    coords = coords.reshape(2, -1).astype(np.float32)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel / max(window - 1, 1) * 8.0
    return np.sign(rel) * np.log2(np.abs(rel) + 1.0) / np.log2(8.0)


@functools.lru_cache(maxsize=64)
def _shift_mask(h: int, w: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(nW, T, T) additive mask for shifted windows; None when shift == 0."""
    if shift == 0:
        return None
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    version: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B*nW, T, C); mask: (nW, T, T) additive or None."""
        bnw, t, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(bnw, t, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.version == 1:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * self.window - 1) ** 2, self.num_heads),
            )
            idx = jnp.asarray(_v1_rel_index(self.window))
            bias = table[idx.reshape(-1)].reshape(t, t, self.num_heads)
            logits = logits + bias.transpose(2, 0, 1)[None]
        else:
            # V2: cosine similarity attention with learned clamped logit scale.
            qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
            kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qn, kn, preferred_element_type=jnp.float32
            )
            logit_scale = self.param(
                "logit_scale",
                lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
                (self.num_heads, 1, 1),
            )
            logits = logits * jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))[None]
            # Continuous position bias: 2 -> 512 -> heads MLP on log coords.
            coords = jnp.asarray(_v2_log_coords(self.window))  # (T, T, 2)
            hcpb = nn.relu(nn.Dense(512, name="cpb_fc1")(coords))
            bias = nn.Dense(self.num_heads, use_bias=False, name="cpb_fc2")(hcpb)
            bias = 16.0 * nn.sigmoid(bias)
            logits = logits + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(bnw // nw, nw, self.num_heads, t, t)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(bnw, self.num_heads, t, t)

        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        return nn.Dense(c, name="proj")(out.reshape(bnw, t, c))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    version: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        shift = self.shift if win < min(h, w) else 0

        def attend(t):
            if shift > 0:
                t = jnp.roll(t, (-shift, -shift), axis=(1, 2))
            tw = t.reshape(b, h // win, win, w // win, win, c)
            tw = tw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
            mask = _shift_mask(h, w, win, shift)
            out = WindowAttention(
                self.dim, self.num_heads, win, self.version, name="attn"
            )(tw, jnp.asarray(mask) if mask is not None else None)
            out = out.reshape(b, h // win, w // win, win, win, c)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
            if shift > 0:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out

        if self.version == 1:  # pre-norm
            x = x + attend(LayerNorm(name="norm1")(x))
            x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
                LayerNorm(name="norm2")(x)
            )
        else:  # V2 post-norm
            x = x + LayerNorm(name="norm1")(attend(x))
            x = x + LayerNorm(name="norm2")(
                Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(x)
            )
        return x


class PatchMerging(nn.Module):
    out_dim: int
    version: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        if self.version == 1:
            x = LayerNorm(name="norm")(x)
            return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)
        x = nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)
        return LayerNorm(name="norm")(x)


class SwinBackbone(nn.Module):
    """Stage-sliced: __call__ -> four NHWC stage outputs (the hook surface of
    swin_common.py:13-52)."""

    variant: str = "swinl12_384"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        version, embed, depths, heads, window = SWIN_CONFIGS[self.variant]
        b, h, w, _ = x.shape
        # 4x4 patch embed
        t = nn.Conv(embed, (4, 4), strides=(4, 4), padding="VALID", name="patch_embed")(x)
        t = LayerNorm(name="patch_norm")(t)

        feats = []
        for si, (depth, nh) in enumerate(zip(depths, heads)):
            dim = embed * 2**si
            if si > 0:
                t = PatchMerging(dim, version, name=f"merge{si}")(t)
            for bi in range(depth):
                t = SwinBlock(
                    dim, nh, window,
                    shift=0 if bi % 2 == 0 else window // 2,
                    version=version,
                    name=f"stage{si}_block{bi}",
                )(t)
            feats.append(t)
        return tuple(feats)
