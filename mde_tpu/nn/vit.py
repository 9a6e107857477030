"""Vision Transformer backbone (DINOv2-style), functional and hook-free.

Replaces the reference's torch.hub DINOv2 download + forward-hook feature
extraction (src/network/midas_semantics.py:168-172,
src/network/backbones/utils.py:53-60 global activations dict) with a Flax ViT
whose ``__call__`` *returns* the requested intermediate layers explicitly —
``get_intermediate_layers(x, 4, return_class_token=False)`` semantics: outputs of
the last n blocks, each passed through the final LayerNorm, patch tokens only.

Supports arbitrary input grids via bilinear position-embedding interpolation
(the mechanism of src/network/backbones/vit.py:16-30 / DINOv2's
interpolate_pos_encoding), so the same backbone serves the 224x280 semantic
branch (16x20 = 320 tokens) and larger DPT inputs.

Weights train from scratch in this environment (zero egress — no hub downloads);
the architecture matches DINOv2 (pre-norm blocks, LayerScale, GELU MLP) so a
converted checkpoint can be imported when available.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic, resize_bilinear
from .blocks import LayerNorm

VIT_CONFIGS = {
    # name: (embed_dim, depth, num_heads, patch_size)
    "dinov2_vits14": (384, 12, 6, 14),
    "dinov2_vitb14": (768, 12, 12, 14),
    "dinov2_vitl14": (1024, 24, 16, 14),
    "vitb16_384": (768, 12, 12, 16),
    "vitl16_384": (1024, 24, 16, 16),
}


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(logits * (hd**-0.5), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = out.reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    # DINOv2 has LayerScale; the timm ViTs the DPT variants bootstrap from
    # (vit_large_patch16_384 / vit_base_*) do not — plain residuals there, so an
    # imported timm checkpoint is architecture-exact.
    layerscale: bool = True

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        if self.layerscale:
            h = LayerScale(self.dim, self.layerscale_init, name="ls1")(h)
        x = x + h
        h = LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        if self.layerscale:
            h = LayerScale(self.dim, self.layerscale_init, name="ls2")(h)
        return x + h


class ViT(nn.Module):
    """Returns intermediate patch-token layers as (B, ph*pw, C) tensors."""

    variant: str = "dinov2_vits14"
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-5
    pos_grid: tuple[int, int] = (37, 37)  # DINOv2 518/14 pretrain grid
    layerscale: bool = True  # False for the timm vit{b,l}16 families

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        n_layers: int = 4,
        out_indices: Optional[Sequence[int]] = None,
        train: bool = False,
        raw_taps: bool = False,
    ) -> list[jnp.ndarray]:
        dim, depth, heads, patch = VIT_CONFIGS[self.variant]
        b, h, w, _ = x.shape
        ph, pw = h // patch, w // patch

        tokens = nn.Conv(
            dim, (patch, patch), strides=(patch, patch), padding="VALID", name="patch_embed"
        )(x)
        tokens = tokens.reshape(b, ph * pw, dim)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, dim))
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.pos_grid[0] * self.pos_grid[1] + 1, dim),
        )
        # Interpolate the patch pos-embed grid to the current token grid.
        # DINOv2 trunks use the hub's interpolate_pos_encoding semantics —
        # bicubic with interpolate_offset=0.1 folded into the sampling scale
        # (scale_factor=(out+0.1)/in, so src = (o+0.5)*in/(out+0.1)-0.5);
        # timm ViT trunks (MiDaS DPT) use plain bilinear
        # (src/network/backbones/vit.py:16-30, F.interpolate default corners).
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (ph, pw) != tuple(self.pos_grid):
            grid = patch_pos.reshape(1, self.pos_grid[0], self.pos_grid[1], dim)
            if self.variant.startswith("dinov2"):
                grid = resize_bicubic(
                    grid, (ph, pw), align_corners=False,
                    src_scales=(
                        self.pos_grid[0] / (ph + 0.1),
                        self.pos_grid[1] / (pw + 0.1),
                    ),
                )
            else:
                grid = resize_bilinear(grid, (ph, pw), align_corners=False)
            patch_pos = grid.reshape(1, ph * pw, dim)
        tokens = tokens + patch_pos
        cls_tok = jnp.broadcast_to(cls + cls_pos, (b, 1, dim))
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        take = set(
            out_indices if out_indices is not None else range(depth - n_layers, depth)
        )
        outputs = []
        for i in range(depth):
            tokens = Block(
                dim, heads, self.mlp_ratio, self.layerscale_init,
                layerscale=self.layerscale, name=f"blocks_{i}"
            )(tokens)
            if i in take:
                outputs.append(tokens)
        if raw_taps:
            # DPT-style hooks: raw block outputs incl. class token, no final LN
            # (the forward-hook taps of src/network/backbones/vit.py).
            return outputs
        norm = LayerNorm(epsilon=1e-6, name="norm")
        # get_intermediate_layers(norm=True): final LN applied to each tap,
        # class token dropped.
        return [norm(t)[:, 1:, :] for t in outputs]
