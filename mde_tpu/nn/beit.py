"""BEiT backbone (beitb16/beitl16) for DPT variants.

The reference loads timm BEiT models and monkeypatches attention/blocks to
support arbitrary window sizes via interpolated relative-position-bias tables
(src/network/backbones/beit.py:29-127). This is a from-scratch Flax BEiT with
the same architectural facts:

- ViT trunk with per-block decomposed relative position bias (a learned table
  over (2H-1)*(2W-1) relative offsets + 3 cls-interaction slots),
- q and v biases but no k bias (BEiT quirk),
- LayerScale (gamma_1/gamma_2) residual scaling,
- no absolute position embedding.

Arbitrary input grids are handled the same way the reference patch does: the
spatial part of the bias table is bilinearly resized from the pretraining grid
to the runtime grid at call time. Taps are raw block outputs (DPT hook
semantics, hooks [2,5,8,11] for B and [5,11,17,23] for L —
src/network/dpt_depth.py:174-176).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .blocks import LayerNorm
from .vit import LayerScale, Mlp

BEIT_CONFIGS = {
    # name: (embed_dim, depth, num_heads, patch, pretrain_grid)
    "beitb16_384": (768, 12, 12, 16, (24, 24)),
    "beitl16_384": (1024, 24, 16, 16, (24, 24)),
    "beitl16_512": (1024, 24, 16, 16, (32, 32)),
}


def _relative_position_index(h: int, w: int) -> np.ndarray:
    """(1+HW, 1+HW) index into the flattened bias table; the last 3 table slots
    are cls->token, token->cls and cls->cls."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, HW)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, HW, HW)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = np.zeros((h * w + 1, h * w + 1), dtype=np.int64)
    num_rel = (2 * h - 1) * (2 * w - 1)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel + 1  # cls -> token
    idx[0:, 0] = num_rel + 2  # token -> cls
    idx[0, 0] = num_rel       # cls -> cls
    return idx


class BeitAttention(nn.Module):
    dim: int
    num_heads: int
    pretrain_grid: tuple[int, int]

    @nn.compact
    def __call__(self, x, grid: tuple[int, int]):
        b, n, c = x.shape
        hd = c // self.num_heads
        gh, gw = grid
        ph, pw = self.pretrain_grid

        # q/v have biases, k does not (BEiT).
        q = nn.Dense(c, use_bias=True, name="q")(x)
        k = nn.Dense(c, use_bias=False, name="k")(x)
        v = nn.Dense(c, use_bias=True, name="v")(x)

        def split(t):
            return t.reshape(b, n, self.num_heads, hd)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", split(q), split(k), preferred_element_type=jnp.float32
        ) * (hd**-0.5)

        # Relative position bias, resized from the pretraining grid when needed
        # (the reference's interpolated bias-table patch, beit.py:29-62).
        num_rel_pretrain = (2 * ph - 1) * (2 * pw - 1)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel_pretrain + 3, self.num_heads),
        )
        spatial = table[:num_rel_pretrain]
        extra = table[num_rel_pretrain:]
        if (gh, gw) != (ph, pw):
            grid_tbl = spatial.reshape(2 * ph - 1, 2 * pw - 1, self.num_heads)
            grid_tbl = resize_bilinear(
                grid_tbl[None], (2 * gh - 1, 2 * gw - 1), align_corners=True
            )[0]
            spatial = grid_tbl.reshape(-1, self.num_heads)
        full_table = jnp.concatenate([spatial, extra], axis=0)
        idx = jnp.asarray(_relative_position_index(gh, gw))
        bias = full_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        logits = logits + bias.transpose(2, 0, 1)[None]

        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), split(v))
        out = out.reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class BeitBlock(nn.Module):
    dim: int
    num_heads: int
    pretrain_grid: tuple[int, int]
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, grid):
        h = LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = BeitAttention(self.dim, self.num_heads, self.pretrain_grid, name="attn")(h, grid)
        x = x + LayerScale(self.dim, 1e-5, name="gamma_1")(h)
        h = LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        return x + LayerScale(self.dim, 1e-5, name="gamma_2")(h)


class BEiT(nn.Module):
    """Returns raw tap-layer token tensors (B, 1+HW, C) at ``out_indices``."""

    variant: str = "beitl16_384"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        out_indices: Sequence[int],
        train: bool = False,
    ) -> list[jnp.ndarray]:
        dim, depth, heads, patch, pretrain_grid = BEIT_CONFIGS[self.variant]
        b, h, w, _ = x.shape
        gh, gw = h // patch, w // patch
        tokens = nn.Conv(
            dim, (patch, patch), strides=(patch, patch), padding="VALID", name="patch_embed"
        )(x)
        tokens = tokens.reshape(b, gh * gw, dim)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, dim))
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, dim)), tokens], axis=1)

        take = set(out_indices)
        outputs = []
        for i in range(depth):
            tokens = BeitBlock(dim, heads, pretrain_grid, name=f"blocks_{i}")(
                tokens, (gh, gw)
            )
            if i in take:
                outputs.append(tokens)
        return outputs
