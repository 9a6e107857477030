"""DPT dense-prediction transformer depth models.

Parity target: src/network/dpt_depth.py:155-293 with the pure-ViT backbones of
the reference's hook table (dpt_depth.py:173-186): vitb16_384 taps blocks
[2,5,8,11], vitl16_384 taps [5,11,17,23]. The reassembly follows
backbones/utils.py:144-249 (make_backbone_default): per-tap readout (the
"project" op: concat class token, Linear(2C->C)+GELU), unflatten to the patch
grid, 1x1 projection to per-level channels, then 4x/2x/id/stride-2 resizes; a
features=256 scratch + size-targeted fusion cascade; and the monocular head
(conv->2x align-corners upsample->conv->ReLU->1x1->ReLU, dpt_depth.py:277-285).

The hybrid vitb_rn50_384 backbone (ResNetV2-50 stem + ViT) is registered in the
hook table but not yet implemented — ``DPT_Hybrid`` raises with a clear message
until it lands.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.blocks import Conv, ConvTranspose, FeatureFusionBlockCustom, ScratchConvs, interpolate
from ..nn.vit import VIT_CONFIGS, ViT

DPT_BACKBONE_HOOKS = {
    "vitb16_384": (2, 5, 8, 11),
    "vitl16_384": (5, 11, 17, 23),
    "vitb_rn50_384": (0, 1, 8, 11),  # hybrid — not yet implemented
}

DPT_BACKBONE_CHANNELS = {
    "vitb16_384": (96, 192, 384, 768),
    "vitl16_384": (256, 512, 1024, 1024),
    "vitb_rn50_384": (256, 512, 768, 768),
}


class ProjectReadout(nn.Module):
    """Fold the class token into every patch token (backbones/utils.py:26-39)."""

    dim: int

    @nn.compact
    def __call__(self, tokens):
        cls = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
        cat = jnp.concatenate([tokens[:, 1:], cls], axis=-1)
        return nn.gelu(nn.Dense(self.dim, name="project")(cat), approximate=False)


class DPT(nn.Module):
    backbone: str = "vitl16_384"
    features: int = 256
    readout: str = "project"
    non_negative: bool = True
    head_out_1: bool = True  # False => stop at 32-ch features
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.backbone not in ("vitb16_384", "vitl16_384"):
            raise NotImplementedError(
                f"DPT backbone {self.backbone!r} (hybrid/others) is not implemented yet; "
                "use vitb16_384 or vitl16_384"
            )
        dim, _, _, patch = VIT_CONFIGS[self.backbone]
        hooks = DPT_BACKBONE_HOOKS[self.backbone]
        out_channels = DPT_BACKBONE_CHANNELS[self.backbone]
        b, h, w, _ = x.shape
        ph, pw = h // patch, w // patch

        taps = ViT(self.backbone, pos_grid=(24, 24), name="pretrained")(
            x, out_indices=hooks, train=train, raw_taps=True
        )

        levels = []
        for i, tokens in enumerate(taps):
            if self.readout == "project":
                t = ProjectReadout(dim, name=f"readout_{i}")(tokens)
            else:  # "ignore"
                t = tokens[:, 1:]
            grid = t.reshape(b, ph, pw, dim)
            grid = Conv(out_channels[i], 1, name=f"act_postprocess_{i}")(grid)
            if i == 0:
                grid = ConvTranspose(out_channels[0], 4, 4, 0, name="resize_0")(grid)
            elif i == 1:
                grid = ConvTranspose(out_channels[1], 2, 2, 0, name="resize_1")(grid)
            elif i == 3:
                grid = Conv(out_channels[3], 3, 2, 1, name="resize_3")(grid)
            levels.append(grid)

        l1, l2, l3, l4 = ScratchConvs(self.features, expand=False, name="scratch")(levels)
        common = dict(expand=False, align_corners=True, train=train, axis_name=self.axis_name)
        path_4 = FeatureFusionBlockCustom(self.features, name="refinenet4", **common)(
            l4, size=l3.shape[1:3]
        )
        path_3 = FeatureFusionBlockCustom(self.features, name="refinenet3", **common)(
            path_4, l3, size=l2.shape[1:3]
        )
        path_2 = FeatureFusionBlockCustom(self.features, name="refinenet2", **common)(
            path_3, l2, size=l1.shape[1:3]
        )
        path_1 = FeatureFusionBlockCustom(self.features, name="refinenet1", **common)(
            path_2, l1
        )

        # Monocular head (dpt_depth.py:277-285); its Interpolate uses
        # align_corners=True, unlike the MiDaS-small head.
        hft = Conv(self.features // 2, 3, 1, 1, name="head_conv0")(path_1)
        hft = interpolate(hft, scale_factor=2, align_corners=True)
        hft = Conv(32, 3, 1, 1, name="head_conv2")(hft)
        hft = nn.relu(hft)
        if not self.head_out_1:
            return hft
        out = Conv(1, 1, name="head_conv4")(hft)
        if self.non_negative:
            out = nn.relu(out)
        return out[..., 0]


class DPTDepthModel(DPT):
    """Alias with the reference's class name (dpt_depth.py:269-293)."""
