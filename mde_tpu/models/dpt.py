"""DPT dense-prediction transformer depth models — full backbone matrix.

Parity target: src/network/dpt_depth.py:155-293 and its hook table
(dpt_depth.py:173-186). Backbone families and their reassembly:

- ViT   (vitb16_384, vitl16_384): raw token taps at the hook indices, per-tap
  readout ("project": fold the class token via Linear(2C->C)+GELU —
  backbones/utils.py:26-39), unflatten, 1x1 channel projection, then
  4x/2x/id/stride-2 resizes (backbones/utils.py:144-249).
- BEiT  (beitb16_384, beitl16_384, beitl16_512): same reassembly as ViT over
  the BEiT trunk (relative-position-bias attention, backbones/beit.py).
- Swin  (swinl12_384, swin2l24_384, swin2b24_384, swin2t16_256): hierarchical
  stages are already a /4../32 pyramid; stage outputs feed the scratch convs
  directly (backbones/swin_common.py:13-52 semantics).
- LeViT (levit_384): 3-level pyramid at /16../64, number_layers=3, plus the
  stem_b4_transpose 4x upsampling head stage (dpt_depth.py:219-222,261-262).

- Hybrid (vitb_rn50_384): ResNetV2-GN stages 1-2 as levels 1-2, ViT-B blocks
  over a 1x1 patch embedding of the /16 stage, taps [8, 11]
  (backbones/vit.py:120-205).
- Next-ViT (next_vit_large_6m): hierarchical conv/transformer stages feed the
  scratch directly (the reference's own integration is broken — SURVEY.md §7.5;
  ours is implemented from the paper).

The fusion cascade uses explicit size targeting exactly like the reference
(dpt_depth.py:252-257).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.beit import BEIT_CONFIGS, BEiT
from ..nn.resnetv2 import ResNetV2Stem
from ..nn.blocks import Conv, ConvTranspose, FeatureFusionBlockCustom, ScratchConvs, interpolate
from ..nn.levit import LeViT, StemB4Transpose
from ..nn.next_vit import NextViT
from ..nn.swin import SwinBackbone, swin_stage_channels
from ..nn.vit import VIT_CONFIGS, ViT

DPT_BACKBONE_HOOKS = {
    "next_vit_large_6m": (2, 6, 36, 39),
    "beitl16_512": (5, 11, 17, 23),
    "beitl16_384": (5, 11, 17, 23),
    "beitb16_384": (2, 5, 8, 11),
    "swin2l24_384": (1, 1, 17, 1),
    "swin2b24_384": (1, 1, 17, 1),
    "swin2t16_256": (1, 1, 5, 1),
    "swinl12_384": (1, 1, 17, 1),
    "levit_384": (3, 11, 21),
    "vitb_rn50_384": (0, 1, 8, 11),  # hybrid: resnet stages + vit blocks
    "vitb16_384": (2, 5, 8, 11),
    "vitl16_384": (5, 11, 17, 23),
}

DPT_BACKBONE_CHANNELS = {
    "next_vit_large_6m": (96, 256, 512, 1024),
    "beitl16_512": (256, 512, 1024, 1024),
    "beitl16_384": (256, 512, 1024, 1024),
    "beitb16_384": (96, 192, 384, 768),
    "swin2l24_384": tuple(swin_stage_channels("swin2l24_384")),
    "swin2b24_384": tuple(swin_stage_channels("swin2b24_384")),
    "swin2t16_256": tuple(swin_stage_channels("swin2t16_256")),
    "swinl12_384": tuple(swin_stage_channels("swinl12_384")),
    "levit_384": (384, 512, 768),
    "vitb_rn50_384": (256, 512, 768, 768),
    "vitb16_384": (96, 192, 384, 768),
    "vitl16_384": (256, 512, 1024, 1024),
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
    head_out_1: bool = True  # False => stop at the head_features_2 maps
    # DPTDepthModel head widths (dpt_depth.py:269-287): the head's first conv
    # consumes head_features_1 (= features unless overridden — dpt_levit_224
    # passes 64 because its stem_transpose ends at features//4) and its second
    # emits head_features_2 (32 default, 8 for levit).
    head_features_1: Optional[int] = None
    head_features_2: int = 32
    axis_name: Optional[str] = None

    def _token_levels(self, x, train):
        """ViT/BEiT path: tokens -> readout -> unflatten -> project -> resize."""
        hooks = DPT_BACKBONE_HOOKS[self.backbone]
        out_channels = DPT_BACKBONE_CHANNELS[self.backbone]
        if self.backbone.startswith("beit"):
            dim, _, _, patch, _ = BEIT_CONFIGS[self.backbone]
            taps = BEiT(self.backbone, name="pretrained")(x, out_indices=hooks, train=train)
        else:
            dim, _, _, patch = VIT_CONFIGS[self.backbone]
            # timm vit_{base,large}_patch16_384 trunks: no LayerScale.
            taps = ViT(self.backbone, pos_grid=(24, 24), layerscale=False,
                       name="pretrained")(
                x, out_indices=hooks, train=train, raw_taps=True
            )
        b, h, w, _ = x.shape
        ph, pw = h // patch, w // patch
        levels = []
        for i, tokens in enumerate(taps):
            if self.readout == "project":
                t = ProjectReadout(dim, name=f"readout_{i}")(tokens)
            elif self.readout == "add":  # AddReadout (backbones/utils.py:14-23)
                t = tokens[:, 1:] + tokens[:, :1]
            else:  # "ignore" (Slice)
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
        return levels

    def _hybrid_levels(self, x, train):
        """vitb_rn50_384: ResNetV2 stages 1-2 as levels 1-2; ViT-B blocks over a
        1x1 patch embedding of the /16 stage, tapped at blocks [8, 11]
        (backbones/vit.py:120-205)."""
        from ..nn.vit import Block
        from .dpt import ProjectReadout  # self-import safe at call time

        dim = 768
        hooks = DPT_BACKBONE_HOOKS["vitb_rn50_384"][2:]  # (8, 11)
        out_channels = DPT_BACKBONE_CHANNELS["vitb_rn50_384"]
        s1, s2, final = ResNetV2Stem(name="pretrained_resnet")(x)
        b, gh, gw, _ = final.shape
        tokens = nn.Conv(dim, (1, 1), padding="VALID", name="patch_embed")(final)
        tokens = tokens.reshape(b, gh * gw, dim)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, dim))
        pos_grid = (24, 24)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, pos_grid[0] * pos_grid[1] + 1, dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != pos_grid:
            from ..ops.resize import resize_bilinear

            grid = patch_pos.reshape(1, *pos_grid, dim)
            patch_pos = resize_bilinear(grid, (gh, gw), align_corners=False).reshape(
                1, gh * gw, dim
            )
        tokens = tokens + patch_pos
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls + cls_pos, (b, 1, dim)), tokens], axis=1
        )
        taps = []
        for i in range(12):
            # timm vit_base_r50_s16_384 blocks: no LayerScale.
            tokens = Block(dim, 12, layerscale=False, name=f"blocks_{i}")(tokens)
            if i in hooks:
                taps.append(tokens)
        levels = [s1, s2]
        for j, t in enumerate(taps):
            t = ProjectReadout(dim, name=f"readout_{j + 2}")(t)
            grid = t.reshape(b, gh, gw, dim)
            grid = Conv(out_channels[j + 2], 1, name=f"act_postprocess_{j + 2}")(grid)
            if j == 1:
                grid = Conv(out_channels[3], 3, 2, 1, name="resize_3")(grid)
            levels.append(grid)
        return levels

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bb = self.backbone
        if bb not in DPT_BACKBONE_HOOKS:
            raise NotImplementedError(
                f"DPT backbone {bb!r} is not implemented; "
                f"available: {sorted(DPT_BACKBONE_HOOKS)}"
            )

        stem_transpose = None
        if bb == "vitb_rn50_384":
            levels = self._hybrid_levels(x, train)
        elif bb.startswith("swin"):
            levels = list(SwinBackbone(bb, name="pretrained")(x, train=train))
        elif bb == "next_vit_large_6m":
            levels = list(NextViT(axis_name=self.axis_name, name="pretrained")(x, train=train))
        elif bb == "levit_384":
            levels = list(LeViT(axis_name=self.axis_name, name="pretrained")(x, train=train))
            # stem_b4_transpose(256, 128): features -> features//2 -> features//4
            # (dpt_depth.py:221 hardcodes the 256-feature schedule).
            stem_transpose = StemB4Transpose(
                self.features // 2, train, self.axis_name, name="stem_transpose"
            )
        else:
            levels = self._token_levels(x, train)

        rn = ScratchConvs(self.features, expand=False, name="scratch")(levels)
        common = dict(expand=False, align_corners=True, train=train, axis_name=self.axis_name)

        if len(rn) == 3:
            l1, l2, l3 = rn
            path_3 = FeatureFusionBlockCustom(self.features, name="refinenet3", **common)(
                l3, size=l2.shape[1:3]
            )
        else:
            l1, l2, l3, l4 = rn
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
        if stem_transpose is not None:
            path_1 = stem_transpose(path_1)

        # Monocular head (dpt_depth.py:277-285); its Interpolate uses
        # align_corners=True, unlike the MiDaS-small head.
        hf1 = self.head_features_1 or path_1.shape[-1]
        hft = Conv(hf1 // 2, 3, 1, 1, name="head_conv0")(path_1)
        hft = interpolate(hft, scale_factor=2, align_corners=True)
        hft = Conv(self.head_features_2, 3, 1, 1, name="head_conv2")(hft)
        hft = nn.relu(hft)
        if not self.head_out_1:
            return hft
        out = Conv(1, 1, name="head_conv4")(hft)
        if self.non_negative:
            out = nn.relu(out)
        return out[..., 0]


class DPTDepthModel(DPT):
    """Alias with the reference's class name (dpt_depth.py:269-293)."""
