"""Backbone zoo (SURVEY.md §2.4): DPT over BEiT/Swin/SwinV2/LeViT + registry
surface. Reduced widths/sizes for CPU speed; grids respect each family's
divisibility constraints (window size for swin, /64 for levit)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.models.dpt import DPT_BACKBONE_HOOKS, DPTDepthModel
from mde_tpu.models.model_loader import DEFAULT_MODELS, load_model
from mde_tpu.nn.registry import ENCODER_REGISTRY, encoder_channels, make_encoder
from mde_tpu.nn.swin import SwinBackbone, swin_stage_channels


@pytest.mark.parametrize(
    "backbone,size,out_size",
    [
        ("swin2t16_256", (64, 64), (64, 64)),
        ("beitb16_384", (64, 96), (64, 96)),
        # levit's stem_b4_transpose uses k3/s2/p1 ConvTranspose (torch
        # arithmetic: H -> 2H-1), so the output is NOT input-sized — exactly
        # the reference geometry (backbones/levit.py:86-96); its run() resizes
        # predictions back to the original size afterwards.
        ("levit_384", (64, 64), (58, 58)),
    ],
)
def test_dpt_backbone_forward(backbone, size, out_size):
    m = DPTDepthModel(backbone=backbone, features=32)
    x = jnp.zeros((1, *size, 3), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, *out_size)
    assert float(jnp.min(out)) >= 0.0


def test_swin_stage_pyramid():
    bb = SwinBackbone("swin2t16_256")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = bb.init(jax.random.key(0), x, train=False)
    feats = bb.apply(v, x, train=False)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 96),
        (1, 8, 8, 192),
        (1, 4, 4, 384),
        (1, 2, 2, 768),
    ]
    assert swin_stage_channels("swinl12_384") == [192, 384, 768, 1536]


def test_beit_rel_pos_bias_resizes():
    """BEiT must run at a grid different from its pretraining grid (the
    interpolated-bias-table mechanism of backbones/beit.py:29-62)."""
    from mde_tpu.nn.beit import BEiT

    bb = BEiT("beitb16_384")  # pretrain grid 24x24
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)  # grid 2x3
    v = bb.init(jax.random.key(0), x, out_indices=(2, 5, 8, 11), train=False)
    taps = bb.apply(v, x, out_indices=(2, 5, 8, 11), train=False)
    assert len(taps) == 4 and taps[0].shape == (1, 1 + 2 * 3, 768)


def test_registry_covers_reference_dispatch():
    """Every name of the reference's _make_encoder (blocks.py:32-130) resolves."""
    reference_names = {
        "beitl16_512", "beitl16_384", "beitb16_384",
        "swin2l24_384", "swin2b24_384", "swin2t16_256", "swinl12_384",
        "next_vit_large_6m", "levit_384",
        "vitl16_384", "vitb_rn50_384", "vitb16_384",
        "resnext101_wsl", "efficientnet_lite3",
    }
    assert reference_names <= set(ENCODER_REGISTRY)
    assert encoder_channels("swinl12_384") == [192, 384, 768, 1536]
    assert encoder_channels("levit_384") == [384, 512, 768]
    # 4-feature-map builders construct; token backbones route through DPT
    make_encoder("efficientnet_lite3")
    make_encoder("resnext101_wsl")
    with pytest.raises(NotImplementedError):
        make_encoder("swinl12_384")  # token/hierarchical: route through DPT


def test_hook_table_matches_reference():
    """The hook indices of dpt_depth.py:173-186, name for name."""
    assert DPT_BACKBONE_HOOKS["beitl16_512"] == (5, 11, 17, 23)
    assert DPT_BACKBONE_HOOKS["beitb16_384"] == (2, 5, 8, 11)
    assert DPT_BACKBONE_HOOKS["swin2t16_256"] == (1, 1, 5, 1)
    assert DPT_BACKBONE_HOOKS["levit_384"] == (3, 11, 21)
    assert DPT_BACKBONE_HOOKS["vitb_rn50_384"] == (0, 1, 8, 11)


def test_model_loader_table():
    """All 14 default_models entries exist (model_loader.py:11-26 surface)."""
    assert len(DEFAULT_MODELS) == 14
    model, size, transform = load_model("dpt_swin2_tiny_256")
    assert size == (256, 256)
    sample = {"image": np.random.default_rng(0).random((300, 400, 3)).astype(np.float32)}
    out = transform(sample)
    # HWC (NHWC framework; the reference's CHW transpose was a torch-ism),
    # sides snapped to /32 by the swin256 pipeline.
    assert out["image"].shape[-1] == 3
    assert out["image"].shape[0] % 32 == 0 and out["image"].shape[1] % 32 == 0
    with pytest.raises(NotImplementedError):
        load_model("openvino_midas_v21_small_256")
    with pytest.raises(ValueError):
        load_model("nope")
