"""Structural tests of the round-2 torch-import key maps: MiDaS v2.1
(ResNeXt101), DPT Large/Hybrid (timm ViT naming under ``pretrained.model``),
DPT-BEiT, DPT-Swin V1/V2, and Depth-Anything-V2. Mirrors
test_torch_import_semantics.py: synthesize the complete checkpoint key surface
with torch-shaped tensors, require a 100%-mapped 0-mismatch merge, and require
inverse coverage (every flax param leaf reachable from some checkpoint key).

Reference naming sources: src/network/blocks.py:189-199 (_make_resnet_backbone
Sequential slicing), src/network/dpt_depth.py + backbones/utils.py:144-249
(act_postprocess), timm model naming the reference's torch.hub/timm loads
depend on (vit_large_patch16_384, vit_base_r50_s16_384, beit, swin/swinv2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.models.depth_anything import DepthAnythingV2
from mde_tpu.models.dpt import DPTDepthModel
from mde_tpu.models.midas_net import MidasNet
from mde_tpu.train.torch_import import (
    _preprocess_swin_v2,
    import_state_dict,
    map_depth_anything_key,
    map_dpt_beit_key,
    map_dpt_key,
    map_dpt_swin_key,
    map_midas_net_key,
)

BN_LEAVES = ("weight", "bias", "running_mean", "running_var")


# ---------------------------------------------------------------- key builders

def resnext101_keys():
    """torchvision resnext101_32x8d under _make_resnet_backbone slicing."""
    keys = ["pretrained.layer1.0.weight"]
    keys += [f"pretrained.layer1.1.{l}" for l in BN_LEAVES]
    depths = {1: 3, 2: 4, 3: 23, 4: 3}
    for li, depth in depths.items():
        base = "pretrained.layer1.4" if li == 1 else f"pretrained.layer{li}"
        for bi in range(depth):
            for n in (1, 2, 3):
                keys.append(f"{base}.{bi}.conv{n}.weight")
                keys += [f"{base}.{bi}.bn{n}.{l}" for l in BN_LEAVES]
            if bi == 0:  # every stage's first block has a projection shortcut
                keys.append(f"{base}.{bi}.downsample.0.weight")
                keys += [f"{base}.{bi}.downsample.1.{l}" for l in BN_LEAVES]
    return keys


def midas_scratch_keys(head_indices=(0, 2, 4), out_conv=False):
    keys = []
    for k in range(1, 5):
        keys.append(f"scratch.layer{k}_rn.weight")
        for rcu in (1, 2):
            for conv in (1, 2):
                keys += [
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.weight",
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.bias",
                ]
        if out_conv:
            keys += [f"scratch.refinenet{k}.out_conv.weight",
                     f"scratch.refinenet{k}.out_conv.bias"]
    for i in head_indices:
        keys += [f"scratch.output_conv.{i}.weight", f"scratch.output_conv.{i}.bias"]
    return keys


def timm_vit_block_keys(i, prefix="pretrained.model"):
    keys = []
    for sub in ("norm1", "norm2"):
        keys += [f"{prefix}.blocks.{i}.{sub}.weight", f"{prefix}.blocks.{i}.{sub}.bias"]
    for sub in ("qkv", "proj"):
        keys += [f"{prefix}.blocks.{i}.attn.{sub}.weight",
                 f"{prefix}.blocks.{i}.attn.{sub}.bias"]
    for sub in ("fc1", "fc2"):
        keys += [f"{prefix}.blocks.{i}.mlp.{sub}.weight",
                 f"{prefix}.blocks.{i}.mlp.{sub}.bias"]
    return keys


def act_postprocess_keys(levels=(1, 2, 3, 4), resizes=(1, 2, 4)):
    keys = []
    for n in levels:
        keys += [f"pretrained.act_postprocess{n}.0.project.0.weight",
                 f"pretrained.act_postprocess{n}.0.project.0.bias"]
        keys += [f"pretrained.act_postprocess{n}.3.weight",
                 f"pretrained.act_postprocess{n}.3.bias"]
    for n in resizes:
        keys += [f"pretrained.act_postprocess{n}.4.weight",
                 f"pretrained.act_postprocess{n}.4.bias"]
    return keys


def dpt_vit_keys(depth=12):
    keys = ["pretrained.model.cls_token", "pretrained.model.pos_embed",
            "pretrained.model.patch_embed.proj.weight",
            "pretrained.model.patch_embed.proj.bias",
            "pretrained.model.norm.weight", "pretrained.model.norm.bias"]
    for i in range(depth):
        keys += timm_vit_block_keys(i)
    keys += act_postprocess_keys()
    keys += midas_scratch_keys(out_conv=True)
    return keys


def resnetv2_keys(prefix="pretrained.model.patch_embed.backbone"):
    keys = [f"{prefix}.stem.conv.weight",
            f"{prefix}.stem.norm.weight", f"{prefix}.stem.norm.bias"]
    for si, depth in enumerate((3, 4, 9)):
        for bi in range(depth):
            base = f"{prefix}.stages.{si}.blocks.{bi}"
            for n in (1, 2, 3):
                keys.append(f"{base}.conv{n}.weight")
                keys += [f"{base}.norm{n}.weight", f"{base}.norm{n}.bias"]
            if bi == 0:
                keys.append(f"{base}.downsample.conv.weight")
    return keys


def dpt_hybrid_keys():
    keys = ["pretrained.model.cls_token", "pretrained.model.pos_embed",
            "pretrained.model.patch_embed.proj.weight",
            "pretrained.model.patch_embed.proj.bias",
            "pretrained.model.norm.weight", "pretrained.model.norm.bias"]
    keys += resnetv2_keys()
    for i in range(12):
        keys += timm_vit_block_keys(i)
    keys += act_postprocess_keys(levels=(3, 4), resizes=(4,))
    keys += midas_scratch_keys(out_conv=True)
    return keys


def beit_keys(depth=12):
    keys = ["pretrained.model.cls_token",
            "pretrained.model.patch_embed.proj.weight",
            "pretrained.model.patch_embed.proj.bias"]
    for i in range(depth):
        base = f"pretrained.model.blocks.{i}"
        for sub in ("norm1", "norm2"):
            keys += [f"{base}.{sub}.weight", f"{base}.{sub}.bias"]
        keys += [f"{base}.gamma_1", f"{base}.gamma_2"]
        keys += [f"{base}.attn.qkv.weight", f"{base}.attn.q_bias",
                 f"{base}.attn.v_bias",
                 f"{base}.attn.relative_position_bias_table",
                 f"{base}.attn.relative_position_index",
                 f"{base}.attn.proj.weight", f"{base}.attn.proj.bias"]
        for sub in ("fc1", "fc2"):
            keys += [f"{base}.mlp.{sub}.weight", f"{base}.mlp.{sub}.bias"]
    keys += act_postprocess_keys()
    keys += midas_scratch_keys(out_conv=True)
    return keys


def swin_keys(depths, version):
    keys = ["pretrained.model.patch_embed.proj.weight",
            "pretrained.model.patch_embed.proj.bias",
            "pretrained.model.patch_embed.norm.weight",
            "pretrained.model.patch_embed.norm.bias",
            "pretrained.model.norm.weight", "pretrained.model.norm.bias"]
    for si, depth in enumerate(depths):
        for bi in range(depth):
            base = f"pretrained.model.layers.{si}.blocks.{bi}"
            for sub in ("norm1", "norm2"):
                keys += [f"{base}.{sub}.weight", f"{base}.{sub}.bias"]
            keys.append(f"{base}.attn.qkv.weight")
            if version == 1:
                keys.append(f"{base}.attn.qkv.bias")
                keys += [f"{base}.attn.relative_position_bias_table",
                         f"{base}.attn.relative_position_index"]
            else:
                keys += [f"{base}.attn.q_bias", f"{base}.attn.v_bias",
                         f"{base}.attn.logit_scale",
                         f"{base}.attn.cpb_mlp.0.weight",
                         f"{base}.attn.cpb_mlp.0.bias",
                         f"{base}.attn.cpb_mlp.2.weight",
                         f"{base}.attn.relative_coords_table",
                         f"{base}.attn.relative_position_index"]
            keys += [f"{base}.attn.proj.weight", f"{base}.attn.proj.bias"]
            for sub in ("fc1", "fc2"):
                keys += [f"{base}.mlp.{sub}.weight", f"{base}.mlp.{sub}.bias"]
        if si < len(depths) - 1:
            keys.append(f"pretrained.model.layers.{si}.downsample.reduction.weight")
            keys += [f"pretrained.model.layers.{si}.downsample.norm.weight",
                     f"pretrained.model.layers.{si}.downsample.norm.bias"]
    keys += midas_scratch_keys(out_conv=True)
    return keys


def dinov2_trunk_keys(depth=12, prefix="pretrained"):
    keys = [f"{prefix}.cls_token", f"{prefix}.pos_embed", f"{prefix}.mask_token",
            f"{prefix}.patch_embed.proj.weight", f"{prefix}.patch_embed.proj.bias",
            f"{prefix}.norm.weight", f"{prefix}.norm.bias"]
    for i in range(depth):
        base = f"{prefix}.blocks.{i}"
        for sub in ("norm1", "norm2"):
            keys += [f"{base}.{sub}.weight", f"{base}.{sub}.bias"]
        for sub in ("qkv", "proj"):
            keys += [f"{base}.attn.{sub}.weight", f"{base}.attn.{sub}.bias"]
        keys += [f"{base}.ls1.gamma", f"{base}.ls2.gamma"]
        for sub in ("fc1", "fc2"):
            keys += [f"{base}.mlp.{sub}.weight", f"{base}.mlp.{sub}.bias"]
    return keys


def depth_anything_keys():
    keys = dinov2_trunk_keys()
    for i in range(4):
        keys += [f"depth_head.projects.{i}.weight", f"depth_head.projects.{i}.bias"]
    for i in (0, 1, 3):
        keys += [f"depth_head.resize_layers.{i}.weight",
                 f"depth_head.resize_layers.{i}.bias"]
    for k in range(1, 5):
        keys.append(f"depth_head.scratch.layer{k}_rn.weight")
        for rcu in (1, 2):
            for conv in (1, 2):
                keys += [
                    f"depth_head.scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.weight",
                    f"depth_head.scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.bias",
                ]
        keys += [f"depth_head.scratch.refinenet{k}.out_conv.weight",
                 f"depth_head.scratch.refinenet{k}.out_conv.bias"]
    keys += ["depth_head.scratch.output_conv1.weight",
             "depth_head.scratch.output_conv1.bias",
             "depth_head.scratch.output_conv2.0.weight",
             "depth_head.scratch.output_conv2.0.bias",
             "depth_head.scratch.output_conv2.2.weight",
             "depth_head.scratch.output_conv2.2.bias"]
    return keys


# ----------------------------------------------------------------- harness

def _torch_shape(path_shape, kind):
    if kind in ("conv", "depthwise_conv"):
        return (path_shape[3], path_shape[2], path_shape[0], path_shape[1])
    if kind == "conv_transpose":
        return (path_shape[2], path_shape[3], path_shape[0], path_shape[1])
    if kind == "linear":
        return (path_shape[1], path_shape[0])
    return tuple(path_shape)


def _synth_value(tkey, entries, flat_p, flat_s):
    """Build a torch-shaped tensor for ``tkey`` given its mapped entries."""
    first = entries[0]
    coll, path, kind = first
    target = flat_p if coll == "params" else flat_s
    assert path in target, f"{tkey} -> {path} missing in our tree"
    leaf_shape = np.shape(target[path])
    if callable(kind):
        if len(entries) == 3:  # fused qkv weight: three (C, C) kernels
            c = leaf_shape[0]
            return np.random.standard_normal((3 * c, c)).astype(np.float32)
        if tkey.endswith("downsample.reduction.weight"):
            return np.random.standard_normal(
                (leaf_shape[1], leaf_shape[0])).astype(np.float32)
        # permuted norm vector: same shape as the leaf
        return np.random.standard_normal(leaf_shape).astype(np.float32)
    return np.random.standard_normal(_torch_shape(leaf_shape, kind)).astype(np.float32)


def run_structural(model, example, key_map, torch_keys, expected_dead,
                   preprocess=None, method_kwargs=None):
    variables = model.init(jax.random.key(0), example, train=False,
                           **(method_kwargs or {}))
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables.get("batch_stats", {})))

    sd, dead = {}, []
    for tkey in torch_keys:
        if preprocess is not None and (tkey.endswith(".q_bias") or tkey.endswith(".v_bias")):
            continue  # folded into qkv.bias by the preprocessor before mapping
        mapped = key_map(tkey)
        if mapped is None:
            dead.append(tkey)
            continue
        entries = mapped if isinstance(mapped, list) else [mapped]
        sd[tkey] = _synth_value(tkey, entries, flat_p, flat_s)
    if preprocess is not None:
        # q/v biases need real values of the right length: take C from the
        # fused qkv kernel leaf of the same block.
        for tkey in torch_keys:
            if tkey.endswith(".q_bias") or tkey.endswith(".v_bias"):
                base = tkey.rsplit(".", 1)[0]
                mapped = key_map(f"{base}.qkv.weight")
                _, path, _ = mapped if not isinstance(mapped, list) else mapped[0]
                c = np.shape(flat_p[path])[1] // 3
                sd[tkey] = np.random.standard_normal((c,)).astype(np.float32)
        sd = preprocess(sd)

    assert sorted(dead) == sorted(expected_dead), (
        f"unexpected dead-key delta: {sorted(set(dead) ^ set(expected_dead))}"
    )

    params, stats, report = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}), key_map
    )
    assert report["loaded"] == len(sd)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unmapped"], report["unmapped"][:5]

    # inverse coverage: every flax leaf writable from some checkpoint key
    covered_p, covered_s = set(), set()
    for tkey in sd:
        mapped = key_map(tkey)
        for coll, path, _ in (mapped if isinstance(mapped, list) else [mapped]):
            (covered_p if coll == "params" else covered_s).add(path)
    missing_p = set(flat_p) - covered_p
    missing_s = set(flat_s) - covered_s
    assert not missing_p, f"unreachable param leaves: {sorted(missing_p)[:10]}"
    assert not missing_s, f"unreachable batch_stats leaves: {sorted(missing_s)[:10]}"
    return params, stats


DEAD_FFB = [f"scratch.refinenet4.resConfUnit1.conv{c}.{l}"
            for c in (1, 2) for l in ("weight", "bias")]


def test_midas_net_map():
    run_structural(
        MidasNet(features=256),
        jnp.zeros((1, 64, 96, 3)),
        map_midas_net_key,
        resnext101_keys() + midas_scratch_keys(),
        expected_dead=DEAD_FFB,
    )


def test_dpt_large_map():
    # vitb16 keeps the test light; the map is depth-agnostic.
    run_structural(
        DPTDepthModel(backbone="vitb16_384", features=64),
        jnp.zeros((1, 64, 96, 3)),
        map_dpt_key,
        dpt_vit_keys(depth=12),
        expected_dead=DEAD_FFB
        + ["pretrained.model.norm.weight", "pretrained.model.norm.bias"],
    )


def test_dpt_hybrid_map():
    import functools

    run_structural(
        DPTDepthModel(backbone="vitb_rn50_384", features=64),
        jnp.zeros((1, 64, 96, 3)),
        functools.partial(map_dpt_key, hybrid=True),
        dpt_hybrid_keys(),
        expected_dead=DEAD_FFB
        + ["pretrained.model.norm.weight", "pretrained.model.norm.bias"],
    )


def test_dpt_beit_map():
    dead = DEAD_FFB + [
        f"pretrained.model.blocks.{i}.attn.relative_position_index"
        for i in range(12)
    ]
    run_structural(
        DPTDepthModel(backbone="beitb16_384", features=64),
        jnp.zeros((1, 64, 96, 3)),
        map_dpt_beit_key,
        beit_keys(depth=12),
        expected_dead=dead,
    )


def test_dpt_swin_v1_map():
    import functools

    depths = (2, 2, 18, 2)
    dead = DEAD_FFB + ["pretrained.model.norm.weight", "pretrained.model.norm.bias"]
    dead += [f"pretrained.model.layers.{s}.blocks.{b}.attn.relative_position_index"
             for s, d in enumerate(depths) for b in range(d)]
    run_structural(
        DPTDepthModel(backbone="swinl12_384", features=64),
        jnp.zeros((1, 96, 96, 3)),
        functools.partial(map_dpt_swin_key, version=1),
        swin_keys(depths, version=1),
        expected_dead=dead,
    )


def test_dpt_swin_v2_map():
    import functools

    depths = (2, 2, 6, 2)
    dead = DEAD_FFB + ["pretrained.model.norm.weight", "pretrained.model.norm.bias"]
    dead += [f"pretrained.model.layers.{s}.blocks.{b}.attn.{buf}"
             for s, d in enumerate(depths) for b in range(d)
             for buf in ("relative_coords_table", "relative_position_index")]
    run_structural(
        DPTDepthModel(backbone="swin2t16_256", features=64),
        jnp.zeros((1, 64, 64, 3)),
        functools.partial(map_dpt_swin_key, version=2),
        swin_keys(depths, version=2),
        expected_dead=dead,
        preprocess=_preprocess_swin_v2,
    )


def test_depth_anything_v2_map():
    dead = ["pretrained.mask_token"] + [
        f"depth_head.scratch.refinenet4.resConfUnit1.conv{c}.{l}"
        for c in (1, 2) for l in ("weight", "bias")
    ]
    run_structural(
        DepthAnythingV2(size="vits"),
        jnp.zeros((1, 56, 84, 3)),
        map_depth_anything_key,
        depth_anything_keys(),
        expected_dead=dead,
    )


def test_swin_merge_reduction_reorder_roundtrip():
    """The patch-merge group permutation must make torch and flax agree on a
    literal 2x2 merge: verify by simulating both concat orders."""
    from mde_tpu.train.torch_import import _merge_reduction_weight

    rng = np.random.default_rng(0)
    c, out = 4, 8
    w_torch = rng.standard_normal((out, 4 * c)).astype(np.float32)  # (2C, 4C)
    x = rng.standard_normal((2, 2, c)).astype(np.float32)  # one 2x2 patch

    # timm order: x0=(0,0), x1=(1,0), x2=(0,1), x3=(1,1)
    timm_cat = np.concatenate([x[0, 0], x[1, 0], x[0, 1], x[1, 1]])
    want = w_torch @ timm_cat

    # our order: reshape (2,2,C) -> (h-major) (0,0),(0,1),(1,0),(1,1)
    ours_cat = np.concatenate([x[0, 0], x[0, 1], x[1, 0], x[1, 1]])
    got = ours_cat @ _merge_reduction_weight(w_torch)
    np.testing.assert_allclose(got, want, rtol=1e-5)
