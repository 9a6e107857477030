"""Structural tests of the FULL flagship torch-import key map: synthesize the
complete key surface of a trained MidasNetSemantics checkpoint (reference
naming: src/network/midas_semantics.py:153-205 + dpt_depth.py:32-153 +
facebookresearch/dinov2 ViT naming) with tensors shaped from our params, and
require a 100% mapped, 0-mismatch merge. Mirrors test_torch_import_midas.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.models import MidasNetSemantics
from mde_tpu.nn.vit import VIT_CONFIGS, ViT
from mde_tpu.train.torch_import import (
    import_state_dict,
    map_dinov2_key,
    map_midas_semantics_key,
)
from tests.test_torch_import_midas import reference_style_keys

BN_LEAVES = ("weight", "bias", "running_mean", "running_var")


def dinov2_keys(depth: int = 12):
    keys = ["cls_token", "pos_embed", "mask_token",
            "patch_embed.proj.weight", "patch_embed.proj.bias"]
    for i in range(depth):
        for sub in ("norm1", "norm2"):
            keys += [f"blocks.{i}.{sub}.weight", f"blocks.{i}.{sub}.bias"]
        for sub in ("qkv", "proj"):
            keys += [f"blocks.{i}.attn.{sub}.weight", f"blocks.{i}.attn.{sub}.bias"]
        keys += [f"blocks.{i}.ls1.gamma", f"blocks.{i}.ls2.gamma"]
        for sub in ("fc1", "fc2"):
            keys += [f"blocks.{i}.mlp.{sub}.weight", f"blocks.{i}.mlp.{sub}.bias"]
    keys += ["norm.weight", "norm.bias"]
    return keys


def dinov2_head_keys():
    keys = []
    for i in range(4):
        keys += [f"projects.{i}.weight", f"projects.{i}.bias"]
    for i in (0, 1, 3):  # 2 is Identity
        keys += [f"resize_layers.{i}.weight", f"resize_layers.{i}.bias"]
    for k in range(1, 5):
        keys.append(f"scratch.layer{k}_rn.weight")
        for rcu in (1, 2):
            for conv in (1, 2):
                keys += [
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.weight",
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.bias",
                ]
        keys += [f"scratch.refinenet{k}.out_conv.weight",
                 f"scratch.refinenet{k}.out_conv.bias"]
    keys += ["scratch.output_conv1.weight", "scratch.output_conv1.bias",
             "scratch.output_conv2.0.weight", "scratch.output_conv2.0.bias"]
    return keys


def cross_attention_keys():
    keys = []
    for sub in ("norm_q", "norm_k", "norm_v", "norm_out"):
        keys += [f"{sub}.weight", f"{sub}.bias"]
    keys += ["q.weight", "k.weight", "v.weight", "proj.weight", "proj.bias"]
    for seq in ("spatial_reduction", "spatial_upsample"):
        for idx in (0, 3, 6):
            keys += [f"{seq}.{idx}.weight", f"{seq}.{idx}.bias"]
        for idx in (1, 4, 7):
            keys += [f"{seq}.{idx}.{leaf}" for leaf in BN_LEAVES]
    return keys


def residual_block_keys(base: str, with_shortcut: bool):
    keys = [f"{base}.conv1.weight", f"{base}.conv2.weight"]
    keys += [f"{base}.bn1.{leaf}" for leaf in BN_LEAVES]
    keys += [f"{base}.bn2.{leaf}" for leaf in BN_LEAVES]
    if with_shortcut:
        keys.append(f"{base}.shortcut.0.weight")
        keys += [f"{base}.shortcut.1.{leaf}" for leaf in BN_LEAVES]
    return keys


def flagship_checkpoint_keys():
    keys = []
    for k in reference_style_keys():
        if k.startswith("scratch.output_conv.4."):
            continue  # removed by the reference's own head surgery
        keys.append(k)
    keys += [f"dinov2.{k}" for k in dinov2_keys()]
    keys += [f"dinov2_head.{k}" for k in dinov2_head_keys()]
    keys += [f"cross_attention.{k}" for k in cross_attention_keys()]
    keys += residual_block_keys("fusion_blocks.0", with_shortcut=False)
    keys += residual_block_keys("fusion_head.0", with_shortcut=True)
    keys += ["fusion_head.1.weight", "fusion_head.1.bias"]
    keys += [f"fusion_head.2.{leaf}" for leaf in BN_LEAVES]
    keys += residual_block_keys("depth_head.0", with_shortcut=True)
    keys += ["depth_head.1.weight", "depth_head.1.bias"]
    return keys


def _torch_shape(path_shape, kind):
    if kind in ("conv", "depthwise_conv"):
        return (path_shape[3], path_shape[2], path_shape[0], path_shape[1])
    if kind == "conv_transpose":
        return (path_shape[2], path_shape[3], path_shape[0], path_shape[1])
    if kind == "linear":
        return (path_shape[1], path_shape[0])
    return tuple(path_shape)


# mask_token + the dead refinenet weights on both scratch trees
EXPECTED_DEAD = (
    ["dinov2.mask_token"]
    + [
        f"{tree}refinenet4.resConfUnit1.conv{c}.{leaf}"
        for tree in ("scratch.", "dinov2_head.scratch.")
        for c in (1, 2)
        for leaf in ("weight", "bias")
    ]
)


def test_flagship_map_covers_full_checkpoint_surface():
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables["batch_stats"]))

    sd = {}
    dead = []
    for tkey in flagship_checkpoint_keys():
        mapped = map_midas_semantics_key(tkey)
        if mapped is None:
            dead.append(tkey)
            continue
        coll, path, kind = mapped
        target = flat_p if coll == "params" else flat_s
        assert path in target, f"{tkey} -> {path} missing in our tree"
        sd[tkey] = np.random.default_rng(len(sd)).standard_normal(
            _torch_shape(np.shape(target[path]), kind)
        ).astype(np.float32)

    assert sorted(dead) == sorted(EXPECTED_DEAD), (
        f"unexpected unmapped keys: {sorted(set(dead) ^ set(EXPECTED_DEAD))}"
    )

    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_semantics_key
    )
    assert report["loaded"] == len(sd)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unmapped"], report["unmapped"][:5]

    # Coverage the other way: every flax param leaf received a checkpoint value
    # (except pos_embed-adjacent ones that do exist — spot-check a few).
    new_flat = traverse_util.flatten_dict(dict(params))
    qkv = new_flat[("dinov2", "blocks_0", "attn", "qkv", "kernel")]
    want = np.transpose(sd["dinov2.blocks.0.attn.qkv.weight"], (1, 0))
    np.testing.assert_array_equal(np.asarray(qkv), want)
    ct = new_flat[("cross_attention", "spatial_upsample_conv0", "kernel")]
    want = np.transpose(sd["cross_attention.spatial_upsample.0.weight"], (2, 3, 0, 1))
    np.testing.assert_array_equal(np.asarray(ct), want)


def test_flagship_map_reaches_every_param_leaf():
    """Inverse coverage: every leaf of our flagship tree is writable from some
    reference checkpoint key (i.e. nothing in our model silently trains from
    random init when a full checkpoint is ingested)."""
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_p = set(traverse_util.flatten_dict(dict(variables["params"])))
    flat_s = set(traverse_util.flatten_dict(dict(variables["batch_stats"])))

    covered_p, covered_s = set(), set()
    for tkey in flagship_checkpoint_keys():
        mapped = map_midas_semantics_key(tkey)
        if mapped is None:
            continue
        coll, path, _ = mapped
        (covered_p if coll == "params" else covered_s).add(path)

    missing_p = flat_p - covered_p
    missing_s = flat_s - covered_s
    assert not missing_p, f"param leaves no checkpoint key reaches: {sorted(missing_p)[:10]}"
    assert not missing_s, f"batch_stats leaves unreachable: {sorted(missing_s)[:10]}"


def test_standalone_dinov2_map():
    vit = ViT("dinov2_vits14")
    variables = vit.init(jax.random.key(0), jnp.zeros((1, 28, 42, 3)), n_layers=4)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))

    sd = {}
    for tkey in dinov2_keys():
        mapped = map_dinov2_key(tkey)
        if tkey == "mask_token":
            assert mapped is None
            continue
        assert mapped is not None, tkey
        _, path, kind = mapped
        assert path in flat_p, f"{tkey} -> {path}"
        sd[tkey] = np.zeros(_torch_shape(np.shape(flat_p[path]), kind), np.float32)

    _, _, report = import_state_dict(sd, variables["params"], {}, map_dinov2_key)
    assert report["loaded"] == len(sd)
    assert not report["shape_mismatch"] and not report["unmapped"]
    # full inverse coverage too
    covered = {map_dinov2_key(k)[1] for k in sd}
    assert covered == set(flat_p)
