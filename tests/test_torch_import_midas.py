"""Structural test of the MiDaS_small torch-import key map: synthesize a
reference-style state dict (the exact key grammar of a midas_v21_small
checkpoint: gen-efficientnet Sequential slicing + scratch/refinenet/output_conv
naming) with tensors shaped from our params, and require a 100% mapped,
0-mismatch merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.models import MidasNetSmall
from mde_tpu.train.torch_import import import_state_dict, map_midas_small_key

# lite3 stage layout: (reps, expand) per stage (nn/efficientnet.py).
LITE3_STAGES = [(1, 1), (3, 6), (3, 6), (5, 6), (5, 6), (6, 6), (1, 6)]
# (layer, slot) per stage — the Sequential slicing of blocks.py:176-186.
STAGE_SLOT = {0: (1, 3), 1: (1, 4), 2: (2, 0), 3: (3, 0), 4: (3, 1), 5: (4, 0), 6: (4, 1)}

BN_LEAVES = ("weight", "bias", "running_mean", "running_var")


def reference_style_keys():
    keys = ["pretrained.layer1.0.weight"]
    keys += [f"pretrained.layer1.1.{leaf}" for leaf in BN_LEAVES]
    for stage, (reps, expand) in enumerate(LITE3_STAGES):
        layer, slot = STAGE_SLOT[stage]
        for rep in range(reps):
            base = f"pretrained.layer{layer}.{slot}.{rep}"
            if expand == 1:  # DepthwiseSeparableConv naming
                mods = [("conv_dw", "conv"), ("bn1", "bn"), ("conv_pw", "conv"), ("bn2", "bn")]
            else:  # InvertedResidual naming
                mods = [
                    ("conv_pw", "conv"), ("bn1", "bn"), ("conv_dw", "conv"),
                    ("bn2", "bn"), ("conv_pwl", "conv"), ("bn3", "bn"),
                ]
            for mod, kind in mods:
                if kind == "conv":
                    keys.append(f"{base}.{mod}.weight")
                else:
                    keys += [f"{base}.{mod}.{leaf}" for leaf in BN_LEAVES]
    for k in range(1, 5):
        keys.append(f"scratch.layer{k}_rn.weight")
        for rcu in (1, 2):
            for conv in (1, 2):
                keys += [
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.weight",
                    f"scratch.refinenet{k}.resConfUnit{rcu}.conv{conv}.bias",
                ]
        keys += [f"scratch.refinenet{k}.out_conv.weight", f"scratch.refinenet{k}.out_conv.bias"]
    for idx in (0, 2, 4):
        keys += [f"scratch.output_conv.{idx}.weight", f"scratch.output_conv.{idx}.bias"]
    return keys


def test_midas_small_map_covers_reference_checkpoint_surface():
    model = MidasNetSmall()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables["batch_stats"]))

    # Build the fake torch state dict with correctly-shaped tensors by
    # inverting our own layout conversions.
    sd = {}
    expected_dead = 0
    for tkey in reference_style_keys():
        mapped = map_midas_small_key(tkey)
        if "refinenet4.resConfUnit1" in tkey:
            # Dead weights in the reference (refinenet4 has no skip input);
            # intentionally unmapped.
            assert mapped is None
            expected_dead += 1
            continue
        assert mapped is not None, f"unmapped reference key: {tkey}"
        coll, path, kind = mapped
        target = flat_p if coll == "params" else flat_s
        assert path in target, f"{tkey} -> {path} missing in our tree"
        shape = np.shape(target[path])
        if kind in ("conv", "depthwise_conv"):
            torch_shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO -> OIHW
        elif kind == "conv_transpose":
            torch_shape = (shape[2], shape[3], shape[0], shape[1])
        elif kind == "linear":
            torch_shape = (shape[1], shape[0])
        else:
            torch_shape = shape
        sd[tkey] = np.random.default_rng(len(sd)).standard_normal(torch_shape).astype(np.float32)

    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_small_key
    )
    assert report["loaded"] == len(sd)
    assert not report["shape_mismatch"]
    assert not report["unmapped"]
    assert expected_dead == 4  # 2 convs x (weight, bias)

    # Spot-check a round-trip: the stem conv kernel landed transposed correctly.
    got = traverse_util.flatten_dict(dict(params))[
        ("pretrained", "conv_stem", "Conv_0", "kernel")
    ]
    want = np.transpose(sd["pretrained.layer1.0.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_strict_false_merge_skips_mismatched_shapes():
    model = MidasNetSmall()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    sd = {
        "scratch.layer1_rn.weight": np.zeros((999, 32, 3, 3), np.float32),  # wrong out ch
        "scratch.output_conv.0.bias": np.zeros((32,), np.float32),          # correct
        "something.unknown": np.zeros((1,), np.float32),
    }
    _, _, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_small_key
    )
    assert report["loaded"] == 1
    assert report["shape_mismatch"] == ["scratch.layer1_rn.weight"]
    assert report["unmapped"] == ["something.unknown"]


def test_semantics_bootstrap_from_midas_small_checkpoint():
    """The reference loads midas_v21_small weights into the semantics model
    with shape-filtered strict=False merging (src/main.py:451-462): encoder +
    decoder keys land under the midas branch, the removed head 1x1 is skipped."""
    from mde_tpu.models import MidasNetSemantics
    from mde_tpu.train.torch_import import import_state_dict, map_midas_semantics_key

    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))

    loaded, skipped_head, dead = 0, 0, 0
    sd = {}
    for tkey in reference_style_keys():
        mapped = map_midas_semantics_key(tkey)
        if tkey.startswith("scratch.output_conv.4."):
            assert mapped is None  # head surgery removed this layer
            skipped_head += 1
            continue
        if "refinenet4.resConfUnit1" in tkey:
            assert mapped is None
            dead += 1
            continue
        assert mapped is not None, tkey
        coll, path, kind = mapped
        assert path[0] == "midas"
        if coll == "params":
            assert path in flat_p, f"{tkey} -> {path}"
            loaded += 1
    assert skipped_head == 2 and dead == 4 and loaded > 100
