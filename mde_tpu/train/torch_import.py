"""PyTorch ``.pth`` checkpoint ingestion.

The reference bootstraps from MiDaS release checkpoints with strict=False,
shape-filtered merging (src/main.py:448-464), unwraps DataParallel ``module.``
prefixes (src/util.py:14-22) and ``{"model": ...}`` dicts
(src/network/base_model.py:11-16). This module reproduces that pipeline for the
Flax side:

1. read a torch checkpoint (torch.load on CPU),
2. strip wrapper prefixes / containers,
3. convert tensor layouts (conv OIHW->HWIO, depthwise OIHW->HWIO with the
   feature_group trailing-dim convention, linear (out,in)->(in,out),
   transposed-conv (in,out,kh,kw)->(kh,kw,in,out)),
4. map reference parameter names onto this framework's module tree,
5. merge only shape-matching leaves (strict=False semantics) and report
   loaded/missing/skipped counts.

Name maps are registered per model family; ``SimpleUNet``'s is exact (verified
numerically in tests against a torch reconstruction); the MiDaS-small encoder
map follows the gen-efficientnet Sequential slicing of blocks.py:176-186.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {remove_module_prefix(k): np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def remove_module_prefix(key: str) -> str:
    """Strip a single leading 'module.' (DataParallel wrapper, util.py:14-22)."""
    return key[len("module."):] if key.startswith("module.") else key


def convert_tensor(kind, value: np.ndarray) -> np.ndarray:
    """Layout conversion torch -> flax.

    kind: 'conv' (OIHW->HWIO), 'depthwise_conv' (O,1,H,W -> H,W,1,O),
    'conv_transpose' (I,O,H,W -> H,W,I,O), 'linear' ((out,in)->(in,out)),
    'none' (copy), or a callable value->array for irregular conversions
    (fused-qkv splits, Swin patch-merge channel reorders).
    """
    if callable(kind):
        return np.asarray(kind(value))
    if kind == "conv":
        return np.transpose(value, (2, 3, 1, 0))
    if kind == "depthwise_conv":
        return np.transpose(value, (2, 3, 1, 0))
    if kind == "conv_transpose":
        return np.transpose(value, (2, 3, 0, 1))
    if kind == "linear":
        return np.transpose(value, (1, 0))
    return value


_BN_MAP = {
    "weight": ("params", "scale", "none"),
    "bias": ("params", "bias", "none"),
    "running_mean": ("batch_stats", "mean", "none"),
    "running_var": ("batch_stats", "var", "none"),
}


def _conv_entry(flax_path: tuple, torch_suffix: str, depthwise: bool = False,
                transpose: bool = False):
    kind = "conv_transpose" if transpose else ("depthwise_conv" if depthwise else "conv")
    if torch_suffix == "weight":
        return ("params", flax_path + ("kernel",), kind)
    return ("params", flax_path + ("bias",), "none")


def map_simple_unet_key(key: str):
    """notebook SimpleUNet naming -> our module tree (models/simple_unet.py)."""
    m = re.match(r"(enc1|enc2|dec1|dec2)\.(conv1|conv2|bn1|bn2)\.(\w+)$", key)
    if m:
        block, sub, leaf = m.groups()
        if sub.startswith("conv"):
            if leaf == "weight":
                return ("params", (block, sub, "Conv_0", "kernel"), "conv")
            return ("params", (block, sub, "Conv_0", "bias"), "none")
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, (block, sub, "BatchNorm_0", name), kind)
        return None
    m = re.match(r"final\.(\w+)$", key)
    if m:
        leaf = m.group(1)
        if leaf == "weight":
            return ("params", ("final", "Conv_0", "kernel"), "conv")
        return ("params", ("final", "Conv_0", "bias"), "none")
    return None


# (layer index, sequential slot) -> encoder stage, per the Sequential slicing
# of src/network/blocks.py:176-186 over gen-efficientnet's 7 block stages.
_EFFNET_STAGE = {
    (1, 3): 0, (1, 4): 1,
    (2, 0): 2,
    (3, 0): 3, (3, 1): 4,
    (4, 0): 5, (4, 1): 6,
}
# torch gen-efficientnet submodule -> ours, for expand==1 DepthwiseSeparableConv
# blocks (stage 0): their project conv is named conv_pw/bn2, ours conv_pwl/bn3.
_DS_BLOCK_RENAME = {"conv_dw": "conv_dw", "bn1": "bn2", "conv_pw": "conv_pwl", "bn2": "bn3"}


def map_midas_small_key(key: str):
    """Reference MidasNet_small naming -> our module tree.

    Covers the full checkpoint surface of midas_v21_small_256.pt /
    best_model_*.pth for the non-semantics model: the stage-sliced
    tf_efficientnet_lite3 encoder (pretrained.layer{1..4}.*), the scratch
    reassemble convs, the four refinenet fusion blocks, and the output head
    Sequential (indices 0/2/4 -> output_conv{0,2,4}).
    """
    m = re.match(r"pretrained\.layer1\.0\.weight$", key)
    if m:
        return ("params", ("pretrained", "conv_stem", "Conv_0", "kernel"), "conv")
    m = re.match(r"pretrained\.layer1\.1\.(\w+)$", key)
    if m:
        coll, name, kind = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return (coll, ("pretrained", "bn1", "BatchNorm_0", name), kind)
        return None

    m = re.match(r"pretrained\.layer(\d)\.(\d)\.(\d+)\.(\w+)\.(\w+)$", key)
    if m:
        layer, slot, rep, sub, leaf = m.groups()
        stage = _EFFNET_STAGE.get((int(layer), int(slot)))
        if stage is None:
            return None
        if stage == 0:  # expand==1 DS block: renamed submodules
            sub = _DS_BLOCK_RENAME.get(sub, sub)
        block = f"blocks_{stage}_{rep}"
        if sub.startswith("conv"):
            if leaf != "weight":
                return None
            kind = "depthwise_conv" if sub == "conv_dw" else "conv"
            return ("params", ("pretrained", block, sub, "Conv_0", "kernel"), kind)
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, ("pretrained", block, sub, "BatchNorm_0", name), kind)
        return None

    m = re.match(r"scratch\.layer(\d)_rn\.weight$", key)
    if m:
        return ("params", ("scratch", f"layer{m.group(1)}_rn", "Conv_0", "kernel"), "conv")

    m = re.match(r"scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\.(\w+)$", key)
    if m:
        rn, rcu, conv, leaf = m.groups()
        if rn == "4" and rcu == "1":
            # Dead weights: refinenet4 is called with a single input so its
            # resConfUnit1 never runs (blocks.py:416-420 / forward :172); the
            # torch state dict carries the params anyway. We don't instantiate
            # unreachable modules, so these are intentionally dropped.
            return None
        path = (f"refinenet{rn}", f"resConfUnit{rcu}", f"conv{conv}", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")

    m = re.match(r"scratch\.refinenet(\d)\.out_conv\.(\w+)$", key)
    if m:
        rn, leaf = m.groups()
        path = (f"refinenet{rn}", "out_conv", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")

    m = re.match(r"scratch\.output_conv\.(\d)\.(\w+)$", key)
    if m:
        idx, leaf = m.groups()
        if idx not in ("0", "2", "4"):
            return None
        path = (f"output_conv{idx}", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")

    # Optional heads behind config.yaml flags (model.network.use_lb / use_dgr).
    if key.startswith("local_bins."):
        return map_localbins_key(key[len("local_bins."):])
    if key.startswith("dgr"):
        return map_dgr_key(key)
    return None


def map_localbins_key(key: str, prefix: tuple = ("local_bins",)):
    """Reference LocalBins_Block naming (src/network/localbins_net.py:12-52,
    localbins_layers.py) -> models/localbins.py::LocalBinsBlock.

    Surface: conv2 (1x1 bottleneck conv), seed_bin_regressor / seed_projector /
    projectors.{i} / attractors.{i} ``_net`` Sequentials (convs at 0 and 2;
    activations are parameter-free), and conditional_log_binomial.mlp (convs at
    0 and 2). The LogBinomial ``k_idx`` / ``K_minus_1`` buffers are
    deterministic (arange / constant, localbins_layers.py:288-291) and are
    recomputed, not loaded.
    """
    m = re.match(r"conv2\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = prefix + ("conv2", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"(seed_bin_regressor|seed_projector)\._net\.([02])\.(weight|bias)$", key)
    if m:
        mod, idx, leaf = m.groups()
        path = prefix + (mod, f"net{idx}", "Conv_0",
                         "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"(projectors|attractors)\.(\d)\._net\.([02])\.(weight|bias)$", key)
    if m:
        kind, i, idx, leaf = m.groups()
        mod = f"{kind}_{i}"
        path = prefix + (mod, f"net{idx}", "Conv_0",
                         "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"conditional_log_binomial\.mlp\.([02])\.(weight|bias)$", key)
    if m:
        idx, leaf = m.groups()
        path = prefix + ("conditional_log_binomial", f"mlp{idx}", "Conv_0",
                         "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    if re.match(r"conditional_log_binomial\.log_binomial_transform\.(k_idx|K_minus_1)$", key):
        return None  # deterministic buffers, recomputed (models/localbins.py)
    return None


def map_dgr_key(key: str):
    """Reference DGR naming (src/network/midas_net_custom.py:14-43) ->
    models/midas_small.py::DGR (dgr1..dgr4 on layer_1_rn..layer_4_rn).

    lap2/lap3 are frozen constant Laplacian kernels (buffers-as-parameters,
    midas_net_custom.py:21-28) — recomputed, not loaded. recalib Sequential
    carries convs at indices 1 and 3 (AdaptiveAvgPool/GELU/Sigmoid are
    parameter-free); ``spatial`` is a 3x3 depthwise conv.
    """
    m = re.match(r"dgr(\d)\.(.+)$", key)
    if not m:
        return None
    n, rest = m.groups()
    base = (f"dgr{n}",)
    if re.match(r"(lap2|lap3)\.weight$", rest):
        return None  # frozen constants, rebuilt in-model
    m2 = re.match(r"recalib\.([13])\.(weight|bias)$", rest)
    if m2:
        idx, leaf = m2.groups()
        path = base + (f"recalib{idx}", "Conv_0",
                       "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m2 = re.match(r"spatial\.(weight|bias)$", rest)
    if m2:
        leaf = m2.group(1)
        path = base + ("spatial", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "depthwise_conv" if leaf == "weight" else "none")
    return None


_LN_MAP = {"weight": "scale", "bias": "bias"}


def map_dinov2_key(key: str, prefix: tuple = ()):
    """facebookresearch/dinov2 DinoVisionTransformer naming -> nn/vit.py ViT.

    Covers the full inference surface of a dinov2_vit{s,b,l}14 checkpoint:
    cls_token / pos_embed (same (1, 37*37+1, C) pretrain grid), patch_embed
    conv, per-block pre-norm attention (fused qkv Linear — identical
    (3, heads, hd) packing order on both sides), LayerScale gammas, GELU MLP,
    and the final norm. ``mask_token`` (masked-image-modeling only) is
    intentionally unmapped. Reference load site: src/network/midas_semantics.py:168-172.
    """
    if key == "cls_token":
        return ("params", prefix + ("cls_token",), "none")
    if key == "pos_embed":
        return ("params", prefix + ("pos_embed",), "none")
    if key == "mask_token":
        return None
    m = re.match(r"patch_embed\.proj\.(weight|bias)$", key)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", prefix + ("patch_embed", leaf),
                "conv" if leaf == "kernel" else "none")
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        return ("params", prefix + ("norm", "LayerNorm_0", _LN_MAP[m.group(1)]), "none")
    m = re.match(r"blocks\.(\d+)\.(norm1|norm2)\.(weight|bias)$", key)
    if m:
        i, sub, leaf = m.groups()
        return ("params", prefix + (f"blocks_{i}", sub, "LayerNorm_0", _LN_MAP[leaf]), "none")
    m = re.match(r"blocks\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)$", key)
    if m:
        i, sub, leaf = m.groups()
        if leaf == "weight":
            return ("params", prefix + (f"blocks_{i}", "attn", sub, "kernel"), "linear")
        return ("params", prefix + (f"blocks_{i}", "attn", sub, "bias"), "none")
    m = re.match(r"blocks\.(\d+)\.(ls1|ls2)\.gamma$", key)
    if m:
        i, sub = m.groups()
        return ("params", prefix + (f"blocks_{i}", sub, "gamma"), "none")
    m = re.match(r"blocks\.(\d+)\.mlp\.(fc1|fc2)\.(weight|bias)$", key)
    if m:
        i, sub, leaf = m.groups()
        if leaf == "weight":
            return ("params", prefix + (f"blocks_{i}", "mlp", sub, "kernel"), "linear")
        return ("params", prefix + (f"blocks_{i}", "mlp", sub, "bias"), "none")
    return None


def map_dinov2_head_key(key: str, prefix: tuple = ("dinov2_head",)):
    """Reference Dinov2Head naming (src/network/dpt_depth.py:32-153) ->
    models/midas_semantics.py::Dinov2Head. nclass=1 head: output_conv1 +
    output_conv2 Sequential (conv at index 0; the final 1x1 is commented out).
    resize_layers: 0/1 are ConvTranspose2d, 2 is Identity (no keys), 3 is Conv2d.
    refinenet4.resConfUnit1 is dead (single-input call), as in MiDaS-small."""
    m = re.match(r"projects\.(\d)\.(weight|bias)$", key)
    if m:
        i, leaf = m.groups()
        path = prefix + (f"projects_{i}", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"resize_layers\.(\d)\.(weight|bias)$", key)
    if m:
        i, leaf = m.groups()
        if i in ("0", "1"):  # ConvTranspose (our ConvTranspose holds kernel/bias directly)
            path = prefix + (f"resize_{i}", "kernel" if leaf == "weight" else "bias")
            return ("params", path, "conv_transpose" if leaf == "weight" else "none")
        if i == "3":
            path = prefix + ("resize_3", "Conv_0", "kernel" if leaf == "weight" else "bias")
            return ("params", path, "conv" if leaf == "weight" else "none")
        return None
    m = re.match(r"scratch\.layer(\d)_rn\.weight$", key)
    if m:
        return ("params", prefix + ("scratch", f"layer{m.group(1)}_rn", "Conv_0", "kernel"), "conv")
    m = re.match(r"scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\.(weight|bias)$", key)
    if m:
        rn, rcu, conv, leaf = m.groups()
        if rn == "4" and rcu == "1":
            return None  # dead weights (refinenet4 single-input call)
        path = prefix + (f"refinenet{rn}", f"resConfUnit{rcu}", f"conv{conv}", "Conv_0",
                         "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.refinenet(\d)\.out_conv\.(weight|bias)$", key)
    if m:
        rn, leaf = m.groups()
        path = prefix + (f"refinenet{rn}", "out_conv", "Conv_0",
                         "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.output_conv1\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = prefix + ("output_conv1", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.output_conv2\.0\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = prefix + ("output_conv2_0", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    return None


def _map_residual_block(rest: str, prefix: tuple):
    """Reference ResidualBlock naming (midas_semantics.py:129-151) -> ours.
    conv1/conv2 are bias-free; shortcut.0/.1 appear when in!=out or stride!=1."""
    m = re.match(r"(conv1|conv2)\.weight$", rest)
    if m:
        return ("params", prefix + (m.group(1), "Conv_0", "kernel"), "conv")
    m = re.match(r"(bn1|bn2)\.(\w+)$", rest)
    if m:
        sub, leaf = m.groups()
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, prefix + (sub, "BatchNorm_0", name), kind)
        return None
    m = re.match(r"shortcut\.0\.weight$", rest)
    if m:
        return ("params", prefix + ("shortcut_conv", "Conv_0", "kernel"), "conv")
    m = re.match(r"shortcut\.1\.(\w+)$", rest)
    if m:
        coll, name, kind = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return (coll, prefix + ("shortcut_bn", "BatchNorm_0", name), kind)
        return None
    return None


def map_cross_attention_key(key: str, prefix: tuple = ("cross_attention",)):
    """Reference CrossAttention naming (midas_semantics.py:14-63) -> ours.
    Sequential indices: convs at 0/3/6, BNs at 1/4/7 (ReLUs are parameter-free);
    q/k/v Linears are bias-free (qkv_bias=False), proj has a bias."""
    m = re.match(r"(norm_q|norm_k|norm_v|norm_out)\.(weight|bias)$", key)
    if m:
        sub, leaf = m.groups()
        return ("params", prefix + (sub, "LayerNorm_0", _LN_MAP[leaf]), "none")
    m = re.match(r"(q|k|v|proj)\.(weight|bias)$", key)
    if m:
        sub, leaf = m.groups()
        if leaf == "weight":
            return ("params", prefix + (sub, "kernel"), "linear")
        return ("params", prefix + (sub, "bias"), "none")
    m = re.match(r"spatial_reduction\.(\d)\.(\w+)$", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        if idx % 3 == 0:  # conv
            i = idx // 3
            path = prefix + ("spatial_reduction", f"conv{i}", "Conv_0",
                             "kernel" if leaf == "weight" else "bias")
            return ("params", path, "conv" if leaf == "weight" else "none")
        i = (idx - 1) // 3
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, prefix + ("spatial_reduction", f"bn{i}", "BatchNorm_0", name), kind)
        return None
    m = re.match(r"spatial_upsample\.(\d)\.(\w+)$", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        if idx % 3 == 0:  # ConvTranspose (kernel/bias live directly on the module)
            i = idx // 3
            path = prefix + (f"spatial_upsample_conv{i}", "kernel" if leaf == "weight" else "bias")
            return ("params", path, "conv_transpose" if leaf == "weight" else "none")
        i = (idx - 1) // 3
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, prefix + (f"spatial_upsample_bn{i}", "BatchNorm_0", name), kind)
        return None
    return None


def map_midas_semantics_key(key: str):
    """MidasNetSemantics: the complete flagship checkpoint surface.

    - MiDaS branch keys land under the 'midas' submodule; the head's final 1x1
      (output_conv.4/.5) is removed by the reference's own surgery
      (midas_semantics.py:159-163), so those keys are dropped. The surgery
      re-concatenates Sequential[0:4]+[6:], which *keeps* indices 0..3 — a
      trained semantics checkpoint therefore carries output_conv.0/.2 only.
    - dinov2.* (frozen ViT), dinov2_head.*, cross_attention.*, fusion_blocks.*,
      fusion_head.*, depth_head.* map onto the same-named flax submodules
      (models/midas_semantics.py). Reference init: midas_semantics.py:153-205.
    """
    if key.startswith("dinov2."):
        return map_dinov2_key(key[len("dinov2."):], prefix=("dinov2",))
    if key.startswith("dinov2_head."):
        return map_dinov2_head_key(key[len("dinov2_head."):])
    if key.startswith("cross_attention."):
        return map_cross_attention_key(key[len("cross_attention."):])
    m = re.match(r"fusion_blocks\.(\d)\.(.+)$", key)
    if m:
        return _map_residual_block(m.group(2), (f"fusion_blocks_{m.group(1)}",))
    m = re.match(r"fusion_head\.0\.(.+)$", key)
    if m:
        return _map_residual_block(m.group(1), ("fusion_head_0",))
    m = re.match(r"fusion_head\.1\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = ("fusion_head_1", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"fusion_head\.2\.(\w+)$", key)
    if m:
        coll, name, kind = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return (coll, ("fusion_head_bn", "BatchNorm_0", name), kind)
        return None
    m = re.match(r"depth_head\.0\.(.+)$", key)
    if m:
        return _map_residual_block(m.group(1), ("depth_head_0",))
    m = re.match(r"depth_head\.1\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = ("depth_head_1", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")

    if key.startswith("scratch.output_conv.4.") or key.startswith("scratch.output_conv.5."):
        return None  # removed by the head surgery
    if key.startswith("local_bins."):
        # The semantics model hosts LocalBins at the top level (not under the
        # midas branch): reference forward feeds it the depth-head output +
        # midas pyramid (midas_semantics.py:261-265).
        return map_localbins_key(key[len("local_bins."):])
    if key.startswith("dgr"):
        # Dead weights: MidasNetSemantics.forward never calls the DGR blocks
        # its base-class __init__ constructs (midas_semantics.py:207-267 uses
        # the plain layer_X_rn) — a use_dgr semantics checkpoint carries them
        # but they never influence the output. Intentionally dropped.
        return None
    mapped = map_midas_small_key(key)
    if mapped is None:
        return None
    coll, path, kind = mapped
    return (coll, ("midas",) + path, kind)


def _map_torchvision_bottleneck(rest: str, prefix: tuple):
    """torchvision ResNet Bottleneck naming (conv1/bn1..conv3/bn3, downsample.0/.1)
    -> nn/resnext.py::Bottleneck."""
    m = re.match(r"conv([123])\.weight$", rest)
    if m:
        return ("params", prefix + (f"conv{m.group(1)}", "Conv_0", "kernel"), "conv")
    m = re.match(r"bn([123])\.(\w+)$", rest)
    if m:
        n, leaf = m.groups()
        coll, name, kind = _BN_MAP.get(leaf, (None, None, None))
        if coll:
            return (coll, prefix + (f"bn{n}", "BatchNorm_0", name), kind)
        return None
    m = re.match(r"downsample\.0\.weight$", rest)
    if m:
        return ("params", prefix + ("downsample_conv", "Conv_0", "kernel"), "conv")
    m = re.match(r"downsample\.1\.(\w+)$", rest)
    if m:
        coll, name, kind = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return (coll, prefix + ("downsample_bn", "BatchNorm_0", name), kind)
        return None
    return None


def map_midas_net_key(key: str):
    """MiDaS v2.1 (midas_v21_384.pt) -> models/midas_net.py::MidasNet.

    Encoder naming follows _make_resnet_backbone (src/network/blocks.py:189-199):
    pretrained.layer1 = Sequential(conv1, bn1, relu, maxpool, resnet.layer1), so
    layer1.0 is the stem conv, layer1.1 the stem BN and layer1.4.N the stage-1
    bottlenecks; layer2..4 are the raw torchvision stages. Head Sequential
    carries convs at 0/2/4 (src/network/midas_net.py:39-47)."""
    m = re.match(r"pretrained\.layer1\.0\.weight$", key)
    if m:
        return ("params", ("pretrained", "conv1", "Conv_0", "kernel"), "conv")
    m = re.match(r"pretrained\.layer1\.1\.(\w+)$", key)
    if m:
        coll, name, kind = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return (coll, ("pretrained", "bn1", "BatchNorm_0", name), kind)
        return None
    m = re.match(r"pretrained\.layer1\.4\.(\d+)\.(.+)$", key)
    if m:
        bi, rest = m.groups()
        return _map_torchvision_bottleneck(rest, ("pretrained", f"layer1_{bi}"))
    m = re.match(r"pretrained\.layer([234])\.(\d+)\.(.+)$", key)
    if m:
        li, bi, rest = m.groups()
        return _map_torchvision_bottleneck(rest, ("pretrained", f"layer{li}_{bi}"))

    m = re.match(r"scratch\.layer(\d)_rn\.weight$", key)
    if m:
        return ("params", ("scratch", f"layer{m.group(1)}_rn", "Conv_0", "kernel"), "conv")
    m = re.match(r"scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\.(weight|bias)$", key)
    if m:
        rn, rcu, conv, leaf = m.groups()
        if rn == "4" and rcu == "1":
            return None  # dead: refinenet4 runs with a single input
        path = (f"refinenet{rn}", f"resConfUnit{rcu}", f"conv{conv}", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.output_conv\.([024])\.(weight|bias)$", key)
    if m:
        idx, leaf = m.groups()
        path = (f"output_conv{idx}", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    return None


def _map_timm_vit_block(rest: str, prefix: tuple):
    """timm VisionTransformer block naming (no LayerScale) -> nn/vit.py::Block."""
    m = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
    if m:
        sub, leaf = m.groups()
        return ("params", prefix + (sub, "LayerNorm_0", _LN_MAP[leaf]), "none")
    m = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", rest)
    if m:
        sub, leaf = m.groups()
        if leaf == "weight":
            return ("params", prefix + ("attn", sub, "kernel"), "linear")
        return ("params", prefix + ("attn", sub, "bias"), "none")
    m = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
    if m:
        sub, leaf = m.groups()
        if leaf == "weight":
            return ("params", prefix + ("mlp", sub, "kernel"), "linear")
        return ("params", prefix + ("mlp", sub, "bias"), "none")
    return None


def _map_dpt_reassembly_and_scratch(key: str):
    """The shared (non-trunk) surface of every MiDaS DPT checkpoint:
    pretrained.act_postprocess{1..4} readout/project/resize Sequentials
    (backbones/utils.py:144-249 naming) plus scratch convs, fusion blocks and
    the monocular head (dpt_depth.py:68-86,277-285)."""
    m = re.match(r"pretrained\.act_postprocess(\d)\.0\.project\.0\.(weight|bias)$", key)
    if m:
        n, leaf = m.groups()
        path = (f"readout_{int(n) - 1}", "project",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "linear" if leaf == "weight" else "none")
    m = re.match(r"pretrained\.act_postprocess(\d)\.3\.(weight|bias)$", key)
    if m:
        n, leaf = m.groups()
        path = (f"act_postprocess_{int(n) - 1}", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"pretrained\.act_postprocess([124])\.4\.(weight|bias)$", key)
    if m:
        n, leaf = m.groups()
        if n in ("1", "2"):  # ConvTranspose2d 4x4/s4 and 2x2/s2
            path = (f"resize_{int(n) - 1}", "kernel" if leaf == "weight" else "bias")
            return ("params", path, "conv_transpose" if leaf == "weight" else "none")
        path = ("resize_3", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")

    m = re.match(r"scratch\.layer(\d)_rn\.weight$", key)
    if m:
        return ("params", ("scratch", f"layer{m.group(1)}_rn", "Conv_0", "kernel"), "conv")
    m = re.match(r"scratch\.refinenet(\d)\.resConfUnit(\d)\.conv(\d)\.(weight|bias)$", key)
    if m:
        rn, rcu, conv, leaf = m.groups()
        if rn == "4" and rcu == "1":
            return None  # dead: refinenet4 runs with a single input
        path = (f"refinenet{rn}", f"resConfUnit{rcu}", f"conv{conv}", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.refinenet(\d)\.out_conv\.(weight|bias)$", key)
    if m:
        rn, leaf = m.groups()
        path = (f"refinenet{rn}", "out_conv", "Conv_0",
                "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    m = re.match(r"scratch\.output_conv\.([024])\.(weight|bias)$", key)
    if m:
        idx, leaf = m.groups()
        path = (f"head_conv{idx}", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    return None


def map_dpt_key(key: str, hybrid: bool = False):
    """MiDaS DPT checkpoints (dpt_large_384.pt / dpt_hybrid_384.pt) ->
    models/dpt.py::DPTDepthModel.

    The ViT trunk lives under ``pretrained.model`` (timm vit_large_patch16_384 /
    vit_base_r50_s16_384 naming). In our tree the plain-ViT trunk is the
    ``pretrained`` submodule, while the hybrid inlines its ViT blocks and hosts
    the ResNetV2 stem as ``pretrained_resnet`` (models/dpt.py::_hybrid_levels).
    The final trunk ``norm`` is unused by DPT's raw-activation taps -> dropped."""
    vit_prefix = () if hybrid else ("pretrained",)
    m = re.match(r"pretrained\.model\.(cls_token|pos_embed)$", key)
    if m:
        return ("params", vit_prefix + (m.group(1),), "none")
    m = re.match(r"pretrained\.model\.patch_embed\.proj\.(weight|bias)$", key)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("params", vit_prefix + ("patch_embed", leaf),
                "conv" if leaf == "kernel" else "none")
    m = re.match(r"pretrained\.model\.blocks\.(\d+)\.(.+)$", key)
    if m:
        i, rest = m.groups()
        return _map_timm_vit_block(rest, vit_prefix + (f"blocks_{i}",))
    if re.match(r"pretrained\.model\.norm\.(weight|bias)$", key):
        return None  # dead: DPT taps raw block outputs, never the final norm

    if hybrid:
        m = re.match(r"pretrained\.model\.patch_embed\.backbone\.(.+)$", key)
        if m:
            return _map_resnetv2_key(m.group(1), ("pretrained_resnet",))

    return _map_dpt_reassembly_and_scratch(key)


def _map_resnetv2_key(rest: str, prefix: tuple):
    """timm ResNetV2 (BiT) naming -> nn/resnetv2.py::ResNetV2Stem.
    GroupNormAct 'norm{n}' -> gn{n}; preact downsample carries only a conv."""
    m = re.match(r"stem\.conv\.weight$", rest)
    if m:
        return ("params", prefix + ("conv_stem", "kernel"), "conv")
    m = re.match(r"stem\.norm\.(weight|bias)$", rest)
    if m:
        return ("params", prefix + ("gn_stem", _LN_MAP[m.group(1)]), "none")
    m = re.match(r"stages\.(\d)\.blocks\.(\d+)\.(.+)$", rest)
    if m:
        si, bi, sub = m.groups()
        block = prefix + (f"stage{si}_block{bi}",)
        m2 = re.match(r"conv([123])\.weight$", sub)
        if m2:
            return ("params", block + (f"conv{m2.group(1)}", "kernel"), "conv")
        m2 = re.match(r"norm([123])\.(weight|bias)$", sub)
        if m2:
            return ("params", block + (f"gn{m2.group(1)}", _LN_MAP[m2.group(2)]), "none")
        m2 = re.match(r"downsample\.conv\.weight$", sub)
        if m2:
            return ("params", block + ("downsample", "kernel"), "conv")
        return None
    return None


def map_depth_anything_key(key: str):
    """Depth-Anything-V2 release checkpoints -> models/depth_anything.py.

    DA-V2 names its DINOv2 trunk ``pretrained`` and its DPTHead ``depth_head``
    with the same projects/resize_layers/scratch surface as the reference's
    Dinov2Head (src/network/dpt_depth.py:32-153, itself vendored from DA). The
    head's final 1x1 (output_conv2.2) is our top-level ``final`` conv."""
    if key.startswith("pretrained."):
        return map_dinov2_key(key[len("pretrained."):], prefix=("pretrained",))
    m = re.match(r"depth_head\.scratch\.output_conv2\.2\.(weight|bias)$", key)
    if m:
        leaf = m.group(1)
        path = ("final", "Conv_0", "kernel" if leaf == "weight" else "bias")
        return ("params", path, "conv" if leaf == "weight" else "none")
    if key.startswith("depth_head."):
        return map_dinov2_head_key(key[len("depth_head."):], prefix=("depth_head",))
    return None


def _beit_bias_table_conv(tbl):
    """Reorder a timm BEiT bias table's 3 trailing cls rows into our slot
    order (see map_dpt_beit_key)."""
    tbl = np.asarray(tbl)
    spatial, extra = tbl[:-3], tbl[-3:]
    return np.concatenate([spatial, extra[[2, 0, 1]]], axis=0)


def _split_qkv_weight(part: int):
    """Fused timm qkv weight (3C, C) -> transposed (C, C) slice for q/k/v."""
    def fn(w):
        c = w.shape[0] // 3
        return np.transpose(w[part * c:(part + 1) * c], (1, 0))
    return fn


def map_dpt_beit_key(key: str):
    """MiDaS dpt_beit_*.pt -> DPTDepthModel(backbone=beit*). timm BEiT trunk
    under ``pretrained.model``: fused qkv weight fans out to our separate
    q/k/v Denses (k bias-free — the BEiT quirk, nn/beit.py), gamma_1/gamma_2
    LayerScales, per-block relative_position_bias_table (index buffers are
    recomputed, not loaded)."""
    m = re.match(r"pretrained\.model\.(.+)$", key)
    if m:
        rest = m.group(1)
        if rest == "cls_token":
            return ("params", ("pretrained", "cls_token"), "none")
        m2 = re.match(r"patch_embed\.proj\.(weight|bias)$", rest)
        if m2:
            leaf = "kernel" if m2.group(1) == "weight" else "bias"
            return ("params", ("pretrained", "patch_embed", leaf),
                    "conv" if leaf == "kernel" else "none")
        m2 = re.match(r"blocks\.(\d+)\.(.+)$", rest)
        if m2:
            i, sub = m2.groups()
            block = ("pretrained", f"blocks_{i}")
            m3 = re.match(r"(norm1|norm2)\.(weight|bias)$", sub)
            if m3:
                return ("params", block + (m3.group(1), "LayerNorm_0",
                                           _LN_MAP[m3.group(2)]), "none")
            m3 = re.match(r"(gamma_1|gamma_2)$", sub)
            if m3:
                return ("params", block + (m3.group(1), "gamma"), "none")
            if sub == "attn.qkv.weight":
                return [
                    ("params", block + ("attn", "q", "kernel"), _split_qkv_weight(0)),
                    ("params", block + ("attn", "k", "kernel"), _split_qkv_weight(1)),
                    ("params", block + ("attn", "v", "kernel"), _split_qkv_weight(2)),
                ]
            if sub == "attn.q_bias":
                return ("params", block + ("attn", "q", "bias"), "none")
            if sub == "attn.v_bias":
                return ("params", block + ("attn", "v", "bias"), "none")
            if sub == "attn.k_bias":
                return None  # structurally zero in BEiT
            if sub == "attn.relative_position_bias_table":
                # The spatial rows index identically on both sides, but the 3
                # cls slots differ: timm appends [cls->tok, tok->cls, cls->cls]
                # while nn/beit.py::_relative_position_index expects
                # [cls->cls, cls->tok, tok->cls] — permute the tail.
                return ("params", block + ("attn", "relative_position_bias_table"),
                        _beit_bias_table_conv)
            if sub == "attn.relative_position_index":
                return None  # deterministic, recomputed (nn/beit.py)
            m3 = re.match(r"attn\.proj\.(weight|bias)$", sub)
            if m3:
                leaf = m3.group(1)
                if leaf == "weight":
                    return ("params", block + ("attn", "proj", "kernel"), "linear")
                return ("params", block + ("attn", "proj", "bias"), "none")
            m3 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", sub)
            if m3:
                fc, leaf = m3.groups()
                if leaf == "weight":
                    return ("params", block + ("mlp", fc, "kernel"), "linear")
                return ("params", block + ("mlp", fc, "bias"), "none")
            return None
        if re.match(r"(norm|fc_norm|head)\.", rest):
            return None  # classification leftovers, unused by DPT taps
        return None
    return _map_dpt_reassembly_and_scratch(key)


# timm PatchMerging concatenates (even,even),(odd,even),(even,odd),(odd,odd);
# our reshape yields (even,even),(even,odd),(odd,even),(odd,odd) — channel
# groups 1 and 2 swap.
_MERGE_PERM = (0, 2, 1, 3)


def _merge_reduction_weight(w):
    """timm reduction (2C, 4C) -> our kernel (4C, 2C) with group reorder."""
    wt = np.transpose(w, (1, 0))
    c = wt.shape[0] // 4
    return np.concatenate([wt[p * c:(p + 1) * c] for p in _MERGE_PERM], axis=0)


def _merge_norm_vec(v):
    """Reorder a 4C-length LayerNorm vector into our channel grouping."""
    c = v.shape[0] // 4
    return np.concatenate([v[p * c:(p + 1) * c] for p in _MERGE_PERM], axis=0)


def _preprocess_swin_v2(sd: dict) -> dict:
    """Fuse timm SwinV2's separate q_bias/v_bias into a (3C,) qkv bias (k third
    zero — exactly how timm composes it at forward time)."""
    out = dict(sd)
    for key in list(sd):
        m = re.match(r"(.*attn)\.q_bias$", key)
        if not m:
            continue
        base = m.group(1)
        q = np.asarray(sd[f"{base}.q_bias"])
        v = np.asarray(sd[f"{base}.v_bias"])
        out[f"{base}.qkv.bias"] = np.concatenate([q, np.zeros_like(q), v])
        out.pop(f"{base}.q_bias", None)
        out.pop(f"{base}.v_bias", None)
    return out


def map_dpt_swin_key(key: str, version: int = 1):
    """MiDaS dpt_swin*_*.pt -> DPTDepthModel(backbone=swin*). timm Swin trunk
    under ``pretrained.model``; hierarchical stages feed the scratch directly
    (no act_postprocess keys). Handles both V1 (relative_position_bias_table,
    fused qkv bias) and V2 (logit_scale + cpb_mlp; q/v biases pre-fused by
    _preprocess_swin_v2). timm's downsample follows stage i's blocks — ours is
    ``merge{i+1}`` before stage i+1's — and its 2x2 concat order differs, so
    the reduction weight's input groups are permuted, as is the V1 norm vector
    (V1 norms the 4C concat; V2 norms the 2C reduction output, where both
    sides already agree)."""
    m = re.match(r"pretrained\.model\.(.+)$", key)
    if not m:
        return _map_dpt_reassembly_and_scratch(key)
    rest = m.group(1)
    m2 = re.match(r"patch_embed\.proj\.(weight|bias)$", rest)
    if m2:
        leaf = "kernel" if m2.group(1) == "weight" else "bias"
        return ("params", ("pretrained", "patch_embed", leaf),
                "conv" if leaf == "kernel" else "none")
    m2 = re.match(r"patch_embed\.norm\.(weight|bias)$", rest)
    if m2:
        return ("params", ("pretrained", "patch_norm", "LayerNorm_0",
                           _LN_MAP[m2.group(1)]), "none")
    m2 = re.match(r"layers\.(\d)\.downsample\.reduction\.weight$", rest)
    if m2:
        return ("params", ("pretrained", f"merge{int(m2.group(1)) + 1}",
                           "reduction", "kernel"), _merge_reduction_weight)
    m2 = re.match(r"layers\.(\d)\.downsample\.norm\.(weight|bias)$", rest)
    if m2:
        si, leaf = m2.groups()
        path = ("pretrained", f"merge{int(si) + 1}", "norm", "LayerNorm_0", _LN_MAP[leaf])
        return ("params", path, _merge_norm_vec if version == 1 else "none")
    m2 = re.match(r"layers\.(\d)\.blocks\.(\d+)\.(.+)$", rest)
    if m2:
        si, bi, sub = m2.groups()
        block = ("pretrained", f"stage{si}_block{bi}")
        m3 = re.match(r"(norm1|norm2)\.(weight|bias)$", sub)
        if m3:
            return ("params", block + (m3.group(1), "LayerNorm_0",
                                       _LN_MAP[m3.group(2)]), "none")
        m3 = re.match(r"attn\.(qkv|proj)\.(weight|bias)$", sub)
        if m3:
            which, leaf = m3.groups()
            if leaf == "weight":
                return ("params", block + ("attn", which, "kernel"), "linear")
            return ("params", block + ("attn", which, "bias"), "none")
        if sub == "attn.relative_position_bias_table":
            return ("params", block + ("attn", "relative_position_bias_table"), "none")
        if sub == "attn.logit_scale":
            return ("params", block + ("attn", "logit_scale"), "none")
        m3 = re.match(r"attn\.cpb_mlp\.0\.(weight|bias)$", sub)
        if m3:
            leaf = m3.group(1)
            if leaf == "weight":
                return ("params", block + ("attn", "cpb_fc1", "kernel"), "linear")
            return ("params", block + ("attn", "cpb_fc1", "bias"), "none")
        if sub == "attn.cpb_mlp.2.weight":
            return ("params", block + ("attn", "cpb_fc2", "kernel"), "linear")
        m3 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", sub)
        if m3:
            fc, leaf = m3.groups()
            if leaf == "weight":
                return ("params", block + ("mlp", fc, "kernel"), "linear")
            return ("params", block + ("mlp", fc, "bias"), "none")
        if re.match(r"attn\.(relative_position_index|relative_coords_table)$", sub) or \
                sub == "attn_mask":
            return None  # deterministic buffers, recomputed (nn/swin.py)
        return None
    if re.match(r"(norm|head)\.", rest):
        return None  # final classification norm/head, unused by stage taps
    return None


# --------------------------------------------------------------------- LeViT

# levit_384 per-flat-block config for the fixed 224x224 checkpoint geometry
# (timm levit_384; the reference taps flat blocks [3, 11, 21] —
# dpt_depth.py:182). dims (384, 512, 768), key_dim 32, heads (6, 9, 12),
# attn_ratio 2 (subsamples: heads in_dim//32, ratio 4). Grids: stage0 14x14,
# stage1 7x7, stage2 4x4.
_LEVIT_KD = 32


def _levit_flat_config(flat: int):
    """flat block index -> (kind, our_name, attn_cfg) for levit_384.

    kind: 'attn' | 'mlp' | 'ds_attn' | 'ds_mlp' | None (dead tail 22..27).
    attn_cfg for attention kinds: (nh, kd, vd, grid_hw, stride).
    """
    stage_dims = (384, 512, 768)
    grids = ((14, 14), (7, 7), (4, 4))
    heads = (6, 9, 12)
    if 0 <= flat <= 7 or 10 <= flat <= 17 or 20 <= flat <= 21:
        si = 0 if flat <= 7 else (1 if flat <= 17 else 2)
        local = flat - (0, 10, 20)[si]
        bi, is_attn = local // 2, local % 2 == 0
        if is_attn:
            nh = heads[si]
            return ("attn", f"stage{si}_attn{bi}",
                    (nh, _LEVIT_KD, 2 * _LEVIT_KD, grids[si], 1))
        return ("mlp", f"stage{si}_mlp{bi}", None)
    if flat in (8, 18):
        ds = 1 if flat == 8 else 2
        in_dim = stage_dims[ds - 1]
        nh = in_dim // _LEVIT_KD
        return ("ds_attn", f"downsample{ds}_attn",
                (nh, _LEVIT_KD, 4 * _LEVIT_KD, grids[ds - 1], 2))
    if flat in (9, 19):
        ds = 1 if flat == 9 else 2
        return ("ds_mlp", f"downsample{ds}_mlp", None)
    return (None, None, None)  # 22..27: dead tail (nn/levit.py docstring)


def _levit_bias_perm(nh_unused, grid, stride):
    """Column permutation timm attention_biases -> our lexicographic table.

    timm orders offsets by first occurrence while iterating (q, k) point pairs;
    ours is np.unique's lexicographic sort over the same offset set
    (nn/levit.py::_bias_index). Both are deterministic in (grid, stride)."""
    h, w = grid
    pts = [(i, j) for i in range(h) for j in range(w)]
    qpts = pts if stride == 1 else [
        (i, j) for i in range(0, h, stride) for j in range(0, w, stride)
    ]
    order = {}
    for p1 in qpts:
        for p2 in pts:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in order:
                order[off] = len(order)
    ours = sorted(order)  # lexicographic == np.unique axis=0 ordering
    return [order[off] for off in ours]


def _levit_table_conv(grid, stride):
    perm = None

    def fn(tbl):
        nonlocal perm
        if perm is None:
            perm = _levit_bias_perm(None, grid, stride)
        return np.asarray(tbl)[:, perm]

    return fn


def _rows_T(rows):
    """Weight gather: timm (H_out, C_in) rows -> our kernel (C_in, len(rows))."""
    return lambda w: np.transpose(np.asarray(w)[rows], (1, 0))


def _rows_v(rows):
    """BN-vector gather."""
    return lambda v: np.asarray(v)[rows]


def _levit_qkv_rows(nh, kd, vd):
    """Row indices of q / k / v features in timm's fused per-head [q|k|v] qkv."""
    span = 2 * kd + vd
    q = [h * span + i for h in range(nh) for i in range(kd)]
    k = [h * span + kd + i for h in range(nh) for i in range(kd)]
    v = [h * span + 2 * kd + i for h in range(nh) for i in range(vd)]
    return q, k, v


def _levit_kv_rows(nh, kd, vd):
    """Row indices of k / v in timm's per-head [k|v] subsample kv."""
    span = kd + vd
    k = [h * span + i for h in range(nh) for i in range(kd)]
    v = [h * span + kd + i for h in range(nh) for i in range(vd)]
    return k, v


def _linearbn_entries(prefix: tuple, leaf: str, conv):
    """One timm LinearNorm ('c'/'bn') leaf -> our LinearBN module, with
    ``conv`` applied (callable or 'linear'/'none')."""
    if leaf == "c.weight":
        return [("params", prefix + ("linear", "kernel"), conv)]
    m = re.match(r"bn\.(\w+)$", leaf)
    if m:
        coll, name, _ = _BN_MAP.get(m.group(1), (None, None, None))
        if coll:
            return [(coll, prefix + ("bn", "BatchNorm_0", name), conv)]
    return None


def map_dpt_levit_key(key: str):
    """MiDaS dpt_levit_224.pt -> DPTDepthModel(backbone=levit_384,
    head_features_1=64, head_features_2=8).

    timm levit_384 under ``pretrained.model``: BN-everywhere LinearNorm
    ('c'+'bn') modules; regular attention packs per-head [q|k|v] into one fused
    LinearNorm which fans out to our kv-fused + separate-q layout
    (nn/levit.py::LevitAttention) with row gathers on both the weight and the
    BN vectors; attention_biases columns are permuted from timm's
    first-occurrence offset order to our lexicographic one. Flat blocks 22..27
    are the post-hook dead tail (never influence the [3,11,21] taps) and flag
    as dead, as do the attention_bias_idxs buffers and classification heads.
    Valid for the fixed 224x224 checkpoint geometry only."""
    m = re.match(r"pretrained\.model\.(.+)$", key)
    if m:
        rest = m.group(1)
        m2 = re.match(r"patch_embed\.([0246])\.(c\.weight|bn\.\w+)$", rest)
        if m2:
            idx, leaf = m2.groups()
            i = int(idx) // 2
            if leaf == "c.weight":
                return ("params", ("pretrained", f"stem_conv{i}", "Conv_0", "kernel"),
                        "conv")
            coll, name, kind = _BN_MAP.get(leaf[3:], (None, None, None))
            if coll:
                return (coll, ("pretrained", f"stem_bn{i}", "BatchNorm_0", name), kind)
            return None
        m2 = re.match(r"blocks\.(\d+)\.(.+)$", rest)
        if m2:
            flat, sub = int(m2.group(1)), m2.group(2)
            kind, our, cfg = _levit_flat_config(flat)
            if kind is None:
                return None  # dead tail
            base = ("pretrained", our)
            if kind in ("mlp", "ds_mlp"):
                m3 = re.match(r"m\.([02])\.(c\.weight|bn\.\w+)$", sub)
                if m3:
                    fc = "fc1" if m3.group(1) == "0" else "fc2"
                    conv = "linear" if m3.group(2) == "c.weight" else None
                    ent = _linearbn_entries(base + (fc,), m3.group(2),
                                            conv or "none")
                    return ent[0] if ent else None
                return None
            nh, kd, vd, grid, stride = cfg
            inner = sub[2:] if kind == "attn" else sub  # strip Residual 'm.'
            if kind == "attn" and not sub.startswith("m."):
                return None
            if inner == "attention_biases":
                return ("params", base + ("attention_biases",),
                        _levit_table_conv(grid, stride))
            if inner == "attention_bias_idxs":
                return None  # deterministic buffer, rebuilt per grid
            m3 = re.match(r"proj\.1\.(c\.weight|bn\.\w+)$", inner)
            if m3:
                conv = "linear" if m3.group(1) == "c.weight" else "none"
                ent = _linearbn_entries(base + ("proj",), m3.group(1), conv)
                return ent[0] if ent else None
            if kind == "attn":
                m3 = re.match(r"qkv\.(c\.weight|bn\.\w+)$", inner)
                if m3:
                    leaf = m3.group(1)
                    qr, kr, vr = _levit_qkv_rows(nh, kd, vd)
                    if leaf == "c.weight":
                        return [
                            ("params", base + ("q", "linear", "kernel"), _rows_T(qr)),
                            ("params", base + ("kv", "linear", "kernel"),
                             _rows_T(kr + vr)),
                        ]
                    coll, name, _ = _BN_MAP.get(leaf[3:], (None, None, None))
                    if not coll:
                        return None
                    return [
                        (coll, base + ("q", "bn", "BatchNorm_0", name), _rows_v(qr)),
                        (coll, base + ("kv", "bn", "BatchNorm_0", name),
                         _rows_v(kr + vr)),
                    ]
                return None
            # ds_attn: separate q (Sequential(Subsample, LinearNorm) -> q.1),
            # fused kv with per-head [k|v] needing the block-layout reorder.
            m3 = re.match(r"q\.1\.(c\.weight|bn\.\w+)$", inner)
            if m3:
                conv = "linear" if m3.group(1) == "c.weight" else "none"
                ent = _linearbn_entries(base + ("q",), m3.group(1), conv)
                return ent[0] if ent else None
            m3 = re.match(r"kv\.(c\.weight|bn\.\w+)$", inner)
            if m3:
                leaf = m3.group(1)
                kr, vr = _levit_kv_rows(nh, kd, vd)
                if leaf == "c.weight":
                    return ("params", base + ("kv", "linear", "kernel"),
                            _rows_T(kr + vr))
                coll, name, _ = _BN_MAP.get(leaf[3:], (None, None, None))
                if not coll:
                    return None
                return (coll, base + ("kv", "bn", "BatchNorm_0", name),
                        _rows_v(kr + vr))
            return None
        if re.match(r"(head|head_dist)\.", rest):
            return None  # classification heads, unused by DPT
        return None

    # scratch: 3-level cascade (refinenet1..3; refinenet3 runs single-input so
    # its resConfUnit1 is dead) + the stem_transpose ConvTransposeNorm pair.
    m = re.match(r"scratch\.stem_transpose\.([02])\.(c\.weight|bn\.\w+)$", key)
    if m:
        idx, leaf = m.groups()
        up = "up1" if idx == "0" else "up2"
        if leaf == "c.weight":
            return ("params", ("stem_transpose", up, "kernel"), "conv_transpose")
        coll, name, kind = _BN_MAP.get(leaf[3:], (None, None, None))
        if coll:
            return (coll, ("stem_transpose", f"{up}_bn", "BatchNorm_0", name), kind)
        return None
    m = re.match(r"scratch\.refinenet3\.resConfUnit1\.", key)
    if m:
        return None  # dead: 3-level cascade calls refinenet3 with one input
    return _map_dpt_reassembly_and_scratch(key)



def import_state_dict(
    torch_sd: dict,
    params,
    batch_stats,
    key_map: Callable[[str], Optional[tuple]],
):
    """Shape-filtered strict=False merge (src/main.py:451-462 semantics).

    Returns (params, batch_stats, report) where report counts
    loaded / shape_mismatch / unmapped.
    """
    from flax import traverse_util

    flat_params = traverse_util.flatten_dict(dict(params))
    flat_stats = traverse_util.flatten_dict(dict(batch_stats)) if batch_stats else {}
    report = {"loaded": 0, "shape_mismatch": [], "unmapped": []}

    for tkey, tval in torch_sd.items():
        mapped = key_map(tkey)
        if mapped is None:
            report["unmapped"].append(tkey)
            continue
        # A map may fan one torch tensor out to several leaves (fused qkv ->
        # separate q/k/v Denses); a single entry counts as one loaded key.
        # Validate EVERY entry before writing any, so a mid-fan-out shape
        # mismatch leaves the params untouched (all-or-nothing per key).
        entries = mapped if isinstance(mapped, list) else [mapped]
        staged = []
        ok = True
        for collection, path, kind in entries:
            target = flat_params if collection == "params" else flat_stats
            if path not in target:
                report["unmapped"].append(tkey)
                ok = False
                break
            converted = convert_tensor(kind, tval)
            if tuple(converted.shape) != tuple(np.shape(target[path])):
                report["shape_mismatch"].append(tkey)
                ok = False
                break
            staged.append((target, path, converted))
        if ok:
            for target, path, converted in staged:
                target[path] = converted.astype(np.asarray(target[path]).dtype)
            report["loaded"] += 1

    new_params = traverse_util.unflatten_dict(flat_params)
    new_stats = traverse_util.unflatten_dict(flat_stats) if flat_stats else batch_stats
    return new_params, new_stats, report


def _key_map_registry():
    import functools

    swin_v1 = functools.partial(map_dpt_swin_key, version=1)
    swin_v2 = functools.partial(map_dpt_swin_key, version=2)
    dpt_vit = map_dpt_key
    dpt_hybrid = functools.partial(map_dpt_key, hybrid=True)
    # model_type -> (key_map, state-dict preprocessor or None). Factory names
    # (src/main.py:395-465) and model_loader checkpoint names both resolve.
    return {
        "U_Net": (map_simple_unet_key, None),
        "MiDaS_small": (map_midas_small_key, None),
        "midas_v21_small_256": (map_midas_small_key, None),
        "MiDaS_semantics": (map_midas_semantics_key, None),
        "dinov2": (map_dinov2_key, None),
        "MiDaS": (map_midas_net_key, None),
        "midas_v21_384": (map_midas_net_key, None),
        "DPT_Large": (dpt_vit, None),
        "dpt_large_384": (dpt_vit, None),
        "DPT_Hybrid": (dpt_hybrid, None),
        "dpt_hybrid_384": (dpt_hybrid, None),
        "dpt_beit_large_512": (map_dpt_beit_key, None),
        "dpt_beit_large_384": (map_dpt_beit_key, None),
        "dpt_beit_base_384": (map_dpt_beit_key, None),
        "dpt_swin_large_384": (swin_v1, None),
        "dpt_swin2_large_384": (swin_v2, _preprocess_swin_v2),
        "dpt_swin2_base_384": (swin_v2, _preprocess_swin_v2),
        "dpt_swin2_tiny_256": (swin_v2, _preprocess_swin_v2),
        "dpt_levit_224": (map_dpt_levit_key, None),
        "DepthAnythingV2_vits": (map_depth_anything_key, None),
        "DepthAnythingV2_vitb": (map_depth_anything_key, None),
        "DepthAnythingV2_vitl": (map_depth_anything_key, None),
    }


def import_torch_checkpoint(path: str, params, batch_stats, model_type: str = "U_Net"):
    registry = _key_map_registry()
    if model_type not in registry:
        raise NotImplementedError(
            f"torch import map for {model_type!r} not implemented yet "
            f"(have: {sorted(registry)})"
        )
    key_map, preprocess = registry[model_type]
    sd = load_torch_state_dict(path)
    if preprocess is not None:
        sd = preprocess(sd)
    return import_state_dict(sd, params, batch_stats, key_map)
