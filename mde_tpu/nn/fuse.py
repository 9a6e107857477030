"""Inference-time conv+BN folding — the reference's ``fuse_model``.

The reference's fuse_model (src/network/midas_net_custom.py:188-207) walks the
module tree and calls torch.quantization.fuse_modules on every conv-bn(-relu)
triple. The functional JAX equivalent is a *params transformation*: fold each
BatchNorm's affine + running stats into the preceding conv's kernel/bias and
replace the BN with an exact identity, so the unchanged model definition
(applied with ``train=False``) computes conv->relu only. (XLA already fuses an
eval-mode BN affine into the conv epilogue, so on TPU this is a parity utility
more than a speedup; it matters for export paths and for matching the
reference's quantization-fusion surface.)

Math (per output channel o):
  y = (conv(x, K) + b - mean) * scale / sqrt(var + eps) + bias_bn
    = conv(x, K * s_o) + (b - mean) * s_o + bias_bn,   s_o = scale_o / sqrt(var_o + eps)

Pairs are discovered by this repo's naming conventions (convN/bnN,
shortcut_conv/shortcut_bn, spatial_upsample_convN/_bnN, and the efficientnet
conv_stem/bn1, conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3 within a block).
"""

from __future__ import annotations

import re
from typing import Iterable

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# sibling-name rules: conv module name -> BN module name
_PAIR_RULES = (
    (re.compile(r"^conv(\d+)$"), lambda m: f"bn{m.group(1)}"),
    (re.compile(r"^shortcut_conv$"), lambda m: "shortcut_bn"),
    (re.compile(r"^spatial_upsample_conv(\d)$"), lambda m: f"spatial_upsample_bn{m.group(1)}"),
    (re.compile(r"^downsample_conv$"), lambda m: "downsample_bn"),  # ResNeXt shortcut
    (re.compile(r"^stem_conv(\d)$"), lambda m: f"stem_bn{m.group(1)}"),  # LeViT stem
    (re.compile(r"^up(\d)$"), lambda m: f"up{m.group(1)}_bn"),  # StemB4Transpose
    (re.compile(r"^conv_stem$"), lambda m: "bn1"),
    (re.compile(r"^conv_pw$"), lambda m: "bn1"),
    (re.compile(r"^conv_dw$"), lambda m: "bn2"),
    (re.compile(r"^conv_pwl$"), lambda m: "bn3"),
)


def discover_conv_bn_pairs(params, batch_stats) -> list[tuple[tuple, tuple]]:
    """Find (conv_module_path, bn_module_path) sibling pairs by naming rules.

    Paths are module-level (not leaf-level): the conv path owns either
    ``Conv_0/kernel`` (our Conv/TFConv wrappers) or a direct ``kernel``
    (ConvTranspose); the bn path owns ``BatchNorm_0/{scale,bias}`` in params
    and ``BatchNorm_0/{mean,var}`` in batch_stats.
    """
    flat_p = traverse_util.flatten_dict(dict(params))
    flat_s = traverse_util.flatten_dict(dict(batch_stats)) if batch_stats else {}
    conv_modules = set()
    for path in flat_p:
        if path[-1] == "kernel":
            mod = path[:-2] if path[-2] == "Conv_0" else path[:-1]
            conv_modules.add(mod)
    bn_modules = {path[:-2] for path in flat_s if path[-1] in ("mean", "var")}

    pairs = []
    for conv in sorted(conv_modules):
        name = conv[-1]
        for rule, bn_name in _PAIR_RULES:
            m = rule.match(name)
            if not m:
                continue
            bn = conv[:-1] + (bn_name(m),)
            if bn in bn_modules:
                pairs.append((conv, bn))
            break
    return pairs


def fold_conv_bn(
    params,
    batch_stats,
    pairs: Iterable[tuple[tuple, tuple]] | None = None,
    eps_by_bn=None,
):
    """Return (params, batch_stats) with each BN folded into its conv.

    ``pairs`` defaults to ``discover_conv_bn_pairs``. ``eps_by_bn`` maps a BN
    module path to its epsilon (default 1e-5; the efficientnet TFBatchNorm uses
    1e-3 — pass overrides for those, or use ``fuse_model_params`` which knows).
    After folding, the BN params/stats are set to the exact identity
    (scale=1, bias=0, mean=0, var=1-eps), so applying the SAME model in eval
    mode is numerically unchanged except the BN is a no-op.
    """
    pairs = list(pairs) if pairs is not None else discover_conv_bn_pairs(params, batch_stats)
    flat_p = traverse_util.flatten_dict(dict(params))
    flat_s = traverse_util.flatten_dict(dict(batch_stats))
    eps_by_bn = dict(eps_by_bn or {})

    for conv, bn in pairs:
        kernel_path = conv + ("Conv_0", "kernel")
        direct = kernel_path not in flat_p
        if direct:
            kernel_path = conv + ("kernel",)
        bias_path = kernel_path[:-1] + ("bias",)
        eps = float(eps_by_bn.get(bn, 1e-5))

        kernel = np.asarray(flat_p[kernel_path], np.float64)
        scale = np.asarray(flat_p[bn + ("BatchNorm_0", "scale")], np.float64)
        bn_bias = np.asarray(flat_p[bn + ("BatchNorm_0", "bias")], np.float64)
        mean = np.asarray(flat_s[bn + ("BatchNorm_0", "mean")], np.float64)
        var = np.asarray(flat_s[bn + ("BatchNorm_0", "var")], np.float64)
        s = scale / np.sqrt(var + eps)

        # Output channels are the LAST kernel dim in both HWIO (Conv) and
        # HWIO-transposed (our ConvTranspose stores (k, k, in, out)).
        flat_p[kernel_path] = jnp.asarray(kernel * s, jnp.float32)
        if bias_path in flat_p:
            # fold everything into the conv bias; BN becomes the exact identity
            bias = np.asarray(flat_p[bias_path], np.float64)
            flat_p[bias_path] = jnp.asarray((bias - mean) * s + bn_bias, jnp.float32)
            new_bn_bias = np.zeros_like(bn_bias)
        else:
            # bias-free conv (a new param leaf would change the module tree):
            # keep the residual shift in the BN, which degenerates to a pure
            # bias add (scale=1, mean=0, var=1-eps).
            new_bn_bias = bn_bias - mean * s

        flat_p[bn + ("BatchNorm_0", "scale")] = jnp.ones_like(flat_p[bn + ("BatchNorm_0", "scale")])
        flat_p[bn + ("BatchNorm_0", "bias")] = jnp.asarray(new_bn_bias, jnp.float32)
        flat_s[bn + ("BatchNorm_0", "mean")] = jnp.zeros_like(flat_s[bn + ("BatchNorm_0", "mean")])
        flat_s[bn + ("BatchNorm_0", "var")] = jnp.full_like(
            flat_s[bn + ("BatchNorm_0", "var")], 1.0 - eps
        )

    return (
        traverse_util.unflatten_dict(flat_p),
        traverse_util.unflatten_dict(flat_s),
    )


def _tf_effnet_roots(params) -> set:
    """Module prefixes hosting a TF-style EfficientNet (TFBatchNorm, eps 1e-3).

    Detected by the gen-efficientnet block naming (``blocks_{stage}_{rep}``),
    NOT by the submodule being called 'pretrained' — MidasNet's ResNeXt encoder
    is also named 'pretrained' but uses plain eps-1e-5 BatchNorm."""
    flat = traverse_util.flatten_dict(dict(params))
    roots = set()
    block_re = re.compile(r"^blocks_\d+_\d+$")
    for path in flat:
        for i, seg in enumerate(path):
            if block_re.match(str(seg)):
                roots.add(path[:i])
                break
    return roots


def fuse_model_params(params, batch_stats):
    """fuse_model for a whole model tree: discovers pairs and applies the
    right epsilon per family (TFBatchNorm inside effnet subtrees uses 1e-3,
    everything else 1e-5)."""
    pairs = discover_conv_bn_pairs(params, batch_stats)
    tf_roots = _tf_effnet_roots(params)

    def eps_for(bn: tuple) -> float:
        return 1e-3 if any(bn[: len(r)] == r for r in tf_roots) else 1e-5

    eps_by_bn = {bn: eps_for(bn) for _, bn in pairs}
    return fold_conv_bn(params, batch_stats, pairs, eps_by_bn)
