"""Numerical verification of the riskiest torch-import converters: BEiT and
Swin-V1 window attention. Each test reimplements the timm forward semantics in
plain numpy (fused qkv packing, relative-position-bias table indexing with
timm's own index construction), pushes a random checkpoint tensor set through
the production converters, and requires the flax forward to match.

This is what caught the BEiT cls-slot ordering difference (timm appends
[cls->tok, tok->cls, cls->cls]; nn/beit.py indexes [cls->cls, cls->tok,
tok->cls]) — structural shape tests alone cannot see a row permutation.
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.nn.beit import BeitAttention
from mde_tpu.nn.swin import WindowAttention
from mde_tpu.train.torch_import import _beit_bias_table_conv, _split_qkv_weight


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _timm_beit_rel_index(h, w):
    """timm BEiT relative_position_index (beit.py: gen_relative_position_index)."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    num_rel = (2 * h - 1) * (2 * w - 1)
    idx = np.zeros((h * w + 1, h * w + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel      # cls -> token
    idx[0:, 0] = num_rel + 1  # token -> cls
    idx[0, 0] = num_rel + 2   # cls -> cls
    return idx


def test_beit_attention_import_matches_timm_semantics():
    nh, hd, res = 2, 16, 4
    c = nh * hd
    n = res * res + 1
    rng = np.random.default_rng(3)

    sd = {
        "qkv.weight": rng.standard_normal((3 * c, c)).astype(np.float32),
        "q_bias": rng.standard_normal(c).astype(np.float32),
        "v_bias": rng.standard_normal(c).astype(np.float32),
        "relative_position_bias_table": rng.standard_normal(
            ((2 * res - 1) ** 2 + 3, nh)
        ).astype(np.float32),
        "proj.weight": rng.standard_normal((c, c)).astype(np.float32),
        "proj.bias": rng.standard_normal(c).astype(np.float32),
    }
    x = rng.standard_normal((1, n, c)).astype(np.float32)

    # ---- timm-semantics numpy forward
    qkv_b = np.concatenate([sd["q_bias"], np.zeros(c, np.float32), sd["v_bias"]])
    h = x @ sd["qkv.weight"].T + qkv_b
    h = h.reshape(1, n, 3, nh, hd)
    q, k, v = h[:, :, 0], h[:, :, 1], h[:, :, 2]
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    idx = _timm_beit_rel_index(res, res)
    bias = sd["relative_position_bias_table"][idx]  # (n, n, nh)
    logits = logits + bias.transpose(2, 0, 1)[None]
    attn = _softmax(logits)
    out = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(1, n, c)
    want = out @ sd["proj.weight"].T + sd["proj.bias"]

    # ---- our module with map-converted weights
    ba = BeitAttention(c, nh, (res, res))
    variables = ba.init(jax.random.key(0), jnp.asarray(x), (res, res))
    flat = traverse_util.flatten_dict(dict(variables["params"]))
    flat[("q", "kernel")] = _split_qkv_weight(0)(sd["qkv.weight"])
    flat[("k", "kernel")] = _split_qkv_weight(1)(sd["qkv.weight"])
    flat[("v", "kernel")] = _split_qkv_weight(2)(sd["qkv.weight"])
    flat[("q", "bias")] = sd["q_bias"]
    flat[("v", "bias")] = sd["v_bias"]
    flat[("relative_position_bias_table",)] = _beit_bias_table_conv(
        sd["relative_position_bias_table"]
    )
    flat[("proj", "kernel")] = sd["proj.weight"].T
    flat[("proj", "bias")] = sd["proj.bias"]

    got = np.asarray(
        ba.apply({"params": traverse_util.unflatten_dict(flat)}, jnp.asarray(x), (res, res))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _timm_swin_rel_index(w):
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def test_swin_v1_attention_import_matches_timm_semantics():
    nh, hd, win = 2, 16, 4
    c = nh * hd
    t = win * win
    rng = np.random.default_rng(5)

    sd = {
        "qkv.weight": rng.standard_normal((3 * c, c)).astype(np.float32),
        "qkv.bias": rng.standard_normal(3 * c).astype(np.float32),
        "relative_position_bias_table": rng.standard_normal(
            ((2 * win - 1) ** 2, nh)
        ).astype(np.float32),
        "proj.weight": rng.standard_normal((c, c)).astype(np.float32),
        "proj.bias": rng.standard_normal(c).astype(np.float32),
    }
    x = rng.standard_normal((3, t, c)).astype(np.float32)  # 3 windows

    h = x @ sd["qkv.weight"].T + sd["qkv.bias"]
    h = h.reshape(3, t, 3, nh, hd)
    q, k, v = h[:, :, 0], h[:, :, 1], h[:, :, 2]
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    bias = sd["relative_position_bias_table"][_timm_swin_rel_index(win)]
    logits = logits + bias.transpose(2, 0, 1)[None]
    attn = _softmax(logits)
    out = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(3, t, c)
    want = out @ sd["proj.weight"].T + sd["proj.bias"]

    wa = WindowAttention(c, nh, win, version=1)
    variables = wa.init(jax.random.key(0), jnp.asarray(x))
    flat = traverse_util.flatten_dict(dict(variables["params"]))
    flat[("qkv", "kernel")] = sd["qkv.weight"].T
    flat[("qkv", "bias")] = sd["qkv.bias"]
    flat[("relative_position_bias_table",)] = sd["relative_position_bias_table"]
    flat[("proj", "kernel")] = sd["proj.weight"].T
    flat[("proj", "bias")] = sd["proj.bias"]

    got = np.asarray(
        wa.apply({"params": traverse_util.unflatten_dict(flat)}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
