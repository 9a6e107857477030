"""LeViT torch-import: structural coverage of the full timm levit_384
checkpoint surface (explicit torch shapes — independent of our own tree) and a
numerical check that the fused-qkv row gathers + attention-bias column
permutation reproduce timm's attention semantics exactly.

Reference: src/network/backbones/levit.py (hooks [3,11,21], stem_b4_transpose)
+ timm levit_384 naming the reference's timm.create_model depends on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.models.dpt import DPTDepthModel
from mde_tpu.nn.levit import LevitAttention
from mde_tpu.train.torch_import import (
    _levit_bias_perm,
    _levit_qkv_rows,
    import_state_dict,
    map_dpt_levit_key,
)

BN = ("weight", "bias", "running_mean", "running_var")


def _bn_shapes(base, n, ks):
    for leaf in BN:
        ks[f"{base}.{leaf}"] = (n,)


def levit_sd_shapes():
    """Every key of a timm levit_384 classifier checkpoint re-rooted under
    ``pretrained.model``, plus the MiDaS DPT scratch/head, with its true torch
    shape (so the test also validates our leaf shapes against the real
    checkpoint geometry rather than deriving them from our own tree)."""
    ks = {}
    widths = (48, 96, 192, 384)
    in_ch = 3
    for i, wch in enumerate(widths):
        ks[f"pretrained.model.patch_embed.{2 * i}.c.weight"] = (wch, in_ch, 3, 3)
        _bn_shapes(f"pretrained.model.patch_embed.{2 * i}.bn", wch, ks)
        in_ch = wch

    dims, heads = (384, 512, 768), (6, 9, 12)
    K = {(14, 1): 196, (14, 2): 196, (7, 1): 49, (7, 2): 49, (4, 1): 16, (4, 2): 16}
    NQ = {14: 196, 7: 49, 4: 16}

    def attn(flat, D, nh, g, kd=32, vd=64):
        base = f"pretrained.model.blocks.{flat}.m"
        ks[f"{base}.qkv.c.weight"] = (nh * (2 * kd + vd), D)
        _bn_shapes(f"{base}.qkv.bn", nh * (2 * kd + vd), ks)
        ks[f"{base}.proj.1.c.weight"] = (D, nh * vd)
        _bn_shapes(f"{base}.proj.1.bn", D, ks)
        ks[f"{base}.attention_biases"] = (nh, K[(g, 1)])
        ks[f"{base}.attention_bias_idxs"] = (NQ[g], NQ[g])

    def mlp(flat, D):
        base = f"pretrained.model.blocks.{flat}.m"
        ks[f"{base}.0.c.weight"] = (2 * D, D)
        _bn_shapes(f"{base}.0.bn", 2 * D, ks)
        ks[f"{base}.2.c.weight"] = (D, 2 * D)
        _bn_shapes(f"{base}.2.bn", D, ks)

    def ds_attn(flat, Din, Dout, g, kd=32, vd=128):
        nh = Din // kd
        base = f"pretrained.model.blocks.{flat}"
        ks[f"{base}.kv.c.weight"] = (nh * (kd + vd), Din)
        _bn_shapes(f"{base}.kv.bn", nh * (kd + vd), ks)
        ks[f"{base}.q.1.c.weight"] = (nh * kd, Din)
        _bn_shapes(f"{base}.q.1.bn", nh * kd, ks)
        ks[f"{base}.proj.1.c.weight"] = (Dout, nh * vd)
        _bn_shapes(f"{base}.proj.1.bn", Dout, ks)
        ks[f"{base}.attention_biases"] = (nh, K[(g, 2)])
        ks[f"{base}.attention_bias_idxs"] = (NQ[g // 2 + (g % 2)], NQ[g])

    grids = (14, 7, 4)
    starts = (0, 10, 20)
    for si in range(3):
        for bi in range(4):
            attn(starts[si] + 2 * bi, dims[si], heads[si], grids[si])
            mlp(starts[si] + 2 * bi + 1, dims[si])
    ds_attn(8, dims[0], dims[1], grids[0])
    mlp(9, dims[1])
    ds_attn(18, dims[1], dims[2], grids[1])
    mlp(19, dims[2])

    for head in ("head", "head_dist"):
        _bn_shapes(f"pretrained.model.{head}.bn", 768, ks)
        ks[f"pretrained.model.{head}.l.weight"] = (1000, 768)
        ks[f"pretrained.model.{head}.l.bias"] = (1000,)

    # DPT side: scratch over (384, 512, 768) -> 256, 3-level cascade,
    # stem_transpose 256->128->64, head 64->32->8->1.
    for i, c in enumerate((384, 512, 768)):
        ks[f"scratch.layer{i + 1}_rn.weight"] = (256, c, 3, 3)
    for rn in (1, 2, 3):
        for rcu in (1, 2):
            for conv in (1, 2):
                ks[f"scratch.refinenet{rn}.resConfUnit{rcu}.conv{conv}.weight"] = (256, 256, 3, 3)
                ks[f"scratch.refinenet{rn}.resConfUnit{rcu}.conv{conv}.bias"] = (256,)
        ks[f"scratch.refinenet{rn}.out_conv.weight"] = (256, 256, 1, 1)
        ks[f"scratch.refinenet{rn}.out_conv.bias"] = (256,)
    ks["scratch.stem_transpose.0.c.weight"] = (256, 128, 3, 3)  # ConvTranspose IOHW
    _bn_shapes("scratch.stem_transpose.0.bn", 128, ks)
    ks["scratch.stem_transpose.2.c.weight"] = (128, 64, 3, 3)
    _bn_shapes("scratch.stem_transpose.2.bn", 64, ks)
    ks["scratch.output_conv.0.weight"] = (32, 64, 3, 3)
    ks["scratch.output_conv.0.bias"] = (32,)
    ks["scratch.output_conv.2.weight"] = (8, 32, 3, 3)
    ks["scratch.output_conv.2.bias"] = (8,)
    ks["scratch.output_conv.4.weight"] = (1, 8, 1, 1)
    ks["scratch.output_conv.4.bias"] = (1,)
    return ks


EXPECTED_DEAD_PATTERNS = (
    "attention_bias_idxs",
    ".head.", ".head_dist.",
    "refinenet3.resConfUnit1",
)


def _is_expected_dead(key):
    if any(p in key for p in EXPECTED_DEAD_PATTERNS):
        return True
    # flat blocks 22..27: post-hook dead tail
    import re

    m = re.match(r"pretrained\.model\.blocks\.(\d+)\.", key)
    return bool(m) and int(m.group(1)) >= 22


def test_levit_map_covers_full_checkpoint_surface():
    model = DPTDepthModel(backbone="levit_384", head_features_1=64, head_features_2=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables["batch_stats"]))

    rng = np.random.default_rng(0)
    sd, dead = {}, []
    for tkey, shape in levit_sd_shapes().items():
        mapped = map_dpt_levit_key(tkey)
        if mapped is None:
            dead.append(tkey)
            assert _is_expected_dead(tkey), f"unexpectedly dead: {tkey}"
            continue
        assert not _is_expected_dead(tkey), f"expected dead but mapped: {tkey}"
        sd[tkey] = rng.standard_normal(shape).astype(np.float32)
        for coll, path, _ in (mapped if isinstance(mapped, list) else [mapped]):
            target = flat_p if coll == "params" else flat_s
            assert path in target, f"{tkey} -> {path} missing in our tree"

    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_dpt_levit_key
    )
    assert report["loaded"] == len(sd)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unmapped"], report["unmapped"][:5]

    covered_p, covered_s = set(), set()
    for tkey in sd:
        mapped = map_dpt_levit_key(tkey)
        for coll, path, _ in (mapped if isinstance(mapped, list) else [mapped]):
            (covered_p if coll == "params" else covered_s).add(path)
    missing_p = set(flat_p) - covered_p
    missing_s = set(flat_s) - covered_s
    assert not missing_p, f"unreachable param leaves: {sorted(missing_p)[:10]}"
    assert not missing_s, f"unreachable batch_stats leaves: {sorted(missing_s)[:10]}"


# ------------------------------------------------------- numerical converter

def _hswish(x):
    return x * np.clip(x + 3.0, 0.0, 6.0) / 6.0


def _bn_eval(x, g, b, mean, var, eps=1e-5):
    return (x - mean) / np.sqrt(var + eps) * g + b


def _timm_attention_forward(x, sd, nh, kd, vd, res):
    """numpy reimplementation of timm levit Attention.forward (eval mode):
    fused per-head [q|k|v] qkv LinearNorm, insertion-order bias table,
    hardswish before the proj LinearNorm."""
    b, n, c = x.shape
    h = x @ sd["qkv.c.weight"].T
    h = _bn_eval(h, sd["qkv.bn.weight"], sd["qkv.bn.bias"],
                 sd["qkv.bn.running_mean"], sd["qkv.bn.running_var"])
    h = h.reshape(b, n, nh, 2 * kd + vd)
    q, k, v = h[..., :kd], h[..., kd:2 * kd], h[..., 2 * kd:]

    pts = [(i, j) for i in range(res) for j in range(res)]
    order, idxs = {}, np.zeros((n, n), np.int64)
    for a, p1 in enumerate(pts):
        for bb, p2 in enumerate(pts):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in order:
                order[off] = len(order)
            idxs[a, bb] = order[off]

    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
    logits = logits + sd["attention_biases"][:, idxs][None]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, nh * vd)
    out = _hswish(out)
    out = out @ sd["proj.1.c.weight"].T
    return _bn_eval(out, sd["proj.1.bn.weight"], sd["proj.1.bn.bias"],
                    sd["proj.1.bn.running_mean"], sd["proj.1.bn.running_var"])


def test_levit_attention_import_matches_timm_semantics():
    """Import one fused-qkv attention block through the map's row gathers and
    bias permutation; flax forward must equal the timm-semantics numpy forward."""
    nh, kd, vd, res, dim = 2, 32, 64, 4, 64
    n = res * res
    rng = np.random.default_rng(7)
    H = nh * (2 * kd + vd)

    sd = {
        "qkv.c.weight": rng.standard_normal((H, dim)).astype(np.float32),
        "qkv.bn.weight": rng.standard_normal(H).astype(np.float32),
        "qkv.bn.bias": rng.standard_normal(H).astype(np.float32),
        "qkv.bn.running_mean": rng.standard_normal(H).astype(np.float32),
        "qkv.bn.running_var": rng.random(H).astype(np.float32) + 0.5,
        "proj.1.c.weight": rng.standard_normal((dim, nh * vd)).astype(np.float32),
        "proj.1.bn.weight": rng.standard_normal(dim).astype(np.float32),
        "proj.1.bn.bias": rng.standard_normal(dim).astype(np.float32),
        "proj.1.bn.running_mean": rng.standard_normal(dim).astype(np.float32),
        "proj.1.bn.running_var": rng.random(dim).astype(np.float32) + 0.5,
        "attention_biases": rng.standard_normal((nh, n)).astype(np.float32),
    }
    x = rng.standard_normal((1, n, dim)).astype(np.float32)
    want = _timm_attention_forward(x, sd, nh, kd, vd, res)

    la = LevitAttention(dim, kd, nh, vd // kd, (res, res))
    variables = la.init(jax.random.key(0), jnp.asarray(x))
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables["batch_stats"]))

    qr, kr, vr = _levit_qkv_rows(nh, kd, vd)
    perm = _levit_bias_perm(None, (res, res), 1)
    flat_p[("q", "linear", "kernel")] = sd["qkv.c.weight"][qr].T
    flat_p[("kv", "linear", "kernel")] = sd["qkv.c.weight"][kr + vr].T
    for tleaf, (coll, ours) in {
        "weight": ("p", "scale"), "bias": ("p", "bias"),
        "running_mean": ("s", "mean"), "running_var": ("s", "var"),
    }.items():
        tgt = flat_p if coll == "p" else flat_s
        tgt[("q", "bn", "BatchNorm_0", ours)] = sd[f"qkv.bn.{tleaf}"][qr]
        tgt[("kv", "bn", "BatchNorm_0", ours)] = sd[f"qkv.bn.{tleaf}"][kr + vr]
        tgt[("proj", "bn", "BatchNorm_0", ours)] = sd[f"proj.1.bn.{tleaf}"]
    flat_p[("proj", "linear", "kernel")] = sd["proj.1.c.weight"].T
    flat_p[("attention_biases",)] = sd["attention_biases"][:, perm]

    new_vars = {
        "params": traverse_util.unflatten_dict(flat_p),
        "batch_stats": traverse_util.unflatten_dict(flat_s),
    }
    got = np.asarray(la.apply(new_vars, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _timm_subsample_forward(x, sd, nh, kd, vd, res, stride):
    """numpy reimplementation of timm levit AttentionSubsample.forward (eval):
    fused per-head [k|v] kv LinearNorm, separate q on the strided sub-grid,
    insertion-order bias table over (sub-grid queries x full-grid keys)."""
    b, n, c = x.shape
    kv = x @ sd["kv.c.weight"].T
    kv = _bn_eval(kv, sd["kv.bn.weight"], sd["kv.bn.bias"],
                  sd["kv.bn.running_mean"], sd["kv.bn.running_var"])
    kv = kv.reshape(b, n, nh, kd + vd)
    k, v = kv[..., :kd], kv[..., kd:]

    xg = x.reshape(b, res, res, c)[:, ::stride, ::stride].reshape(b, -1, c)
    q = xg @ sd["q.1.c.weight"].T
    q = _bn_eval(q, sd["q.1.bn.weight"], sd["q.1.bn.bias"],
                 sd["q.1.bn.running_mean"], sd["q.1.bn.running_var"])
    nq = q.shape[1]
    q = q.reshape(b, nq, nh, kd)

    pts = [(i, j) for i in range(res) for j in range(res)]
    qpts = [(i, j) for i in range(0, res, stride) for j in range(0, res, stride)]
    order, idxs = {}, np.zeros((nq, n), np.int64)
    for a, p1 in enumerate(qpts):
        for bb, p2 in enumerate(pts):
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in order:
                order[off] = len(order)
            idxs[a, bb] = order[off]

    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
    logits = logits + sd["attention_biases"][:, idxs][None]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, nh * vd)
    out = _hswish(out)
    out = out @ sd["proj.1.c.weight"].T
    return _bn_eval(out, sd["proj.1.bn.weight"], sd["proj.1.bn.bias"],
                    sd["proj.1.bn.running_mean"], sd["proj.1.bn.running_var"])


def test_levit_subsample_import_matches_timm_semantics():
    """The downsample attention: per-head [k|v] fused kv reorder + strided-query
    bias table permutation must reproduce timm's AttentionSubsample exactly."""
    from mde_tpu.train.torch_import import _levit_kv_rows

    nh, kd, vd, res, stride, din, dout = 2, 16, 64, 6, 2, 64, 96
    n = res * res
    rng = np.random.default_rng(9)
    Hkv, Hq, Hp = nh * (kd + vd), nh * kd, nh * vd

    def bn(n_feat):
        return {
            "weight": rng.standard_normal(n_feat).astype(np.float32),
            "bias": rng.standard_normal(n_feat).astype(np.float32),
            "running_mean": rng.standard_normal(n_feat).astype(np.float32),
            "running_var": rng.random(n_feat).astype(np.float32) + 0.5,
        }

    sd = {"kv.c.weight": rng.standard_normal((Hkv, din)).astype(np.float32),
          "q.1.c.weight": rng.standard_normal((Hq, din)).astype(np.float32),
          "proj.1.c.weight": rng.standard_normal((dout, Hp)).astype(np.float32)}
    for base, nf in (("kv.bn", Hkv), ("q.1.bn", Hq), ("proj.1.bn", dout)):
        for leaf, val in bn(nf).items():
            sd[f"{base}.{leaf}"] = val
    nuniq = len(_levit_bias_perm(None, (res, res), stride))
    sd["attention_biases"] = rng.standard_normal((nh, nuniq)).astype(np.float32)

    x = rng.standard_normal((1, n, din)).astype(np.float32)
    want = _timm_subsample_forward(x, sd, nh, kd, vd, res, stride)

    la = LevitAttention(din, kd, nh, vd // kd, (res, res), down_stride=stride,
                        out_dim=dout)
    variables = la.init(jax.random.key(0), jnp.asarray(x))
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))
    flat_s = traverse_util.flatten_dict(dict(variables["batch_stats"]))

    kr, vr = _levit_kv_rows(nh, kd, vd)
    perm = _levit_bias_perm(None, (res, res), stride)
    flat_p[("kv", "linear", "kernel")] = sd["kv.c.weight"][kr + vr].T
    flat_p[("q", "linear", "kernel")] = sd["q.1.c.weight"].T
    flat_p[("proj", "linear", "kernel")] = sd["proj.1.c.weight"].T
    flat_p[("attention_biases",)] = sd["attention_biases"][:, perm]
    for tleaf, (coll, ours) in {
        "weight": ("p", "scale"), "bias": ("p", "bias"),
        "running_mean": ("s", "mean"), "running_var": ("s", "var"),
    }.items():
        tgt = flat_p if coll == "p" else flat_s
        tgt[("kv", "bn", "BatchNorm_0", ours)] = sd[f"kv.bn.{tleaf}"][kr + vr]
        tgt[("q", "bn", "BatchNorm_0", ours)] = sd[f"q.1.bn.{tleaf}"]
        tgt[("proj", "bn", "BatchNorm_0", ours)] = sd[f"proj.1.bn.{tleaf}"]

    new_vars = {
        "params": traverse_util.unflatten_dict(flat_p),
        "batch_stats": traverse_util.unflatten_dict(flat_s),
    }
    got = np.asarray(la.apply(new_vars, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
