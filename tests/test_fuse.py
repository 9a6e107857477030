"""Conv+BN folding (nn/fuse.py — the reference's fuse_model equivalent)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mde_tpu.models import MidasNetSemantics, MidasNetSmall
from mde_tpu.nn.fuse import discover_conv_bn_pairs, fuse_model_params


def _randomize_stats(batch_stats, key):
    """Non-trivial running stats: means ~ U(-.25, .25), vars ~ U(.75, 1.25)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(dict(batch_stats))
    out = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        r = jax.random.uniform(
            jax.random.fold_in(key, i), leaf.shape, minval=0.75, maxval=1.25
        )
        out[path] = r - 1.0 if path[-1] == "mean" else r
    return traverse_util.unflatten_dict(out)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_fuse_midas_small_eval_equivalence(rng):
    model = MidasNetSmall()
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    stats = _randomize_stats(variables["batch_stats"], jax.random.key(1))

    want = model.apply({"params": variables["params"], "batch_stats": stats}, x, train=False)

    pairs = discover_conv_bn_pairs(variables["params"], stats)
    # every BN in the model is reachable from some conv (nothing left unfused)
    from flax import traverse_util

    bn_modules = {p[:-2] for p in traverse_util.flatten_dict(dict(stats))}
    assert {bn for _, bn in pairs} == bn_modules

    fused_params, fused_stats = fuse_model_params(variables["params"], stats)
    got = model.apply({"params": fused_params, "batch_stats": fused_stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_fuse_flagship_eval_equivalence(rng):
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    stats = _randomize_stats(variables["batch_stats"], jax.random.key(1))

    want = model.apply({"params": variables["params"], "batch_stats": stats}, x, train=False)
    fused_params, fused_stats = fuse_model_params(variables["params"], stats)
    got = model.apply({"params": fused_params, "batch_stats": fused_stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_fuse_midas_net_eval_equivalence(rng):
    """MidasNet's ResNeXt encoder also lives under 'pretrained' but uses plain
    eps-1e-5 BatchNorm, not TFBatchNorm — the eps selection must key on the
    effnet block naming, not the submodule name (regression: folding these BNs
    with eps 1e-3 produced 0.4 relative-L2 output error). Also pins full pair
    coverage incl. the downsample_conv/downsample_bn shortcut rule."""
    from mde_tpu.models.midas_net import MidasNet

    model = MidasNet(features=64, encoder_layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    stats = _randomize_stats(variables["batch_stats"], jax.random.key(1))

    want = model.apply({"params": variables["params"], "batch_stats": stats}, x, train=False)

    pairs = discover_conv_bn_pairs(variables["params"], stats)
    from flax import traverse_util

    bn_modules = {p[:-2] for p in traverse_util.flatten_dict(dict(stats))}
    assert {bn for _, bn in pairs} == bn_modules, bn_modules - {bn for _, bn in pairs}

    fused_params, fused_stats = fuse_model_params(variables["params"], stats)
    got = model.apply({"params": fused_params, "batch_stats": fused_stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
