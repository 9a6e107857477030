"""Hybrid ResNetV2 stem numerical parity vs the timm-semantics torch
reconstruction: stage outputs must match after importing the state_dict
through the production map (the resnetv2 arm of map_dpt_key) — covering the
StdConv2dSame weight standardization, TF-SAME asymmetric padding, 'same'
maxpool stem and the pre-activation bottleneck wiring. Sixth harness in the
family."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.nn.resnetv2 import ResNetV2Stem
from mde_tpu.train.torch_import import _map_resnetv2_key, import_state_dict
from tests.torch_resnetv2_ref import ResNetV2Torch

LAYERS = (2, 2, 2)  # reduced depth; per-block math identical to (3, 4, 9)


def test_resnetv2_stage_parity():
    torch.manual_seed(0)
    ref = ResNetV2Torch(layers=LAYERS)
    ref.eval()

    h, w = 64, 96  # even dims: exercises the asymmetric SAME pads
    rng = np.random.default_rng(8)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t.permute(0, 2, 3, 1).numpy()
                for t in ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2))]

    stem = ResNetV2Stem(layers=LAYERS)
    variables = stem.init(jax.random.key(0), jnp.zeros((1, h, w, 3)))

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, _, report = import_state_dict(
        sd, variables["params"], {}, lambda k: _map_resnetv2_key(k, ())
    )
    assert not report["unmapped"], report["unmapped"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = stem.apply({"params": params}, jnp.asarray(x))
    for si, (g, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), wv, rtol=2e-3, atol=2e-3,
            err_msg=f"stage {si} mismatch",
        )
