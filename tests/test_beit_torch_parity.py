"""DPT-BEiT end-to-end numerical parity vs the timm-semantics torch
reconstruction: full model through map_dpt_beit_key — fused-qkv fan-out to our
separate q/k/v, cls-slot tail permutation of the bias table, gamma residuals,
readout/scratch/head. Eighth (final) harness: every checkpoint family is now
verified in full composition.

The flax BEiT sizes its bias table to the pretrain grid and interpolates at
runtime; the test pins pretrain_grid to the runtime grid so both sides use the
native table (interpolation itself is covered by tests/test_backbones.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models.dpt import DPTDepthModel
from mde_tpu.nn import beit as beit_lib
from mde_tpu.train.torch_import import import_state_dict, map_dpt_beit_key
from tests.torch_beit_ref import DPTBeitTorch

GRID = (4, 6)  # 64x96 / patch 16


@pytest.fixture()
def native_grid_variant():
    orig = beit_lib.BEIT_CONFIGS["beitb16_384"]
    beit_lib.BEIT_CONFIGS["beitb16_384"] = orig[:4] + (GRID,)
    yield
    beit_lib.BEIT_CONFIGS["beitb16_384"] = orig


def test_dpt_beit_forward_parity(native_grid_variant):
    torch.manual_seed(0)
    ref = DPTBeitTorch(features=64, grid=GRID)
    with torch.no_grad():
        torch.nn.init.normal_(ref.pretrained.model.cls_token, std=0.02)
        for blk in ref.pretrained.model.blocks:
            torch.nn.init.normal_(blk.attn.relative_position_bias_table, std=0.5)
            blk.gamma_1.uniform_(0.2, 0.8)
            blk.gamma_2.uniform_(0.2, 0.8)
    ref.eval()

    h, w = 64, 96
    x = np.random.default_rng(3).uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2)).numpy()

    model = DPTDepthModel(backbone="beitb16_384", features=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, _, report = import_state_dict(sd, variables["params"], {}, map_dpt_beit_key)
    dead = [k for k in report["unmapped"]
            if "refinenet4.resConfUnit1" not in k
            and "relative_position_index" not in k]
    assert not dead, dead[:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
