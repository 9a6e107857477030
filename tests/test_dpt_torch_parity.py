"""End-to-end DPT (token-ViT) numerical parity vs a torch reconstruction:
randomize all params of the reference-naming torch DPT (tests/torch_dpt_ref.py
— timm ViT trunk with fused qkv and interpolated pos-embed, ProjectReadout
act_postprocess pipeline, custom-FFB cascade with explicit size targeting,
monocular head), ingest the state_dict through the production map
(map_dpt_key), and require the flax forward to match at fp32 tolerance.
Third harness in the family (flagship, MidasNet v2.1, DPT)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models.dpt import DPTDepthModel
from mde_tpu.train.torch_import import import_state_dict, map_dpt_key
from tests.torch_dpt_ref import DPTTorch


def test_dpt_vitb_forward_parity():
    torch.manual_seed(0)
    ref = DPTTorch(features=64)
    with torch.no_grad():
        torch.nn.init.normal_(ref.pretrained.model.pos_embed, std=0.02)
        torch.nn.init.normal_(ref.pretrained.model.cls_token, std=0.02)
    ref.eval()

    h, w = 64, 96
    rng = np.random.default_rng(4)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2)).numpy()

    model = DPTDepthModel(backbone="vitb16_384", features=64)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)
    assert "batch_stats" not in variables or not variables.get("batch_stats")

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, _, report = import_state_dict(sd, variables["params"], {}, map_dpt_key)
    dead = report["unmapped"]
    assert all(
        "refinenet4.resConfUnit1" in k or k.startswith("pretrained.model.norm.")
        for k in dead
    ), dead
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
