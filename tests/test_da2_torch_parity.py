"""End-to-end Depth-Anything-V2 (vits) numerical parity vs a torch
reconstruction.

Same methodology as every other family harness (tests/test_flagship_torch_parity.py
et al.): build the release-naming torch DA-V2 (tests/torch_da2_ref.py),
randomize every parameter (incl. the near-identity LayerScales and the frozen
pos-embed), export its state_dict, ingest through the production import map
(train/torch_import.py::map_depth_anything_key), and require the flax forward
to match the torch forward at fp32 tolerance — DINOv2 trunk with taps at
[2, 5, 8, 11], hub-exact bicubic pos-embed interpolation off the 37x37
pretrain grid, the DPT head's project/resize/refinenet cascade at features=64,
and the output_conv2 depth tail whose final 1x1 maps to our top-level
``final`` conv.

This closes the last model family without end-to-end numeric verification
(DA-V2 is a beyond-reference addition — BASELINE.json stretch config #5 —
previously covered only by param-count and structural map tests).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models.depth_anything import DepthAnythingV2
from mde_tpu.train.torch_import import import_state_dict, map_depth_anything_key
from tests.torch_da2_ref import DepthAnythingV2Torch


@pytest.fixture(scope="module")
def torch_da2():
    torch.manual_seed(0)
    model = DepthAnythingV2Torch()
    with torch.no_grad():
        torch.nn.init.normal_(model.pretrained.pos_embed, std=0.02)
        torch.nn.init.normal_(model.pretrained.cls_token, std=0.02)
        for blk in model.pretrained.blocks:
            blk.ls1.gamma.uniform_(0.2, 0.8)
            blk.ls2.gamma.uniform_(0.2, 0.8)
        # Bias the depth tail positive so the final ReLU doesn't clip the whole
        # map to zero under random weights (a degenerate all-zero comparison
        # would pass allclose vacuously).
        model.depth_head.scratch.output_conv2[2].bias.fill_(0.5)
    model.eval()
    return model


def test_da2_forward_parity(torch_da2):
    h, w = 112, 140  # 8x10 token grid: off the 37x37 grid -> bicubic path
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_da2(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = DepthAnythingV2(size="vits")
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)))

    sd = {k: np.asarray(v.numpy()) for k, v in torch_da2.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}),
        map_depth_anything_key,
    )
    dead_ok = {"pretrained.mask_token"} | {
        f"depth_head.scratch.refinenet4.resConfUnit1.conv{c}.{leaf}"
        for c in (1, 2)
        for leaf in ("weight", "bias")
    }
    assert set(report["unmapped"]) <= dead_ok, sorted(
        set(report["unmapped"]) - dead_ok
    )[:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    assert float(want.std()) > 1e-3  # non-degenerate target (ReLU not saturated)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    gf, wf = got.ravel(), want.ravel()
    corr = np.corrcoef(gf, wf)[0, 1]
    assert corr > 0.9999, corr


def test_da2_metric_variant_head(torch_da2):
    """The metric variant replaces the final ReLU with sigmoid*max_depth
    (DA-V2 metric_depth head); same parameters, bounded output."""
    h, w = 56, 84
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    )
    model = DepthAnythingV2(size="vits", max_depth=20.0)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)))
    sd = {k: np.asarray(v.numpy()) for k, v in torch_da2.state_dict().items()}
    params, _, report = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}),
        map_depth_anything_key,
    )
    assert not report["shape_mismatch"]
    out = np.asarray(model.apply({"params": params}, x))
    assert out.shape == (1, h, w)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 20.0
