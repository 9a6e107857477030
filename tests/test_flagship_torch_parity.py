"""End-to-end flagship numerical parity vs a torch reconstruction.

The honest stand-in for the BASELINE "within 1% of the reference checkpoint"
target while real release checkpoints are unreachable (zero egress): build the
reference-naming torch flagship (tests/torch_flagship_ref.py), randomize every
parameter AND BN running stat, export its state_dict, ingest it through the
production import map (map_midas_semantics_key), and require the flax forward
to match the torch forward at fp32 tolerance through the entire stack —
TF-SAME effnet encoder, refinenet decoder, DINOv2 ViT, Dinov2Head, windowed
cross-attention, fusion/depth heads, and every resize in between.

Documented divergences carved out by construction (both sides use the same
semantics; see PARITY.md): rectangular attention windows, bilinear pos-embed
interpolation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models import MidasNetSemantics
from mde_tpu.train.torch_import import import_state_dict, map_midas_semantics_key
from tests.torch_flagship_ref import MidasNetSemanticsTorch, randomize_running_stats


@pytest.fixture(scope="module")
def torch_flagship():
    torch.manual_seed(0)
    model = MidasNetSemanticsTorch(features=64, dinov2_image_size=(28, 42))
    # Make the frozen/near-identity parts numerically non-trivial so the test
    # actually exercises their weight mapping.
    with torch.no_grad():
        torch.nn.init.normal_(model.dinov2.pos_embed, std=0.02)
        torch.nn.init.normal_(model.dinov2.cls_token, std=0.02)
        for blk in model.dinov2.blocks:
            blk.ls1.gamma.uniform_(0.2, 0.8)
            blk.ls2.gamma.uniform_(0.2, 0.8)
        randomize_running_stats(model)
    model.eval()
    return model


def test_flagship_forward_parity(torch_flagship):
    h, w = 64, 96
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_flagship(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)

    sd = {k: np.asarray(v.numpy()) for k, v in torch_flagship.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_semantics_key
    )
    # Complete surface: only the documented dead keys stay unmapped.
    dead_ok = {"dinov2.mask_token"} | {
        f"{tree}refinenet4.resConfUnit1.conv{c}.{leaf}"
        for tree in ("scratch.", "dinov2_head.scratch.")
        for c in (1, 2)
        for leaf in ("weight", "bias")
    } | {k for k in report["unmapped"] if "num_batches_tracked" in k}
    assert set(report["unmapped"]) <= dead_ok, sorted(set(report["unmapped"]) - dead_ok)[:8]
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]

    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    assert got.shape == want.shape
    # fp32 end-to-end through ~60 layers: tolerate accumulated rounding but
    # nothing structural.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    # and the outputs must be strongly correlated, not just both-small
    gf, wf = got.ravel(), want.ravel()
    corr = np.corrcoef(gf, wf)[0, 1]
    assert corr > 0.9999, corr


def test_flagship_forward_parity_flagship_resolution(torch_flagship):
    """One full-resolution spot check (448x576 input, 224x280 DINOv2 branch is
    replaced by the test-scale branch to keep CPU time sane): verifies the
    resize/window geometry at the real 56x72 ragged attention grid."""
    h, w = 448, 576
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.5, 1.5, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_flagship(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    sd = {k: np.asarray(v.numpy()) for k, v in torch_flagship.state_dict().items()}
    params, stats, _ = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_semantics_key
    )
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)
