"""End-to-end MidasNet (MiDaS v2.1) numerical parity vs a torch
reconstruction: randomize every parameter and BN running stat, export the
reference-naming state_dict, ingest through the production map
(map_midas_net_key), and require the flax forward to match torch at fp32
tolerance — grouped ResNeXt bottlenecks, stage-sliced stem, refinenet cascade
with align_corners=True upsamples, and the v2.1 head. Companion to
test_flagship_torch_parity.py; encoder depth reduced to (2,2,2,2) for CI time
(per-block math identical to the (3,4,23,3) WSL net)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models.midas_net import MidasNet
from mde_tpu.train.torch_import import import_state_dict, map_midas_net_key
from tests.torch_flagship_ref import randomize_running_stats
from tests.torch_midas_net_ref import MidasNetTorch

LAYERS = (2, 2, 2, 2)


def test_midas_net_forward_parity():
    torch.manual_seed(0)
    ref = MidasNetTorch(features=64, layers=LAYERS)
    with torch.no_grad():
        randomize_running_stats(ref)
    ref.eval()

    h, w = 64, 96
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = MidasNet(features=64, encoder_layers=LAYERS)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_midas_net_key
    )
    # only the dead refinenet4.resConfUnit1 + BN bookkeeping go unmapped
    dead = [k for k in report["unmapped"]
            if not k.endswith("num_batches_tracked")]
    assert all("refinenet4.resConfUnit1" in k for k in dead), dead
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
