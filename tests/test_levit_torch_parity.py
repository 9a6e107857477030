"""dpt_levit_224 end-to-end numerical parity vs the timm-semantics torch
reconstruction (tests/torch_levit_ref.py): the FULL model — ConvNorm stem,
Residual attention/FFN pairs, attention subsamples, the reference's mid-stage
hook taps [3, 11, 21], ConvTransposeNorm stem_transpose and the 64/8 head —
must match after importing the real-named state_dict through
map_dpt_levit_key. Seventh harness; directly validates this round's LeViT tap
rework and the fused-qkv/bias-table converters in full composition."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.models.dpt import DPTDepthModel
from mde_tpu.train.torch_import import import_state_dict, map_dpt_levit_key
from tests.torch_levit_ref import DPTLevitTorch


def _randomize_all_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


def test_dpt_levit_forward_parity():
    torch.manual_seed(0)
    ref = DPTLevitTorch(features=256)
    with torch.no_grad():
        _randomize_all_bn_stats(ref)
        for m in ref.modules():
            if hasattr(m, "attention_biases"):
                torch.nn.init.normal_(m.attention_biases, std=0.5)
    ref.eval()

    x = np.random.default_rng(5).uniform(-1.5, 1.5, (1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2)).numpy()

    model = DPTDepthModel(backbone="levit_384", head_features_1=64, head_features_2=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables["batch_stats"], map_dpt_levit_key
    )
    import re

    def expected_dead(k):
        if "attention_bias_idxs" in k or k.endswith("num_batches_tracked"):
            return True
        if "refinenet3.resConfUnit1" in k:
            return True
        m = re.match(r"pretrained\.model\.blocks\.(\d+)\.", k)
        return bool(m) and int(m.group(1)) >= 22  # post-hook dead tail
    unexpected = [k for k in report["unmapped"] if not expected_dead(k)]
    assert not unexpected, unexpected[:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
