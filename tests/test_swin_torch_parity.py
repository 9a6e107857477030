"""Swin V1 backbone numerical parity vs the timm-semantics torch
reconstruction (tests/torch_swin_ref.py): all four stage outputs must match
after importing the torch state_dict through the production map — exercising
the patch-merge channel-group permutation, shifted-window masks, torch.roll
semantics and the relative-position-bias tables in full composition. Fourth
harness in the family (flagship, MidasNet v2.1, DPT token-ViT, Swin)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mde_tpu.nn import swin as swin_lib
from mde_tpu.train.torch_import import import_state_dict, map_dpt_swin_key
from tests.torch_swin_ref import SwinTorch

VARIANT = "swintest_v1"
CONFIG = (1, 32, (2, 2, 2, 2), (2, 4, 8, 16), 2)


@pytest.fixture()
def tiny_variant():
    swin_lib.SWIN_CONFIGS[VARIANT] = CONFIG
    yield VARIANT
    swin_lib.SWIN_CONFIGS.pop(VARIANT, None)


def test_swin_v1_stage_parity(tiny_variant):
    torch.manual_seed(0)
    ref = SwinTorch(embed=32, depths=(2, 2, 2, 2), heads=(2, 4, 8, 16), window=2)
    with torch.no_grad():
        for m in ref.modules():
            if hasattr(m, "relative_position_bias_table"):
                torch.nn.init.normal_(m.relative_position_bias_table, std=0.5)
    ref.eval()

    h = w = 64
    rng = np.random.default_rng(6)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2))]

    bb = swin_lib.SwinBackbone(tiny_variant)
    variables = bb.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)

    # the production map emits paths under the DPT 'pretrained' submodule;
    # strip that prefix to land on the bare backbone tree.
    def keymap(k):
        mapped = map_dpt_swin_key(f"pretrained.model.{k}", version=1)
        if mapped is None:
            return None
        coll, path, kind = mapped
        assert path[0] == "pretrained", path
        return (coll, path[1:], kind)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, _, report = import_state_dict(sd, variables["params"], {}, keymap)
    assert not report["unmapped"], report["unmapped"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = bb.apply({"params": params}, jnp.asarray(x), train=False)
    for si, (g, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), wv, rtol=2e-3, atol=2e-3,
            err_msg=f"stage {si} mismatch",
        )


V2_VARIANT = "swintest_v2"


@pytest.fixture()
def tiny_variant_v2():
    swin_lib.SWIN_CONFIGS[V2_VARIANT] = (2, 32, (2, 2, 2, 2), (2, 4, 8, 16), 2)
    yield V2_VARIANT
    swin_lib.SWIN_CONFIGS.pop(V2_VARIANT, None)


def test_swin_v2_stage_parity(tiny_variant_v2):
    """V2: cosine attention with clamped logit scale, log-CPB MLP bias,
    post-norm blocks, reduction-first PatchMerging — plus the q/v-bias fusing
    preprocessor (_preprocess_swin_v2) exercised on a real state_dict."""
    from mde_tpu.train.torch_import import _preprocess_swin_v2
    from tests.torch_swin_ref import SwinTorchV2

    torch.manual_seed(1)
    ref = SwinTorchV2(embed=32, depths=(2, 2, 2, 2), heads=(2, 4, 8, 16), window=2)
    with torch.no_grad():
        for m in ref.modules():
            for attr in ("q_bias", "v_bias"):
                if hasattr(m, attr):
                    torch.nn.init.normal_(getattr(m, attr), std=0.5)
    ref.eval()

    h = w = 64
    rng = np.random.default_rng(7)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in ref(torch.from_numpy(x.copy()).permute(0, 3, 1, 2))]

    bb = swin_lib.SwinBackbone(tiny_variant_v2)
    variables = bb.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)

    def keymap(k):
        mapped = map_dpt_swin_key(f"pretrained.model.{k}", version=2)
        if mapped is None:
            return None
        coll, path, kind = mapped
        return (coll, path[1:], kind)

    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    sd = _preprocess_swin_v2(sd)
    params, _, report = import_state_dict(sd, variables["params"], {}, keymap)
    assert not report["unmapped"], report["unmapped"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = bb.apply({"params": params}, jnp.asarray(x), train=False)
    for si, (g, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), wv, rtol=2e-3, atol=2e-3,
            err_msg=f"stage {si} mismatch",
        )
