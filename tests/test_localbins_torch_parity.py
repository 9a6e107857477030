"""End-to-end LocalBins + DGR numerical parity vs torch reconstructions
through the production import maps (VERDICT r2 item 1 — the last reference
components with zero numeric verification).

Covers: (a) the standalone LocalBins_Block chain (seed regressor ->
inv-attractor cascade -> conditional log-binomial -> sum(p*c), the numerically
touchy part, localbins_net.py:54-110), (b) the full MidasNet_small forward
with use_lb=True and use_dgr=True (midas_net_custom.py:140-185) ingested via
map_midas_small_key, (c) the semantics-map contract for local_bins.* (top
level) and dgr* (dead — the reference semantics forward never calls DGR), and
(d) a use_lb train-step convergence smoke on the CPU mesh."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.models import MidasNetSmall
from mde_tpu.models.localbins import LocalBinsBlock
from mde_tpu.train.torch_import import (
    import_state_dict,
    map_localbins_key,
    map_midas_small_key,
    map_midas_semantics_key,
)
from tests.torch_flagship_ref import randomize_running_stats
from tests.torch_localbins_ref import LocalBinsBlockTorch, MidasNetSmallTorch


def _import_from_torch(ref, variables, key_map):
    sd = {k: np.asarray(v.numpy()) for k, v in ref.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}), key_map
    )
    return params, stats, report


EXPECTED_DEAD = (
    "refinenet4.resConfUnit1",  # single-input refinenet4
    "num_batches_tracked",      # BN bookkeeping
    ".lap2.weight", ".lap3.weight",  # frozen DGR Laplacian constants
    ".k_idx", ".K_minus_1",     # deterministic LogBinomial buffers
)


def test_localbins_block_parity():
    """Standalone head: synthetic decoder pyramid at MiDaS_small channels."""
    torch.manual_seed(0)
    channels = (64, 32, 16, 8, 8)  # scaled-down (512,256,128,64,64) contract
    ref = LocalBinsBlockTorch(channels=channels)
    ref.eval()

    rng = np.random.default_rng(2)
    h, w = 8, 12
    # pyramid: outconv at 2x path_1 resolution, btlnck smallest — mirrors the
    # real geometry ratios (btlnck H/32, path_i upsampled 2x each, out 2x more)
    shapes = [
        (2, h * 16, w * 16, 1),            # outconv_activation
        (2, h, w, channels[0]),            # btlnck (layer_4_rn)
        (2, h * 2, w * 2, channels[1]),    # path_4
        (2, h * 4, w * 4, channels[2]),    # path_3
        (2, h * 8, w * 8, channels[3]),    # path_2
        (2, h * 8, w * 8, channels[4]),    # path_1 (same res as path_2 out)
    ]
    feats = [rng.uniform(-1, 1, s).astype(np.float32) for s in shapes]
    feats[0] = np.abs(feats[0])  # post-ReLU depth activation
    rel = feats[0][..., 0]

    with torch.no_grad():
        want = ref(
            [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats],
            torch.from_numpy(rel),
        ).numpy()

    block = LocalBinsBlock()
    variables = block.init(jax.random.key(0), [jnp.asarray(f) for f in feats],
                           jnp.asarray(rel))
    params, _, report = _import_from_torch(
        ref, variables, lambda k: map_localbins_key(k, prefix=())
    )
    dead = [k for k in report["unmapped"]
            if not any(t in k for t in EXPECTED_DEAD)]
    assert not dead, dead
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(block.apply({"params": params},
                                 [jnp.asarray(f) for f in feats], jnp.asarray(rel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_midas_small_lb_dgr_forward_parity():
    """Full model, both flags on, through the production MiDaS_small map."""
    torch.manual_seed(1)
    ref = MidasNetSmallTorch(use_lb=True, use_dgr=True)
    with torch.no_grad():
        randomize_running_stats(ref)
    ref.eval()

    h, w = 64, 96
    rng = np.random.default_rng(3)
    x = rng.uniform(-1.5, 1.5, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = MidasNetSmall(use_lb=True, use_dgr=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)
    params, stats, report = _import_from_torch(ref, variables, map_midas_small_key)
    dead = [k for k in report["unmapped"]
            if not any(t in k for t in EXPECTED_DEAD)]
    assert not dead, dead
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]

    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), train=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_semantics_map_localbins_and_dead_dgr():
    """Semantics checkpoints host local_bins.* at top level (fed by the depth
    head, midas_semantics.py:261-265) and carry dead dgr* weights (its forward
    never calls them)."""
    mapped = map_midas_semantics_key("local_bins.conv2.weight")
    assert mapped is not None
    _, path, _ = mapped
    assert path[0] == "local_bins"  # NOT under the midas branch

    assert map_midas_semantics_key("dgr1.recalib.1.weight") is None
    assert map_midas_semantics_key("dgr4.spatial.bias") is None

    # The full semantics model with use_lb exposes every mapped path.
    from mde_tpu.models import MidasNetSemantics

    model = MidasNetSemantics(use_lb=True, dinov2_image_size=(28, 42))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 96, 3)), train=False)
    flat_p = traverse_util.flatten_dict(dict(variables["params"]))

    ref = LocalBinsBlockTorch()
    for tkey in ref.state_dict():
        full = f"local_bins.{tkey}"
        m = map_midas_semantics_key(full)
        if any(t in full for t in EXPECTED_DEAD):
            assert m is None, full
            continue
        assert m is not None, full
        _, path, _ = m
        assert path in flat_p, f"{full} -> {path}"


def test_localbins_train_step_convergence_smoke():
    """use_lb=True training step decreases the SI loss on a tiny batch — the
    attractor/log-binomial chain must be differentiable and stable (SURVEY
    §7.4.7: numerically touchy under low precision; this runs fp32 on CPU)."""
    import optax

    from mde_tpu.losses import scale_invariant_loss

    model = MidasNetSmall(use_lb=True)
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(0.5, 2.0, (2, 32, 32)).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.asarray(x), train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            pred, updates = model.apply(
                {"params": p, "batch_stats": stats}, jnp.asarray(x), train=True,
                mutable=["batch_stats"],
            )
            return scale_invariant_loss(pred, jnp.asarray(y)), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses = []
    for _ in range(8):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
