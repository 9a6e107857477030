"""Gradient accumulation (make_train_step(accum_steps=N)) — the path past the
tunnel compiler's flagship-bs32 ceiling (VERDICT r2 item 10).

Exactness claim tested the strong way: with a batch made of two identical
halves and augmentation off, every per-microbatch quantity (BN batch stats
included) equals the full-batch one, so the accumulated update must reproduce
the single-step update bit-for-bit up to fp32 reduction order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import SimpleUNet, MidasNetSmall
from mde_tpu.train import create_train_state, make_train_step


def _cfg(size):
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    cfg.augmentation = False
    return cfg


def _tree_allclose(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def _deterministic_pipeline(augmentation, input_size):
    """Key-independent stand-in: even preprocess_train jitters colors
    per-sample (the reference's default transform), which would make the two
    identical halves diverge and mask the accumulation-mechanics equality
    this test is about."""
    from mde_tpu.data import transforms as T
    from mde_tpu.ops import image as I

    size = tuple(int(s) for s in input_size)

    def pipeline(key, rgb_u8, depth):
        rgb = I.normalize_imagenet(I.to_float(rgb_u8))
        return rgb, depth

    return pipeline


class _TinyNet(__import__("flax").linen.Module):
    """BN-free conv net: isolates the accumulation mechanics from BN's
    batch-statistic fp cancellation (measured: BN backward amplifies
    reduction-order ULPs to ~3e-3 relative grad differences between a
    duplicated-4 batch and its 2-sample half, independent of accumulation)."""

    @__import__("flax").linen.compact
    def __call__(self, x, train=False):
        import flax.linen as nn

        h = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        h = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(h))
        return nn.softplus(nn.Conv(1, (1, 1))(h))[..., 0]


def test_accumulated_step_matches_full_batch_exactly(monkeypatch):
    """BN-free model + per-sample-decomposable losses (silog's global masked
    mean zeroed) + deterministic pipeline: the accumulated update over two
    DIFFERENT microbatches must equal the full-batch update to fp32 rounding."""
    from mde_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod.T, "make_train_pipeline", _deterministic_pipeline
    )
    size = (32, 32)
    cfg = _cfg(size)
    cfg.model.loss_function.silog_loss.alpha = 0.0  # global-mean loss: nonlinear in microbatches
    model = _TinyNet()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (4, *size, 3)).astype(np.uint8)
    depth = rng.uniform(0.5, 5.0, (4, *size)).astype(np.float32)

    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    state_a = create_train_state(model, jax.random.key(0), rgb_f, cfg)
    state_b = create_train_state(model, jax.random.key(0), rgb_f, cfg)

    step_full = make_train_step(model, cfg)
    step_acc = make_train_step(model, cfg, accum_steps=2)

    key = jax.random.key(7)
    state_a, m_full = step_full(state_a, key, jnp.asarray(rgb), jnp.asarray(depth))
    state_b, m_acc = step_acc(state_b, key, jnp.asarray(rgb), jnp.asarray(depth))

    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    _tree_allclose(state_a.params, state_b.params, rtol=1e-5, atol=1e-6)
    _tree_allclose(state_a.opt_state, state_b.opt_state, rtol=1e-5, atol=1e-6)


def test_accumulated_step_close_on_bn_model_duplicated_halves(monkeypatch):
    """With BN, exact equality is unattainable even on duplicated halves (fp
    cancellation in BN backward); require closeness at the measured scale."""
    from mde_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod.T, "make_train_pipeline", _deterministic_pipeline
    )
    size = (32, 32)
    cfg = _cfg(size)
    model = SimpleUNet()
    rng = np.random.default_rng(0)
    half_rgb = rng.integers(0, 255, (2, *size, 3)).astype(np.uint8)
    half_depth = rng.uniform(0.5, 5.0, (2, *size)).astype(np.float32)
    rgb = np.concatenate([half_rgb, half_rgb])
    depth = np.concatenate([half_depth, half_depth])

    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    state_a = create_train_state(model, jax.random.key(0), rgb_f, cfg)
    state_b = create_train_state(model, jax.random.key(0), rgb_f, cfg)

    key = jax.random.key(7)
    state_a, m_full = make_train_step(model, cfg)(
        state_a, key, jnp.asarray(rgb), jnp.asarray(depth)
    )
    state_b, m_acc = make_train_step(model, cfg, accum_steps=2)(
        state_b, key, jnp.asarray(rgb), jnp.asarray(depth)
    )
    np.testing.assert_allclose(float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5)
    # one AdamW step at lr=1e-4: params agree to ~the update scale
    _tree_allclose(state_a.params, state_b.params, rtol=0.05, atol=2e-4)


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_accumulated_flagship_family_step_runs_and_converges_direction():
    """Different microbatches on a BN model: not bitwise-equal by design, but
    the loss must be finite and near the full-batch value."""
    size = (32, 32)
    cfg = _cfg(size)
    model = MidasNetSmall()
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (4, *size, 3)).astype(np.uint8)
    depth = rng.uniform(0.5, 5.0, (4, *size)).astype(np.float32)

    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    key = jax.random.key(3)
    state_a = create_train_state(model, jax.random.key(0), rgb_f, cfg)
    state_b = create_train_state(model, jax.random.key(0), rgb_f, cfg)
    _, m_full = make_train_step(model, cfg)(
        state_a, key, jnp.asarray(rgb), jnp.asarray(depth)
    )
    _, m_acc = make_train_step(model, cfg, accum_steps=2)(
        state_b, key, jnp.asarray(rgb), jnp.asarray(depth)
    )
    lf, la = float(m_full["loss"]), float(m_acc["loss"])
    assert np.isfinite(lf) and np.isfinite(la)
    # BN batch stats over 2 vs 4 random samples at init plus independent
    # augmentation draws per microbatch move the loss a lot on this synthetic
    # tiny batch (measured ~6% with augmentation pinned); only sanity-band it.
    assert la < 3 * lf + 1.0 and lf < 3 * la + 1.0, (la, lf)


def test_accumulation_under_mesh():
    """accum_steps composes with the dp mesh (microbatch shards over 'data')."""
    from mde_tpu.parallel import make_mesh, shard_batch

    size = (32, 32)
    cfg = _cfg(size)
    model = SimpleUNet()
    mesh = make_mesh(data=4, model=1)
    rng = np.random.default_rng(2)
    batch = {
        "rgb": rng.integers(0, 255, (8, *size, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, *size)).astype(np.float32),
    }
    rgb_f = jnp.zeros((1, *size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
    data = shard_batch(batch, mesh)
    step = make_train_step(model, cfg, accum_steps=2)
    state, metrics = step(state, jax.random.key(5), data["rgb"], data["depth"])
    assert np.isfinite(float(metrics["loss"]))


def test_fit_validates_accum_against_loader_up_front():
    """fit() must reject accum configs that would only crash at trace time on
    a mid-epoch remainder batch (code-review finding: hours of training lost
    to the last batch of the epoch)."""
    import pytest

    from mde_tpu.train.trainer import fit

    class StubLoader:
        batch_size = 5
        num_samples = 20
        drop_last = False

    cfg = _cfg((32, 32))
    cfg.framework.grad_accum_steps = 2

    # batch size not divisible by accum_steps: rejected before any compile
    with pytest.raises(ValueError, match="not divisible"):
        fit(None, cfg, None, StubLoader(), None, results_dir="/tmp")

    # divisible batch but a drop_last=False remainder that isn't: rejected
    class RemainderLoader:
        batch_size = 4
        num_samples = 21  # final batch of 1
        drop_last = False

    with pytest.raises(ValueError, match="drop_last"):
        fit(None, cfg, None, RemainderLoader(), None, results_dir="/tmp")

    # clean configs pass validation (and then fail later on the None model,
    # which is fine — we only assert the up-front gate lets them through)
    class CleanLoader:
        batch_size = 4
        num_samples = 20
        drop_last = False

    with pytest.raises((TypeError, AttributeError)):
        fit(None, cfg, None, CleanLoader(), None, results_dir="/tmp")
