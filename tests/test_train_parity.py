"""Cross-framework TRAINING-DYNAMICS parity vs torch (VERDICT r3 Missing #1).

Every model family has *forward* parity and the losses/metrics are golden-
tested as pure functions, but nothing previously checked that a training RUN
here matches a training run in torch: AdamW decoupled-decay semantics on this
param tree, loss gradients, BN running-stat updates, eps placement. With
release checkpoints unreachable (no egress), this is the honest stand-in for
BASELINE's "within 1% of the reference checkpoint": the same torch init is
imported through the production map, both frameworks run K identical AdamW
steps (fixed batches, identical post-pipeline inputs, fp32), and we assert

  1. per-step loss trajectories track within fp32 tolerance,
  2. the global parameter-delta direction agrees (coarse: catches wrong lr,
     sign, or masking errors). Per-leaf delta EQUALITY is *not* assertable
     across frameworks for Adam: at step 1 the update is +-lr*sign(g) on
     every coordinate (v_hat = g^2), so any coordinate whose true gradient is
     near zero — e.g. a conv bias feeding a BatchNorm, whose gradient is
     mathematically 0 — takes a full-size step whose sign is decided by fp32
     noise that differs between XLA and torch reduction orders. Measured
     while building this test: after 1 step the loss agrees at 3e-7 while
     those bias deltas are already fully divergent (rel ~1.5), and a
     torch-vs-torch control with a 1e-7 init perturbation shows the same
     class of drift. The EXACT optimizer-semantics check therefore lives in
     test_adamw_semantics_match_torch_exactly below, which feeds bit-identical
     synthetic gradients to optax and torch AdamW — that is the test that
     pins eps placement and decoupled weight decay deterministically.
  3. final eval-protocol metrics (SI-RMSE / AbsRel / delta) match.

Training recipe per the reference: AdamW lr=1e-4 wd=1e-4, betas (0.9, 0.999),
eps 1e-8 (/root/reference/src/main.py:26-28,678), combined loss with ALL four
terms enabled (src/main.py:51-89) so every loss gradient is exercised.

Identical inputs: the jitted train step runs the on-device pipeline
(resize + ColorJitter + normalize) internally from the step key; the test
precomputes that same pipeline with the same keys and feeds torch the
resulting tensors, so both frameworks see bit-identical network inputs and
the comparison isolates model forward + loss + optimizer dynamics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF

import jax
import jax.numpy as jnp
from flax import traverse_util

from mde_tpu.core import config as config_lib
from mde_tpu.data import transforms as T
from mde_tpu.models import MidasNetSemantics, MidasNetSmall, SimpleUNet
from mde_tpu.train import create_train_state, evaluate, make_train_step
from mde_tpu.train.torch_import import (
    import_state_dict,
    map_midas_semantics_key,
    map_midas_small_key,
    map_simple_unet_key,
)
from tests.test_torch_import import TorchSimpleUNet
from tests.torch_flagship_ref import MidasNetSemanticsTorch, randomize_running_stats
from tests.torch_localbins_ref import MidasNetSmallTorch

EPS = 1e-6


# ---------------------------------------------------------------------------
# Torch-side losses, written from the reference formulas
# (src/util.py:24-156, src/main.py:51-89). pred/target (B,1,H,W), rgb (B,3,H,W).
# ---------------------------------------------------------------------------

def _t_scale_invariant(pred, target):
    d = torch.log(pred + EPS) - torch.log(target + EPS)
    n = d[0].numel()
    t1 = torch.sum(d**2, dim=[1, 2, 3]) / n
    t2 = torch.sum(d, dim=[1, 2, 3]) ** 2 / n**2
    return torch.mean(t1 - t2)


def _t_silog(pred, target, variance_focus=0.85):
    mask = target > 0
    d = torch.log(pred[mask] + EPS) - torch.log(target[mask] + EPS)
    return torch.mean(d**2) - variance_focus * torch.mean(d) ** 2


def _t_gradient(pred, target):
    pdx = torch.abs(pred[..., :-1] - pred[..., 1:])
    pdy = torch.abs(pred[..., :-1, :] - pred[..., 1:, :])
    tdx = torch.abs(target[..., :-1] - target[..., 1:])
    tdy = torch.abs(target[..., :-1, :] - target[..., 1:, :])
    return torch.mean(torch.abs(pdx - tdx)) + torch.mean(torch.abs(pdy - tdy))


def _t_edge_aware(pred, target, rgb, beta):
    rdx = TF.pad(torch.abs(rgb[..., :-1] - rgb[..., 1:]), (0, 1, 0, 0))
    rdy = TF.pad(torch.abs(rgb[..., :-1, :] - rgb[..., 1:, :]), (0, 0, 0, 1))
    mag = torch.sqrt(
        rdx.pow(2).mean(1, keepdim=True) + rdy.pow(2).mean(1, keepdim=True)
    )
    mag = (mag - mag.min()) / (mag.max() - mag.min() + 1e-6)
    pdx = TF.pad(torch.abs(pred[..., :-1] - pred[..., 1:]), (0, 1, 0, 0))
    pdy = TF.pad(torch.abs(pred[..., :-1, :] - pred[..., 1:, :]), (0, 0, 0, 1))
    tdx = TF.pad(torch.abs(target[..., :-1] - target[..., 1:]), (0, 1, 0, 0))
    tdy = TF.pad(torch.abs(target[..., :-1, :] - target[..., 1:, :]), (0, 0, 0, 1))
    return beta * (
        torch.mean(mag * torch.abs(pdx - tdx)) + torch.mean(mag * torch.abs(pdy - tdy))
    )


ALPHAS = {"si": 1.0, "silog": 0.3, "vf": 0.85, "grad": 0.2, "edge": 0.1}


def _t_combined(pred, target, rgb):
    return (
        _t_scale_invariant(pred, target) * ALPHAS["si"]
        + _t_silog(pred, target, ALPHAS["vf"]) * ALPHAS["silog"]
        + _t_gradient(pred, target) * ALPHAS["grad"]
        + _t_edge_aware(pred, target, rgb, beta=ALPHAS["edge"])
    )


# ---------------------------------------------------------------------------
# Torch-side eval-protocol metrics (src/evaluation.py:143-176, util.py:129-219)
# ---------------------------------------------------------------------------

def _t_eval_metrics(pred, target, base=1.05, n_delta=3):
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    t = target.reshape(b, -1)
    d = torch.log(p + EPS) - torch.log(t + EPS)
    n = d.shape[1]
    si = torch.mean(torch.sqrt(torch.sum(d**2, 1) / n - torch.sum(d, 1) ** 2 / n**2))
    rel = torch.mean(torch.abs(t - p) / (t + EPS))
    out = {"si_rmse": si.item(), "abs_rel": rel.item()}
    scale = torch.exp(torch.mean(torch.log(t + EPS) - torch.log(p + EPS), 1, keepdim=True))
    aligned = p * scale
    ratio = torch.maximum(aligned / t, t / aligned)
    for j in range(1, n_delta + 1):
        out[f"delta_{j}"] = torch.mean((ratio < base**j).float(), 1).mean().item()
    return out


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _cfg(size, lr=1e-4, wd=1e-4):
    cfg = config_lib.defaults()
    cfg.framework.input_size = list(size)
    cfg.framework.native_size = list(size)
    cfg.framework.compute_dtype = "float32"
    cfg.framework.learning_rate = lr
    cfg.framework.weight_decay = wd
    cfg.augmentation = False
    lf = cfg.model.loss_function
    lf.si_loss_alpha = ALPHAS["si"]
    lf.silog_loss.alpha = ALPHAS["silog"]
    lf.silog_loss.variance_focus = ALPHAS["vf"]
    lf.grad_loss_alpha = ALPHAS["grad"]
    lf.edge_loss_alpha = ALPHAS["edge"]
    return cfg


def _make_batches(size, batch, k, seed):
    r = np.random.default_rng(seed)
    return [
        (
            r.integers(0, 255, (batch, *size, 3)).astype(np.uint8),
            r.uniform(0.5, 5.0, (batch, *size)).astype(np.float32),
        )
        for _ in range(k)
    ]


def _import_params(tmodel, model, size, key_map):
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), train=False
    )
    sd = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}
    params, stats, report = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}), key_map
    )
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    return params, stats


def _run_parity(model, tmodel, key_map, size, steps, batch, loss_rtol,
                metric_rtol=2e-3, lr=1e-4, wd=1e-4):
    cfg = _cfg(size, lr=lr, wd=wd)
    batches = _make_batches(size, batch, steps, seed=11)
    pipeline = T.make_train_pipeline(False, size)
    root_key = jax.random.key(123)
    step_keys = [jax.random.fold_in(root_key, i) for i in range(steps)]

    # ---- JAX side ----
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), cfg, None
    )
    params0, stats0 = _import_params(tmodel, model, size, key_map)
    state = state.replace(
        params=params0,
        batch_stats=stats0,
        opt_state=state.tx.init(params0),
    )
    init_flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(jax.device_get(params0)).items()
    }
    train_step = make_train_step(model, cfg)
    jax_losses = []
    torch_inputs = []  # identical post-pipeline tensors for the torch loop
    for (rgb_u8, depth_raw), key in zip(batches, step_keys):
        rgb, depth = pipeline(key, jnp.asarray(rgb_u8), jnp.asarray(depth_raw))
        torch_inputs.append((np.asarray(rgb), np.asarray(depth)))
        state, metrics = train_step(
            state, key, jnp.asarray(rgb_u8), jnp.asarray(depth_raw)
        )
        jax_losses.append(float(jax.device_get(metrics["loss"])))

    # ---- torch side ----
    tmodel.train()
    opt = torch.optim.AdamW(
        [p for p in tmodel.parameters() if p.requires_grad],
        lr=lr, weight_decay=wd, betas=(0.9, 0.999), eps=1e-8,
    )
    torch_losses = []
    for rgb, depth in torch_inputs:
        x = torch.from_numpy(np.ascontiguousarray(rgb.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(np.ascontiguousarray(depth)).unsqueeze(1)
        opt.zero_grad()
        pred = tmodel(x)
        if pred.dim() == 4:  # TorchSimpleUNet keeps the channel dim
            pred = pred.squeeze(1)
        pred = pred.unsqueeze(1)
        loss = _t_combined(pred, y, x)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    # 1. loss trajectories
    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=loss_rtol,
        err_msg=f"loss trajectories diverged\njax:   {jax_losses}\ntorch: {torch_losses}",
    )

    # 2. global parameter-delta direction (coarse; see module docstring for
    # why per-leaf equality is not assertable under Adam). A wrong lr scale,
    # flipped update sign, or a mis-applied frozen mask all collapse the
    # cosine or blow up the relative norm; the exact eps/decay semantics are
    # pinned by test_adamw_semantics_match_torch_exactly instead.
    final_t, _ = _import_params(tmodel, model, size, key_map)
    final_t_flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(final_t).items()
    }
    final_j_flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(jax.device_get(state.params)).items()
    }
    for name, p0 in init_flat.items():
        dt = np.linalg.norm(final_t_flat[name] - p0)
        if dt < 1e-12:
            # untouched leaf in torch (e.g. frozen) must be untouched here too
            assert np.linalg.norm(final_j_flat[name] - p0) < 1e-10, (
                f"{name} moved only in JAX"
            )
    dj_all = np.concatenate(
        [(final_j_flat[n] - p).ravel() for n, p in init_flat.items()]
    )
    dt_all = np.concatenate(
        [(final_t_flat[n] - p).ravel() for n, p in init_flat.items()]
    )
    cos = float(dj_all @ dt_all / (np.linalg.norm(dj_all) * np.linalg.norm(dt_all)))
    norm_ratio = float(np.linalg.norm(dj_all) / np.linalg.norm(dt_all))
    assert cos > 0.8, f"param-delta directions diverged: cosine {cos:.4f}"
    assert 0.8 < norm_ratio < 1.25, f"param-delta magnitude off: ratio {norm_ratio:.4f}"

    # 3. final eval-protocol metrics on a held-out batch
    rgb_u8_e, depth_e = _make_batches(size, batch, 1, seed=99)[0]
    got = evaluate(
        model, cfg, state, [{"rgb": rgb_u8_e, "depth": depth_e}], n_samples=None
    )
    rgb_e, depth_r = T.preprocess_eval(
        jnp.asarray(rgb_u8_e), jnp.asarray(depth_e), input_size=size
    )
    tmodel.eval()
    with torch.no_grad():
        pred_t = tmodel(
            torch.from_numpy(np.ascontiguousarray(np.asarray(rgb_e).transpose(0, 3, 1, 2)))
        )
    if pred_t.dim() == 4:
        pred_t = pred_t.squeeze(1)
    want = _t_eval_metrics(pred_t, torch.from_numpy(np.asarray(depth_r)))
    for k, v in want.items():
        np.testing.assert_allclose(
            got[k], v, rtol=metric_rtol, atol=2e-4, err_msg=f"metric {k}"
        )
    return jax_losses, torch_losses


def test_adamw_semantics_match_torch_exactly():
    """The production optimizer (train/trainer.py::make_optimizer — the AdamW
    recipe of src/main.py:26-28,678) against torch.optim.AdamW under
    BIT-IDENTICAL synthetic gradients for 10 steps. No model, no fp32 chaos:
    this deterministically pins the update rule itself — bias correction, eps
    placement (denominator sqrt(v_hat)+eps), and DECOUPLED weight decay
    (p -= lr*wd*p, not decay-inside-gradient) — which the end-to-end runs
    above cannot distinguish from noise."""
    from mde_tpu.train.trainer import make_optimizer

    cfg = _cfg((32, 48))
    rng = np.random.default_rng(5)
    # weights at mixed magnitudes so wd placement errors change the answer
    p_np = {
        "w": (rng.standard_normal((16, 8)) * 2.0).astype(np.float32),
        "b": (rng.standard_normal((8,)) * 0.01).astype(np.float32),
    }
    grads = [
        {
            "w": rng.standard_normal((16, 8)).astype(np.float32),
            "b": rng.standard_normal((8,)).astype(np.float32),
        }
        for _ in range(10)
    ]

    tx = make_optimizer(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, p_np)
    opt_state = tx.init(params)

    t_params = {k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in p_np.items()}
    t_opt = torch.optim.AdamW(
        t_params.values(), lr=float(cfg.framework.learning_rate),
        weight_decay=float(cfg.framework.weight_decay),
        betas=(0.9, 0.999), eps=1e-8,
    )

    for g in grads:
        import optax

        updates, opt_state = tx.update(
            jax.tree_util.tree_map(jnp.asarray, g), opt_state, params
        )
        params = optax.apply_updates(params, updates)

        t_opt.zero_grad()
        for k in t_params:
            t_params[k].grad = torch.from_numpy(g[k].copy())
        t_opt.step()
        for k in t_params:
            np.testing.assert_allclose(
                np.asarray(params[k]), t_params[k].detach().numpy(),
                rtol=1e-6, atol=1e-7, err_msg=f"leaf {k} diverged",
            )


def test_frozen_subtree_masking_matches_torch_requires_grad():
    """make_optimizer's multi_transform partition (the JAX equivalent of the
    reference's requires_grad=False DINOv2 freeze, midas_semantics.py:169-172)
    under identical synthetic gradients: frozen leaves must stay BIT-identical
    (in particular weight decay must not touch them — a plain gradient mask
    would get that wrong), trainable leaves must match torch exactly where
    torch simply omits the frozen tensors from the optimizer."""
    from mde_tpu.train.trainer import make_optimizer

    cfg = _cfg((32, 48))
    rng = np.random.default_rng(6)
    p_np = {
        "dinov2": {"w": rng.standard_normal((8, 8)).astype(np.float32)},
        "head": {"w": rng.standard_normal((8, 4)).astype(np.float32)},
    }
    tx = make_optimizer(cfg, p_np)
    params = jax.tree_util.tree_map(jnp.asarray, p_np)
    opt_state = tx.init(params)

    t_head = torch.nn.Parameter(torch.from_numpy(p_np["head"]["w"].copy()))
    t_opt = torch.optim.AdamW(
        [t_head], lr=float(cfg.framework.learning_rate),
        weight_decay=float(cfg.framework.weight_decay),
        betas=(0.9, 0.999), eps=1e-8,
    )

    import optax

    for i in range(5):
        g = {
            "dinov2": {"w": rng.standard_normal((8, 8)).astype(np.float32)},
            "head": {"w": rng.standard_normal((8, 4)).astype(np.float32)},
        }
        updates, opt_state = tx.update(
            jax.tree_util.tree_map(jnp.asarray, g), opt_state, params
        )
        params = optax.apply_updates(params, updates)
        t_opt.zero_grad()
        t_head.grad = torch.from_numpy(g["head"]["w"].copy())
        t_opt.step()

    np.testing.assert_array_equal(
        np.asarray(params["dinov2"]["w"]), p_np["dinov2"]["w"],
        err_msg="frozen subtree moved (wd leak or mask failure)",
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["w"]), t_head.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )


def test_simple_unet_training_dynamics_parity():
    torch.manual_seed(0)
    tmodel = TorchSimpleUNet()
    model = SimpleUNet()
    jl, tl = _run_parity(
        model, tmodel, map_simple_unet_key,
        size=(32, 48), steps=25, batch=4, loss_rtol=2e-3,
    )
    # the run must actually train (loss moves), or the comparison is vacuous
    assert jl[-1] != pytest.approx(jl[0], rel=1e-3)


def _build_flagship_torch(seed=7):
    torch.manual_seed(seed)
    tmodel = MidasNetSemanticsTorch(features=64, dinov2_image_size=(28, 42))
    with torch.no_grad():
        # Non-trivial frozen branch (zeros would make the dino path vacuous
        # and hide wd-leak bugs on it).
        torch.nn.init.normal_(tmodel.dinov2.pos_embed, std=0.02)
        torch.nn.init.normal_(tmodel.dinov2.cls_token, std=0.02)
        for blk in tmodel.dinov2.blocks:
            blk.ls1.gamma.uniform_(0.2, 0.8)
            blk.ls2.gamma.uniform_(0.2, 0.8)
        randomize_running_stats(tmodel)
        # Same ReLU-cliff shift as the MidasNetSmall run (see that test):
        # start the depth head comfortably positive so the comparison tests
        # the smooth part of the loss surface.
        tmodel.depth_head[1].bias.add_(2.0)
    return tmodel


def test_flagship_training_dynamics_parity_step_synced():
    """The FLAGSHIP (MidasNetSemantics) cross-framework training check, in
    STEP-SYNCED form: torch drives the trajectory; before every torch
    optimizer step the current torch params+stats are re-imported into JAX
    and the loss and full GRADIENT TREES are compared at identical params.

    Why not the free-running trajectory form the other models use: the
    flagship's gradient at this random init is violently ill-conditioned —
    measured 2026-08-20 (benchmarks/diag_flagship_grad_parity.py): a 1e-6
    RELATIVE param perturbation moves the JAX gradient by 17% rel-L2
    (jax-vs-jax), i.e. fp32 reduction-order noise between any two frameworks
    amplifies through the encoder's ReLU6 kinks to percent-level gradient
    deltas and double-digit loss divergence within 3 free-running steps (a
    torch-vs-torch control with a 1e-6 init perturbation diverges the same
    way). The measured cross-framework gradient delta at IDENTICAL params is
    1.3e-2–9.2e-2 — an order of magnitude BELOW that conditioning floor, so
    the backwards agree as well as the loss surface permits. The thresholds
    here (global 0.15, per-subtree 0.3) sit above the measured noise band and
    far below the O(1) corruption a real backward bug produces (wrong VJP,
    mis-masked subtree, transposed-conv error).

    Beyond the gradient check this pins: the frozen-DINOv2 partition on the
    real param tree (one live train_step; optax set_to_zero must leave the
    subtree BIT-identical — decoupled wd must not touch it), and the final
    eval-protocol metrics at the torch trajectory's endpoint (deterministic:
    eval mode at imported params, no chaos).
    """
    tmodel = _build_flagship_torch()
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    size, steps, batch = (64, 96), 6, 2
    cfg = _cfg(size)

    batches = _make_batches(size, batch, steps, seed=11)
    pipeline = T.make_train_pipeline(False, size)
    root_key = jax.random.key(123)
    inputs = []
    for i, (rgb_u8, depth_raw) in enumerate(batches):
        rgb, depth = pipeline(
            jax.random.fold_in(root_key, i), jnp.asarray(rgb_u8), jnp.asarray(depth_raw)
        )
        inputs.append((np.asarray(rgb), np.asarray(depth)))

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), train=False
    )
    params_t = variables["params"]
    stats_t = variables.get("batch_stats", {})

    from mde_tpu.losses import combined_loss

    def loss_fn(params, batch_stats, rgb, depth):
        pred, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            rgb, train=True, mutable=["batch_stats"],
        )
        total, _ = combined_loss(pred.astype(jnp.float32), depth, cfg, rgb=rgb)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def _import(sd_like):
        p, s, report = import_state_dict(sd_like, params_t, stats_t, map_midas_semantics_key)
        assert not report["shape_mismatch"], report["shape_mismatch"][:5]
        return p, s

    def _flat64(tree):
        return {
            "/".join(str(x) for x in k): np.asarray(v, np.float64)
            for k, v in traverse_util.flatten_dict(jax.device_get(tree)).items()
        }

    opt = torch.optim.AdamW(
        [p for p in tmodel.parameters() if p.requires_grad],
        lr=1e-4, weight_decay=1e-4, betas=(0.9, 0.999), eps=1e-8,
    )
    tmodel.train()
    params0 = None

    for step_i, (rgb, depth) in enumerate(inputs):
        sd = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}
        params, stats = _import(sd)
        if params0 is None:
            params0 = params
        loss_j, g_j = grad_fn(params, stats, jnp.asarray(rgb), jnp.asarray(depth))

        x = torch.from_numpy(np.ascontiguousarray(rgb.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(np.ascontiguousarray(depth.copy())).unsqueeze(1)
        opt.zero_grad()
        loss_t = _t_combined(tmodel(x).unsqueeze(1), y, x)
        loss_t.backward()

        # loss parity at identical params: forward + combined loss
        np.testing.assert_allclose(
            float(loss_j), loss_t.item(), rtol=1e-3,
            err_msg=f"step {step_i}: loss diverged at identical params",
        )

        # gradient-tree parity: torch grads -> flax layout via the SAME
        # import map (the conversions are shape transposes, valid on grads)
        gsd = {
            k: (np.asarray(p.grad.detach().numpy()) if p.grad is not None
                else np.zeros(tuple(p.shape), np.float32))
            for k, p in tmodel.named_parameters()
        }
        gsd.update({
            k: np.zeros(tuple(b.shape), np.float32)
            for k, b in tmodel.named_buffers()
        })
        zero_t = jax.tree_util.tree_map(jnp.zeros_like, params_t)
        g_t, _, _ = import_state_dict(gsd, zero_t, stats_t, map_midas_semantics_key)

        fj, ft = _flat64(g_j), _flat64(g_t)
        # exact top-level-key match: dinov2 is the frozen backbone;
        # dinov2_head is TRAINABLE and must stay in the comparison
        keys = [k for k in sorted(fj) if k.split("/", 1)[0] != "dinov2"]
        aj = np.concatenate([fj[k].ravel() for k in keys])
        at = np.concatenate([ft[k].ravel() for k in keys])
        gnorm = np.linalg.norm(at)
        rel = np.linalg.norm(aj - at) / max(gnorm, 1e-12)
        assert rel < 0.15, f"step {step_i}: global grad rel-L2 {rel:.3e}"
        tops: dict[str, list] = {}
        for k in keys:
            tops.setdefault(k.split("/", 1)[0], []).append(k)
        for tname, ks in tops.items():
            dv = np.concatenate([(fj[k] - ft[k]).ravel() for k in ks])
            tv = np.concatenate([ft[k].ravel() for k in ks])
            # denominator floored at 1% of global norm so near-zero-gradient
            # subtrees can't false-flag (commit 6611fb2's forward-sweep fix)
            sub_rel = np.linalg.norm(dv) / max(np.linalg.norm(tv), 1e-2 * gnorm)
            assert sub_rel < 0.3, (
                f"step {step_i}: subtree {tname} grad rel-L2 {sub_rel:.3e}"
            )

        opt.step()

    # ---- frozen-partition check on the real tree: one live train_step ----
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), cfg, None
    )
    stats0 = _import(
        {k: np.asarray(v.detach().numpy()) for k, v in _build_flagship_torch().state_dict().items()}
    )[1]
    state = state.replace(
        params=params0, batch_stats=stats0, opt_state=state.tx.init(params0)
    )
    train_step = make_train_step(model, cfg)
    rgb_u8, depth_raw = batches[0]
    state2, _ = train_step(
        state, jax.random.fold_in(root_key, 0), jnp.asarray(rgb_u8), jnp.asarray(depth_raw)
    )
    f0 = _flat64(params0)
    f2 = _flat64(state2.params)
    moved = sum(
        not np.array_equal(f0[k], f2[k])
        for k in f0 if k.split("/", 1)[0] == "dinov2"
    )
    assert moved == 0, f"{moved} frozen dinov2 leaves moved under the live step"
    assert any(
        not np.array_equal(f0[k], f2[k])
        for k in f0 if k.split("/", 1)[0] != "dinov2"
    ), "no trainable leaf moved — the step is vacuous"

    # ---- eval-protocol metric parity at the torch trajectory endpoint ----
    params_f, stats_f = _import(
        {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}
    )
    state_f = state.replace(params=params_f, batch_stats=stats_f)
    rgb_u8_e, depth_e = _make_batches(size, batch, 1, seed=99)[0]
    got = evaluate(
        model, cfg, state_f, [{"rgb": rgb_u8_e, "depth": depth_e}], n_samples=None
    )
    rgb_e, depth_r = T.preprocess_eval(
        jnp.asarray(rgb_u8_e), jnp.asarray(depth_e), input_size=size
    )
    tmodel.eval()
    with torch.no_grad():
        pred_t = tmodel(
            torch.from_numpy(np.ascontiguousarray(np.asarray(rgb_e).transpose(0, 3, 1, 2)))
        )
    want = _t_eval_metrics(pred_t, torch.from_numpy(np.asarray(depth_r)))
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=5e-3, atol=2e-4, err_msg=f"metric {k}")


def test_flagship_free_running_smoke():
    """Short free-running sanity on the flagship train loop (the step-synced
    test above is the real parity check; per its docstring a tight
    free-running trajectory assertion is unsound for this model at random
    init). Asserts the jitted loop runs, losses are finite, the FIRST step's
    loss matches torch tightly (pre-chaos), and the loss decreases overall."""
    tmodel = _build_flagship_torch()
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    size, steps, batch = (64, 96), 3, 2
    cfg = _cfg(size)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, *size, 3), jnp.float32), cfg, None
    )
    params0, stats0 = _import_params(tmodel, model, size, map_midas_semantics_key)
    state = state.replace(
        params=params0, batch_stats=stats0, opt_state=state.tx.init(params0)
    )
    train_step = make_train_step(model, cfg)
    batches = _make_batches(size, batch, steps, seed=11)
    pipeline = T.make_train_pipeline(False, size)
    root_key = jax.random.key(123)
    losses = []
    for i, (rgb_u8, depth_raw) in enumerate(batches):
        key = jax.random.fold_in(root_key, i)
        state, metrics = train_step(state, key, jnp.asarray(rgb_u8), jnp.asarray(depth_raw))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert np.all(np.isfinite(losses)), losses

    tmodel.train()
    rgb, depth = pipeline(
        jax.random.fold_in(root_key, 0), jnp.asarray(batches[0][0]), jnp.asarray(batches[0][1])
    )
    x = torch.from_numpy(np.ascontiguousarray(np.asarray(rgb).transpose(0, 3, 1, 2)))
    y = torch.from_numpy(np.ascontiguousarray(np.asarray(depth))).unsqueeze(1)
    with torch.no_grad():
        loss_t = _t_combined(tmodel(x).unsqueeze(1), y, x)
    np.testing.assert_allclose(losses[0], loss_t.item(), rtol=1e-3)
    assert losses[-1] < losses[0], losses


def test_midas_small_training_dynamics_parity():
    torch.manual_seed(3)
    tmodel = MidasNetSmallTorch()
    # Shift the head bias so the ReLU'd depth output starts comfortably
    # positive. At random init most pixels sit AT the ReLU cliff, where the
    # SI loss gradient is ~1/(pred+1e-6) ≈ 1e6: cross-framework fp32 noise
    # flips pixels across the cliff and gradients differ at the 1e-2 level
    # while the LOSS still agrees at 5e-7 (measured) — trajectories then
    # diverge violently in both frameworks' own reruns too. The shifted init
    # tests the same model dynamics on the smooth part of the loss, which is
    # where real training lives after the first epochs.
    with torch.no_grad():
        tmodel.scratch.output_conv[4].bias.add_(2.0)
    model = MidasNetSmall()
    _run_parity(
        model, tmodel, map_midas_small_key,
        size=(64, 96), steps=12, batch=2, loss_rtol=2e-3,
    )
