"""Diagnostic for the RED flagship training-dynamics parity test (VERDICT r4).

Splits real-gradient-bug from trajectory chaos, per the round-4 verdict's
prescription:

A. STEP-SYNCED gradient comparison: run the torch trajectory as the driver;
   before every torch optimizer step, re-import the torch params+stats into
   JAX through the production map and compare the per-step GRADIENT trees at
   IDENTICAL params (global + per-subtree rel-L2, cross-framework). Identical-
   params gradients are chaos-free: if they match at fp32 tolerance every
   step, the free-running trajectory test was unsound; if they don't, there
   is a real flagship-only gradient bug (suspects: windowed-attention VJP,
   bicubic pos-embed gradient, merged-entry backward, BN stat updates).

B. TORCH-vs-TORCH chaos control: the same flagship, same 8 free-running
   steps, with a 1e-6-relative init perturbation — measures how fast the
   trajectory amplifies infinitesimal differences *within one framework*,
   i.e. the noise floor any cross-framework trajectory assertion must beat.

Run on CPU from the repo root:
  JAX_PLATFORM_NAME=cpu python benchmarks/diag_flagship_grad_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
from flax import traverse_util

import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.data import transforms as T
from mde_tpu.losses import combined_loss
from mde_tpu.models import MidasNetSemantics
from mde_tpu.train.torch_import import import_state_dict, map_midas_semantics_key

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from tests.torch_flagship_ref import MidasNetSemanticsTorch, randomize_running_stats
from tests.test_train_parity import ALPHAS, _cfg, _make_batches, _t_combined

SIZE = (64, 96)
STEPS = 8
BATCH = 2


def build_torch(seed=7):
    torch.manual_seed(seed)
    tmodel = MidasNetSemanticsTorch(features=64, dinov2_image_size=(28, 42))
    with torch.no_grad():
        torch.nn.init.normal_(tmodel.dinov2.pos_embed, std=0.02)
        torch.nn.init.normal_(tmodel.dinov2.cls_token, std=0.02)
        for blk in tmodel.dinov2.blocks:
            blk.ls1.gamma.uniform_(0.2, 0.8)
            blk.ls2.gamma.uniform_(0.2, 0.8)
        randomize_running_stats(tmodel)
        tmodel.depth_head[1].bias.add_(2.0)
    return tmodel


def make_inputs():
    batches = _make_batches(SIZE, BATCH, STEPS, seed=11)
    pipeline = T.make_train_pipeline(False, SIZE)
    root_key = jax.random.key(123)
    out = []
    for i, (rgb_u8, depth_raw) in enumerate(batches):
        key = jax.random.fold_in(root_key, i)
        rgb, depth = pipeline(key, jnp.asarray(rgb_u8), jnp.asarray(depth_raw))
        out.append((np.asarray(rgb), np.asarray(depth)))
    return out


def _flat(tree):
    return {
        "/".join(str(p) for p in k): np.asarray(v, np.float64)
        for k, v in traverse_util.flatten_dict(jax.device_get(tree)).items()
    }


def stage_a():
    print("=== A. step-synced cross-framework gradient comparison ===")
    tmodel = build_torch()
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    cfg = _cfg(SIZE)
    inputs = make_inputs()

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), train=False
    )
    params_t = variables["params"]
    stats_t = variables.get("batch_stats", {})

    def loss_fn(params, batch_stats, rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            rgb, train=True, mutable=["batch_stats"],
        )
        pred, _ = out
        total, _ = combined_loss(pred.astype(jnp.float32), depth, cfg, rgb=rgb)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    opt = torch.optim.AdamW(
        [p for p in tmodel.parameters() if p.requires_grad],
        lr=1e-4, weight_decay=1e-4, betas=(0.9, 0.999), eps=1e-8,
    )
    tmodel.train()

    for step, (rgb, depth) in enumerate(inputs):
        # import CURRENT torch params -> jax
        sd = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}
        params, stats, report = import_state_dict(sd, params_t, stats_t, map_midas_semantics_key)
        assert not report["shape_mismatch"], report["shape_mismatch"][:5]

        loss_j, g_j = grad_fn(params, stats, jnp.asarray(rgb), jnp.asarray(depth))
        loss_j = float(loss_j)

        x = torch.from_numpy(np.ascontiguousarray(rgb.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(np.ascontiguousarray(depth)).unsqueeze(1)
        opt.zero_grad()
        pred = tmodel(x).unsqueeze(1)
        loss_t = _t_combined(pred, y, x)
        loss_t.backward()

        # torch grads -> flax layout via the same import map (zeros elsewhere)
        gsd = {}
        for k, p in tmodel.named_parameters():
            gsd[k] = (
                np.asarray(p.grad.detach().numpy())
                if p.grad is not None
                else np.zeros(tuple(p.shape), np.float32)
            )
        for k, b in tmodel.named_buffers():
            gsd[k] = np.zeros(tuple(b.shape), np.float32)
        zero_t = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), params_t)
        g_t, _, _ = import_state_dict(gsd, zero_t, stats_t, map_midas_semantics_key)

        fj, ft = _flat(g_j), _flat(g_t)
        # exact top-level match: dinov2 is frozen; dinov2_head is trainable
        keys = [k for k in sorted(fj) if k.split("/", 1)[0] != "dinov2"]
        aj = np.concatenate([fj[k].ravel() for k in keys])
        at = np.concatenate([ft[k].ravel() for k in keys])
        rel = np.linalg.norm(aj - at) / max(np.linalg.norm(at), 1e-12)
        gnorm = np.linalg.norm(at)
        tops: dict[str, list] = {}
        for k in keys:
            tops.setdefault(k.split("/", 1)[0], []).append(k)
        sub = {}
        for tname, ks in tops.items():
            dv = np.concatenate([(fj[k] - ft[k]).ravel() for k in ks])
            tv = np.concatenate([ft[k].ravel() for k in ks])
            sub[tname] = np.linalg.norm(dv) / max(np.linalg.norm(tv), 1e-2 * gnorm)
        worst = max(sub, key=sub.get)
        loss_rel = abs(loss_j - loss_t.item()) / abs(loss_t.item())
        print(
            f"step {step}: loss_rel {loss_rel:8.2e}  grad_rel_l2 {rel:8.2e}  "
            f"worst_subtree {worst}={sub[worst]:.2e}"
        )

        opt.step()


def stage_b():
    print("=== B. torch-vs-torch free-running chaos control (1e-6 rel perturbation) ===")
    inputs = make_inputs()

    def run(perturb):
        tmodel = build_torch()
        if perturb:
            g = torch.Generator().manual_seed(99)
            with torch.no_grad():
                for p in tmodel.parameters():
                    if p.requires_grad:
                        p.mul_(1 + 1e-6 * torch.randn(p.shape, generator=g))
        opt = torch.optim.AdamW(
            [p for p in tmodel.parameters() if p.requires_grad],
            lr=1e-4, weight_decay=1e-4, betas=(0.9, 0.999), eps=1e-8,
        )
        tmodel.train()
        losses = []
        for rgb, depth in inputs:
            x = torch.from_numpy(np.ascontiguousarray(rgb.transpose(0, 3, 1, 2)))
            y = torch.from_numpy(np.ascontiguousarray(depth)).unsqueeze(1)
            opt.zero_grad()
            loss = _t_combined(tmodel(x).unsqueeze(1), y, x)
            loss.backward()
            opt.step()
            losses.append(loss.item())
        return losses

    a = run(False)
    b = run(True)
    for i, (la, lb) in enumerate(zip(a, b)):
        print(f"step {i}: base {la:.6f}  perturbed {lb:.6f}  rel {abs(la-lb)/abs(la):8.2e}")


def stage_c():
    """Per-leaf localization + conditioning control at step 0.

    Prints the top leaves by gradient-error norm (relative to the global
    gradient norm), plus a jax-vs-jax control: gradients at params perturbed
    by 1e-6 relative — if the perturbed-jax gradient moves as much as the
    torch one differs, the gradient is ill-conditioned at this init and the
    cross-framework delta is noise amplification, not a backward bug."""
    print("=== C. per-leaf localization + conditioning control (step 0) ===")
    tmodel = build_torch()
    model = MidasNetSemantics(dinov2_image_size=(28, 42))
    cfg = _cfg(SIZE)
    rgb, depth = make_inputs()[0]

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *SIZE, 3), jnp.float32), train=False
    )
    sd = {k: np.asarray(v.detach().numpy()) for k, v in tmodel.state_dict().items()}
    params, stats, _ = import_state_dict(
        sd, variables["params"], variables.get("batch_stats", {}),
        map_midas_semantics_key,
    )

    def loss_fn(p, rgb, depth):
        out = model.apply(
            {"params": p, "batch_stats": stats}, rgb, train=True,
            mutable=["batch_stats"],
        )
        pred, _ = out
        total, _ = combined_loss(pred.astype(jnp.float32), depth, cfg, rgb=rgb)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    _, g_j = grad_fn(params, jnp.asarray(rgb), jnp.asarray(depth))

    # torch gradient
    x = torch.from_numpy(np.ascontiguousarray(rgb.transpose(0, 3, 1, 2)))
    y = torch.from_numpy(np.ascontiguousarray(depth)).unsqueeze(1)
    tmodel.train()
    tmodel.zero_grad()
    loss_t = _t_combined(tmodel(x).unsqueeze(1), y, x)
    loss_t.backward()
    gsd = {}
    for k, p in tmodel.named_parameters():
        gsd[k] = (
            np.asarray(p.grad.detach().numpy())
            if p.grad is not None else np.zeros(tuple(p.shape), np.float32)
        )
    for k, b in tmodel.named_buffers():
        gsd[k] = np.zeros(tuple(b.shape), np.float32)
    zero_t = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), variables["params"])
    g_t, _, _ = import_state_dict(
        gsd, zero_t, variables.get("batch_stats", {}), map_midas_semantics_key
    )

    # jax-vs-jax conditioning control
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = np.random.default_rng(42)
    pert = [
        jnp.asarray(np.asarray(l) * (1 + 1e-6 * rngs.standard_normal(l.shape)))
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l in leaves
    ]
    _, g_p = grad_fn(jax.tree_util.tree_unflatten(treedef, pert),
                     jnp.asarray(rgb), jnp.asarray(depth))

    fj, ft, fp = _flat(g_j), _flat(g_t), _flat(g_p)
    keys = [k for k in sorted(fj) if k.split("/", 1)[0] != "dinov2"]
    gnorm = np.linalg.norm(np.concatenate([ft[k].ravel() for k in keys]))
    cross = np.linalg.norm(
        np.concatenate([(fj[k] - ft[k]).ravel() for k in keys])
    ) / gnorm
    cond = np.linalg.norm(
        np.concatenate([(fj[k] - fp[k]).ravel() for k in keys])
    ) / gnorm
    print(f"cross-framework grad delta / gnorm: {cross:.3e}")
    print(f"jax-vs-jax 1e-6-perturbed delta / gnorm: {cond:.3e}")

    rows = []
    for k in keys:
        err = np.linalg.norm(fj[k] - ft[k])
        rows.append((err / gnorm, np.linalg.norm(ft[k]) / gnorm, k))
    rows.sort(reverse=True)
    print("top 25 leaves by |g_jax - g_torch| / global_norm:")
    for err, mag, k in rows[:25]:
        print(f"  {err:9.3e}  (leaf |g_t|/gnorm {mag:9.3e})  {k}")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"a", "b"}
    if "a" in which:
        stage_a()
    if "b" in which:
        stage_b()
    if "c" in which:
        stage_c()
