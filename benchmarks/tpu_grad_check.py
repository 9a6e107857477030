"""TPU-vs-CPU numeric cross-check of the TRAINING BACKWARD.

`tpu_numeric_sweep.py` guards every family's *forward* against the documented
axon miscompile class (CLAUDE.md), but until round 4 nothing golden-checked
the backward lowering on the chip: the gradients of the combined loss through
the train-mode forward (BN batch stats, merged residual entry, the Pallas
windowed-attention custom VJP — which only runs on TPU, so this is also the
only chip-side check that the Pallas backward matches the XLA backward that
CPU uses via `lax.platform_dependent`).

What is compared, per case, CPU golden vs TPU:
  - the combined-loss scalar (relative error),
  - the gradient tree: GLOBAL rel-L2 over the concatenated gradient vector,
    plus per-top-level-subtree rel-L2 to localize any failure.

What is deliberately NOT compared: post-AdamW parameter deltas. At step 1 the
Adam update is +-lr*sign(g) per coordinate, so coordinates with near-zero true
gradient take full-size steps whose sign is decided by backend-dependent fp32
reduction noise (measured while building tests/test_train_parity.py — loss
agrees at 3e-7 while those deltas fully diverge). The gradient comparison is
the informative one; it is what the optimizer consumes.

Precision: the TPU side runs under jax.default_matmul_precision("float32").
Rationale (measured in benchmarks/diag_flagship_grad_parity.py): these
ReLU-dense models at random init amplify forward noise into the gradient by
~5 orders of magnitude (a 1e-6 relative param perturbation moves the flagship
gradient 17% rel-L2 — kink chaos, activation masks flipping). Under default
bf16 matmul precision the TPU forward carries ~4e-3 relative noise, which the
same amplification turns into O(1) gradient deviation that says nothing about
lowering correctness (the first run of this script measured exactly that:
grad rel-L2 1.27 with a healthy loss). At fp32 precision the remaining noise
is reduction-order fp32 (~1e-7 base), amplified to ~1e-2 — the same scale the
CPU torch-vs-jax comparison lands at. The miscompile class this guards
(slice/reshape/fusion lowering faults, CLAUDE.md) is precision-independent:
a real fault corrupts at O(1) regardless of matmul algorithm.

Loss-point placement: log/inverse-based losses need positive predictions.
non_negative=True models (flagship) get their depth-head bias shifted +2 so
the ReLU output is smooth and positive (same shift as test_train_parity.py);
non_negative=False models (DPT, midas_small) emit near-zero or negative maps
at random init — their prediction is offset +2.5 INSIDE the loss (gradient
flows through every model param identically; only the loss-surface point
moves off the 1/(pred+1e-6) cliff and out of log(<=0) NaN territory).

Thresholds: FAIL at global rel-L2 > 1e-1 — a real miscompile corrupts at
O(1), healthy fp32-precision runs sit at the ~1e-2 conditioning floor.

Run from the repo root: JAX_PLATFORMS=axon,cpu python benchmarks/tpu_grad_check.py
Optional argv: case names to rerun selectively.

RESULT (2026-08-20, v5e via axon, fp32 matmul precision both sides):
  flagship_semantics      loss_rel 1.48e-06  grad_rel_l2 4.61e-02  worst cross_attention=2.44e-01  OK
  flagship_unmerged_entry loss_rel 2.96e-06  grad_rel_l2 3.96e-02  worst cross_attention=2.54e-01  OK
  midas_small_lb_dgr      loss_rel 5.53e-06  grad_rel_l2 1.24e-02  worst pretrained=1.24e-02       OK
  flagship_lb             loss_rel 2.55e-07  grad_rel_l2 2.95e-02  worst midas=2.95e-02            OK
  dpt_vitb16              loss_rel 4.87e-06  grad_rel_l2 1.65e-04  worst head_conv4=3.20e-04       OK
The cross_attention subtree (2.5e-1, identical merged/unmerged) was isolated
at op level the same day: CPU-vs-TPU grads of windowed_cross_attention alone
(56x72/ws16, fp32 precision) are dq 4.4e-3 / dk 3.2e-3 / dv 1.8e-3 — the
Pallas-forward + recomputed-XLA-backward path is clean; the subtree number is
conditioning amplification through softmax sharpening + downstream kinks, not
a VJP fault. A default-precision control run (first attempt, 2026-08-20)
measured grad rel-L2 1.27 with loss_rel 1e-3 — confirming the Precision
paragraph: bf16 forward noise through kink chaos swamps lowering error.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mde_tpu.core import compilation_cache

compilation_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from mde_tpu.core import config as config_lib
from mde_tpu.losses import combined_loss


def _shift_depth_head_bias(params, path=("depth_head_1", "Conv_0", "bias"), delta=2.0):
    """Start the ReLU'd depth head comfortably positive. At random init most
    output pixels sit AT the ReLU cliff, where the SI backward carries
    1/(pred+1e-6) ~ 1e6 factors maximally sensitive to TPU bf16 forward noise
    — the check would then measure cliff-amplified noise, not lowering error
    (same shift as tests/test_train_parity.py's dynamics runs)."""
    node = params
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = node[path[-1]] + delta
    return params


def cases():
    from mde_tpu.models.midas_semantics import MidasNetSemantics
    from mde_tpu.models.midas_small import MidasNetSmall

    nn = dict(non_negative=False)
    # (name, build, input_shape, param_prep, pred_offset_in_loss)
    return [
        # Flagship default lowering: merged residual entry + the Pallas
        # windowed-attention VJP on the TPU side. non_negative stays True (the
        # production config) with the depth-head bias shifted off the ReLU
        # cliff so the comparison exercises the smooth loss surface.
        ("flagship_semantics",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42)), (2, 64, 96, 3),
         _shift_depth_head_bias, 0.0),
        # The unmerged-entry flagship isolates the merged-residual-entry
        # lowering's backward (the round-3 default-ON flip) from the rest.
        ("flagship_unmerged_entry",
         lambda: MidasNetSemantics(
             dinov2_image_size=(28, 42), merge_residual_entry=False),
         (2, 64, 96, 3), _shift_depth_head_bias, 0.0),
        # The LocalBins/DGR tail — the slice/reshape/broadcast-heavy lowering
        # class (localbins_net.py:69-74, localbins_layers.py:171-361), now
        # also exercised through its backward. Random-init output can sit near
        # zero -> loss-side offset (docstring, Loss-point placement).
        ("midas_small_lb_dgr",
         lambda: MidasNetSmall(features=64, use_lb=True, use_dgr=True, **nn),
         (2, 64, 96, 3), None, 2.5),
        ("flagship_lb",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42), use_lb=True),
         (2, 64, 96, 3), _shift_depth_head_bias, 0.0),
        # One DPT family representative (VERDICT r4 item 2): hook-table
        # reassembly + pos-embed interpolation under the backward. Random-init
        # output is entirely negative -> loss-side offset avoids log(<=0) NaN.
        ("dpt_vitb16", _dpt_case, (2, 64, 96, 3), None, 2.5),
    ]


def _dpt_case():
    from mde_tpu.models.dpt import DPTDepthModel

    return DPTDepthModel(backbone="vitb16_384", features=64, non_negative=False)


def _grad_fn(model, cfg, pred_offset=0.0):
    def loss_fn(params, batch_stats, rgb, depth):
        # fp32 end-to-end with matmuls forced to float32 precision on both
        # backends (docstring, Precision): the check measures LOWERING error,
        # not bf16-noise-through-ReLU-kink chaos.
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        with jax.default_matmul_precision("float32"):
            out = model.apply(variables, rgb, train=True, mutable=["batch_stats"])
            pred, _ = out
            total, _ = combined_loss(
                pred.astype(jnp.float32) + pred_offset, depth, cfg, rgb=rgb
            )
        return total

    return jax.jit(jax.value_and_grad(loss_fn))


def _flat(tree):
    return {
        "/".join(str(p) for p in k): np.asarray(v, np.float64)
        for k, v in traverse_util.flatten_dict(jax.device_get(tree)).items()
    }


def main():
    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    assert accel.platform != "cpu", "run with a TPU attached"
    rng = np.random.default_rng(0)
    failures = []
    only = set(sys.argv[1:])

    for name, build, shape, prep, pred_offset in cases():
        if only and name not in only:
            continue
        try:
            cfg = config_lib.defaults()
            cfg.framework.input_size = list(shape[1:3])
            with jax.default_device(cpu):
                model = build()
                rgb = jnp.asarray(rng.uniform(-1.5, 1.5, shape).astype(np.float32))
                depth = jnp.asarray(
                    rng.uniform(0.5, 5.0, shape[:3]).astype(np.float32)
                )
                variables = model.init(jax.random.key(0), rgb, train=False)
                params = variables["params"]
                if prep is not None:
                    params = prep(jax.device_get(variables["params"]))
                stats = variables.get("batch_stats", {})
                fn = _grad_fn(model, cfg, pred_offset)
                loss_cpu, g_cpu = fn(params, stats, rgb, depth)
                loss_cpu = float(loss_cpu)
                gc = _flat(g_cpu)

            put = lambda t: jax.device_put(t, accel)
            loss_tpu, g_tpu = _grad_fn(model, cfg, pred_offset)(
                put(params), put(stats), put(rgb), put(depth)
            )
            loss_tpu = float(loss_tpu)
            gt = _flat(g_tpu)

            all_c = np.concatenate([gc[k].ravel() for k in sorted(gc)])
            all_t = np.concatenate([gt[k].ravel() for k in sorted(gc)])
            rel_l2 = float(
                np.linalg.norm(all_t - all_c) / max(np.linalg.norm(all_c), 1e-12)
            )
            loss_rel = abs(loss_tpu - loss_cpu) / max(abs(loss_cpu), 1e-12)

            # Per-top-subtree localization. The denominator is floored at 1%
            # of the GLOBAL gradient norm (not a bare 1e-12): a subtree whose
            # true gradients are near zero (e.g. LocalBins heads at random
            # init) would otherwise dominate worst_subtree with noise that is
            # insignificant at gradient scale — the same near-zero-denominator
            # false-flag class the forward sweep fixed in commit 6611fb2.
            global_norm = np.linalg.norm(all_c)
            tops = {}
            for k in gc:
                tops.setdefault(k.split("/", 1)[0], []).append(k)
            sub = {
                t: float(
                    np.linalg.norm(
                        np.concatenate([(gt[k] - gc[k]).ravel() for k in ks])
                    )
                    / max(
                        np.linalg.norm(np.concatenate([gc[k].ravel() for k in ks])),
                        1e-2 * global_norm,
                        1e-12,
                    )
                )
                for t, ks in tops.items()
            }
            worst_sub = max(sub, key=sub.get)
            status = "OK" if rel_l2 < 1e-1 and loss_rel < 1e-2 else "FAIL"
            if status == "FAIL":
                failures.append(name)
            print(
                f"{name:22s} loss_rel {loss_rel:8.2e}  grad_rel_l2 {rel_l2:8.2e}  "
                f"worst_subtree {worst_sub}={sub[worst_sub]:.2e}  {status}",
                flush=True,
            )
        except Exception as e:
            failures.append(name)
            print(f"{name:22s} ERROR {type(e).__name__}: {e}", flush=True)

    print(f"failures: {failures or 'none'}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
