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

Thresholds: forwards sweep at rel-L2 ~1e-3 under TPU bf16-default-precision
matmuls (fp32 inputs); the backward roughly doubles the accumulation depth and
adds the transposed convs, so FAIL is set at global rel-L2 > 1e-1 — a real
miscompile corrupts at O(1) (the class this exists to catch), healthy runs sit
orders below.

Run from the repo root: JAX_PLATFORMS=axon,cpu python benchmarks/tpu_grad_check.py
Optional argv: case names to rerun selectively.
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


def _shift_depth_head_bias(params, path=("depth_head_1", "bias"), delta=2.0):
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
    return [
        # Flagship default lowering: merged residual entry + the Pallas
        # windowed-attention VJP on the TPU side. non_negative stays True (the
        # production config) with the depth-head bias shifted off the ReLU
        # cliff so the comparison exercises the smooth loss surface.
        ("flagship_semantics",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42)), (2, 64, 96, 3),
         _shift_depth_head_bias),
        # The unmerged-entry flagship isolates the merged-residual-entry
        # lowering's backward (the round-3 default-ON flip) from the rest.
        ("flagship_unmerged_entry",
         lambda: MidasNetSemantics(
             dinov2_image_size=(28, 42), merge_residual_entry=False),
         (2, 64, 96, 3), _shift_depth_head_bias),
        # The LocalBins/DGR tail — the slice/reshape/broadcast-heavy lowering
        # class (localbins_net.py:69-74, localbins_layers.py:171-361), now
        # also exercised through its backward.
        ("midas_small_lb_dgr",
         lambda: MidasNetSmall(features=64, use_lb=True, use_dgr=True, **nn),
         (2, 64, 96, 3), None),
        ("flagship_lb",
         lambda: MidasNetSemantics(dinov2_image_size=(28, 42), use_lb=True),
         (2, 64, 96, 3), _shift_depth_head_bias),
        # One DPT family representative (VERDICT r4 item 2): hook-table
        # reassembly + pos-embed interpolation under the backward.
        ("dpt_vitb16", _dpt_case, (2, 64, 96, 3), None),
    ]


def _dpt_case():
    from mde_tpu.models.dpt import DPTDepthModel

    return DPTDepthModel(backbone="vitb16_384", features=64, non_negative=False)


def _grad_fn(model, cfg):
    def loss_fn(params, batch_stats, rgb, depth):
        # fp32 end-to-end (the production step's CPU form): isolates
        # miscompiles from bf16 compute-dtype noise; TPU matmuls still run
        # bf16 default precision, which the thresholds absorb.
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, rgb, train=True, mutable=["batch_stats"])
        pred, _ = out
        total, _ = combined_loss(pred.astype(jnp.float32), depth, cfg, rgb=rgb)
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

    for name, build, shape, prep in cases():
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
                fn = _grad_fn(model, cfg)
                loss_cpu, g_cpu = fn(params, stats, rgb, depth)
                loss_cpu = float(loss_cpu)
                gc = _flat(g_cpu)

            put = lambda t: jax.device_put(t, accel)
            loss_tpu, g_tpu = _grad_fn(model, cfg)(
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
