"""Training/eval engine: jitted steps + the epoch driver.

Replaces the reference's L5/L6 (src/main.py:91-252 train_model, :254-392
evaluate_model, src/util.py:292-328 generate_test_predictions) with:

- one jit-compiled train step that *contains* the on-device preprocessing
  pipeline, the forward pass, the combined loss, AdamW update and (under a mesh)
  the GSPMD-inserted gradient all-reduce — donated buffers, no host round-trips;
- an epoch driver with the reference's early-stopping / best-checkpoint / resume
  semantics and wandb-schema logging key names;
- an on-device 7-metric evaluation suite and test-prediction generation.

Optimizer: AdamW(lr=1e-4, wd=1e-4, torch default betas/eps) per src/main.py:26-28,678.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from ..data import transforms as T
from ..losses import combined_loss
from ..metrics import evaluation_metrics, full_metric_suite
from ..ops.resize import resize_bilinear
from ..parallel import active_mesh, get_active_mesh, replicate, shard_batch
from .checkpoint import load_checkpoint, save_checkpoint
from .logging import ExperimentLogger


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


FROZEN_SUBTREES = ("dinov2",)


def make_optimizer(cfg, params=None) -> optax.GradientTransformation:
    """AdamW with torch defaults; frozen subtrees get zero updates.

    The reference freezes the DINOv2 backbone with requires_grad=False
    (src/network/midas_semantics.py:169-172). The JAX equivalent is an optax
    partition: parameters under a frozen subtree (top-level key in
    ``FROZEN_SUBTREES``) receive set_to_zero updates — in particular AdamW's
    decoupled weight decay must NOT touch them, which a plain mask on gradients
    would get wrong.
    """
    adamw = optax.adamw(
        learning_rate=cfg.framework.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.framework.weight_decay,
    )
    if params is None or not any(k in params for k in FROZEN_SUBTREES):
        return adamw

    def label(path, _):
        top = path[0]
        key = getattr(top, "key", getattr(top, "name", None))
        return "frozen" if key in FROZEN_SUBTREES else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(model, key, sample_rgb, cfg, mesh=None) -> TrainState:
    # Register (or clear) the mesh for ops that shard_map over it at trace
    # time (the Pallas windowed attention, ops/window_attention.py). Always
    # set, so a previous mesh can't leak into a mesh-less session. Must happen
    # before any step function traces.
    from ..parallel import set_active_mesh

    set_active_mesh(mesh)
    variables = model.init(key, sample_rgb, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    tx = make_optimizer(cfg, params)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        # Tensor parallelism: Megatron-style PartitionSpecs over the 'model'
        # axis (parallel/mesh.py::tp_param_spec). Sharding the params BEFORE
        # tx.init makes the Adam moments (zeros_like trees) inherit the same
        # shardings; the jitted step then runs under GSPMD, which inserts the
        # row-parallel all-reduces itself.
        from ..parallel import shard_params_tp

        params = shard_params_tp(params, mesh)
        batch_stats = replicate(batch_stats, mesh)
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
    if mesh is not None:
        state = state.replace(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=replicate(state.opt_state, mesh),
        )
    return state


def _cast_floating(tree, dtype):
    """Cast floating-point leaves to ``dtype`` (differentiable; ints/bools pass)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _pin_build_mesh(fn):
    """Re-assert the mesh registered at step-BUILD time on every trace of
    ``fn``. Jitted steps read the active-mesh registry when their Python body
    runs — i.e. at TRACE time, which can be long after the step was built; by
    then another ``create_train_state`` (e.g. an eval/baseline state with
    mesh=None) may have swapped or cleared the global, silently changing which
    lowering mesh-dispatched ops pick (ops/window_attention.py shard_map).
    Capturing the mesh when the step builder runs closes that call-ordering
    hazard."""
    mesh = get_active_mesh()

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with active_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def _apply_model(model, params, batch_stats, rgb, train):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        pred, mutated = model.apply(
            variables, rgb, train=True, mutable=["batch_stats"]
        )
        return pred, mutated.get("batch_stats", batch_stats)
    return model.apply(variables, rgb, train=False), batch_stats


def make_train_step(model, cfg, accum_steps: int = 1) -> Callable:
    """Returns jitted fn(state, key, rgb_u8, depth_raw) -> (state, metrics).

    The whole per-step pipeline — uint8 decode-side batch -> resize -> augment ->
    normalize -> forward -> loss -> backward -> AdamW -> BN stat update — is one
    XLA program; the train loop only feeds raw host batches.

    ``accum_steps > 1`` splits the batch into that many microbatches, runs
    forward+backward per microbatch under ``lax.scan`` (one microbatch of
    activations live at a time — the path past compile/memory ceilings, e.g.
    the tunnel compiler's flagship-bs32 HTTP 500, CLAUDE.md), averages the
    gradients and applies ONE optimizer update. Gradients equal the full-batch
    step exactly for per-sample-decomposable losses; BN batch statistics are
    per-microbatch and the running stats see ``accum_steps`` momentum updates
    per step (the standard accumulation semantics).
    """
    pipeline = T.make_train_pipeline(
        bool(cfg.augmentation), cfg.framework.input_size
    )
    compute_dtype = jnp.dtype(cfg.framework.get("compute_dtype", "bfloat16"))
    if compute_dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # bf16 is MXU-native on TPU but software-emulated on the CPU backend
        # (tests, dev); keep CPU in fp32.
        compute_dtype = jnp.dtype(jnp.float32)

    def loss_fn(params, batch_stats, rgb, depth):
        # Mixed precision: master params/optimizer stay fp32; the forward
        # (and thus backward matmuls/convs) run in compute_dtype (bf16 on
        # the MXU). Norm layers compute in the activation dtype with fp32
        # statistics (nn/blocks.py); the loss itself is fp32.
        cast_params = _cast_floating(params, compute_dtype)
        pred, new_stats = _apply_model(
            model, cast_params, batch_stats, rgb.astype(compute_dtype), True
        )
        pred = pred.astype(jnp.float32)
        total, parts = combined_loss(pred, depth, cfg, rgb=rgb)
        return total, (parts, new_stats)

    if accum_steps <= 1:
        @functools.partial(jax.jit, donate_argnums=(0,))
        @_pin_build_mesh
        def step(state: TrainState, key, rgb_u8, depth_raw):
            rgb, depth = pipeline(key, rgb_u8, depth_raw)
            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, rgb, depth)
            state = state.apply_gradients(grads).replace(batch_stats=new_stats)
            return state, {"loss": loss, **parts}

        return step

    @functools.partial(jax.jit, donate_argnums=(0,))
    @_pin_build_mesh
    def step(state: TrainState, key, rgb_u8, depth_raw):
        b = rgb_u8.shape[0]
        assert b % accum_steps == 0, (
            f"batch {b} not divisible by accum_steps {accum_steps}"
        )
        m = b // accum_steps
        rgb_m = rgb_u8.reshape(accum_steps, m, *rgb_u8.shape[1:])
        depth_m = depth_raw.reshape(accum_steps, m, *depth_raw.shape[1:])
        keys = jax.random.split(key, accum_steps)

        def body(carry, xs):
            grads_acc, stats = carry
            k, rgb_u8_i, depth_i = xs
            rgb, depth = pipeline(k, rgb_u8_i, depth_i)
            (loss, (parts, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, rgb, depth)
            if not new_stats:
                # BN-free model: flax returns a plain empty dict, which would
                # break the scan carry's pytree-structure match vs FrozenDict.
                new_stats = stats
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, new_stats), {"loss": loss, **parts}

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads_sum, new_stats), metrics = jax.lax.scan(
            body, (zero_grads, state.batch_stats), (keys, rgb_m, depth_m)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads_sum)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return step


def make_eval_step(model, cfg) -> Callable:
    input_size = tuple(int(s) for s in cfg.framework.input_size)

    @jax.jit
    @_pin_build_mesh
    def step(state: TrainState, rgb_u8, depth_raw):
        rgb, depth = T.preprocess_eval(rgb_u8, depth_raw, input_size=input_size)
        pred, _ = _apply_model(model, state.params, state.batch_stats, rgb, False)
        total, parts = combined_loss(pred, depth, cfg, rgb=rgb)
        return {"loss": total, **parts}

    return step


def make_metric_step(model, cfg) -> Callable:
    """Eval-protocol metrics (src/evaluation.py:143-176) as one device call."""
    input_size = tuple(int(s) for s in cfg.framework.input_size)
    base = float(cfg.framework.eval_base_thres)
    n_delta = int(cfg.framework.eval_n_delta)

    @jax.jit
    @_pin_build_mesh
    def step(state: TrainState, rgb_u8, depth_raw):
        rgb, depth = T.preprocess_eval(rgb_u8, depth_raw, input_size=input_size)
        pred, _ = _apply_model(model, state.params, state.batch_stats, rgb, False)
        return evaluation_metrics(pred, depth, base_thres=base, n_delta=n_delta)

    return step


def make_predict_step(model, cfg) -> Callable:
    """Forward + align-corners resize back to the native 426x560 submission size
    (src/util.py:305-313)."""
    input_size = tuple(int(s) for s in cfg.framework.input_size)
    native = tuple(int(s) for s in cfg.framework.native_size)

    @jax.jit
    @_pin_build_mesh
    def step(state: TrainState, rgb_u8):
        rgb = T.preprocess_eval(rgb_u8, None, input_size=input_size, has_depth=False)
        pred, _ = _apply_model(model, state.params, state.batch_stats, rgb, False)
        return resize_bilinear(pred, native, align_corners=True)

    return step


LOSS_KEYS = ("si_loss", "silog_loss", "grad_loss", "edge_loss")


def _global_rows(batch: dict) -> int:
    """Rows of the GLOBAL batch this host-local batch is part of.

    Single-process: just the leading dim. Multi-process: local blocks carry
    rows/process_count of the global batch, except remainder batches tagged
    ``_replicated`` which carry all rows on every process
    (data/loader.py::HostLoader process_shard contract). Loss metrics are
    global-batch means either way, so sample-weighted epoch averages must
    weight by global rows."""
    n = int(batch["rgb"].shape[0])
    if jax.process_count() > 1 and not batch.get("_replicated", False):
        n *= jax.process_count()
    return n


def fit(
    model,
    cfg,
    state: TrainState,
    train_loader,
    val_loader,
    results_dir: str,
    logger: Optional[ExperimentLogger] = None,
    mesh=None,
    start_epoch: int = 0,
    seed: int = 0,
    log_every: int = 50,
    best_val: float = float("inf"),
    best_epoch: Optional[int] = None,
    es_counter: int = 0,
) -> tuple[TrainState, dict]:
    """Epoch driver with the reference's semantics (src/main.py:91-252):

    per-epoch train + val loss, early stopping on combined val loss with
    (patience, min_delta), best checkpoint at results/best_model_{model_name}.pth,
    wandb-schema logging, and best-weights reload at the end.

    Multi-process (multi-host) runs work unchanged: loaders carry
    ``process_shard`` row blocks, shard_batch assembles global arrays, metric
    outputs are fully replicated so every process computes identical losses
    and takes identical early-stopping branches; only process 0 writes the
    checkpoint and log records, with a cross-process barrier so others cannot
    race past the save (parallel/distributed.py).

    ``best_val`` / ``best_epoch`` / ``es_counter`` seed the early-stopping
    state on resume. The reference saves these in the checkpoint but never
    reads them back (src/main.py:98 restarts best at inf), so a resumed run's
    first epoch ALWAYS overwrites the best checkpoint even when worse — a
    SURVEY §5.3 "fix, don't replicate" defect; tools/main.py plumbs them from
    the resume payload.
    """
    from ..parallel import distributed as dist

    logger = logger or ExperimentLogger(disabled=True)
    if not dist.is_primary():
        logger = ExperimentLogger(disabled=True)
    accum = int(cfg.framework.get("grad_accum_steps", 1))
    if accum > 1:
        # Validate NOW what the accumulated step asserts at trace time: a
        # non-divisible batch (e.g. a drop_last=False remainder) would
        # otherwise crash mid-epoch after hours of training.
        bs = getattr(train_loader, "batch_size", None)
        if bs is not None and bs % accum:
            raise ValueError(
                f"training.batch_size {bs} is not divisible by "
                f"framework.grad_accum_steps {accum}"
            )
        n = getattr(train_loader, "num_samples", None)
        if (bs is not None and n is not None
                and not getattr(train_loader, "drop_last", False)):
            rem = n % bs
            if rem and rem % accum:
                raise ValueError(
                    f"grad_accum_steps={accum} with drop_last=False would "
                    f"yield a final batch of {rem} samples (not divisible by "
                    f"accum_steps) mid-epoch; set framework.drop_last: true "
                    "or adjust the batch size"
                )
    # Build the steps under fit's OWN mesh (falling back to the registry set by
    # create_train_state) so the steps' build-time mesh capture can never
    # disagree with the mesh the batches are sharded over below.
    with active_mesh(mesh if mesh is not None else get_active_mesh()):
        train_step = make_train_step(model, cfg, accum_steps=accum)
        eval_step = make_eval_step(model, cfg)
    model_name = cfg.experiment.model_name
    num_epochs = int(cfg.training.n_epoch)
    patience = int(cfg.training.early_stopping.patience)
    min_delta = float(cfg.training.early_stopping.min_delta)
    ckpt_path = os.path.join(results_dir, f"best_model_{model_name}.pth")

    best_val = float(best_val)
    best_epoch = start_epoch if best_epoch is None else int(best_epoch)
    counter = int(es_counter)
    early_stop = counter >= patience
    if early_stop:
        print(
            f"Early-stopping counter restored at {counter}/{patience}; "
            "training already converged — skipping epochs."
        )
    history = {"train_loss": [], "val_loss": [], "train_time": [], "n_train": []}
    root_key = jax.random.key(seed)

    for epoch in range(start_epoch, num_epochs):
        if early_stop:
            print(f"Early stopping triggered at epoch {epoch + 1}")
            break
        t0 = time.time()
        print(f"Epoch {epoch + 1}/{num_epochs}")

        # ---- train ----
        t_train = time.time()
        train_loss = 0.0
        train_parts = dict.fromkeys(LOSS_KEYS, 0.0)
        n_train = 0
        epoch_key = jax.random.fold_in(root_key, epoch)
        # Per-iteration logging parity (src/main.py:145-156 logs every
        # iteration): each step's metrics are buffered as device scalars and
        # flushed to the logger every ``log_every`` iterations — every
        # iteration gets its own log record with the reference's keys/values
        # (loss x batch-size), but the host round-trip is amortized instead of
        # syncing the pipeline once per step.
        pending: list = []

        def _flush_pending():
            if not pending:
                return
            fetched = jax.device_get([m for _, m in pending])
            for (bsz_i, _), m in zip(pending, fetched):
                logger.log(
                    {
                        "iteration_train_loss": float(m["loss"]) * bsz_i,
                        **{f"iteration_{k}": float(m[k]) * bsz_i for k in LOSS_KEYS},
                    }
                )
            pending.clear()

        for it, batch in enumerate(train_loader):
            bsz = _global_rows(batch)
            batch = shard_batch(batch, mesh)
            key = jax.random.fold_in(epoch_key, it)
            state, metrics = train_step(
                state, key, batch["rgb"], batch["depth"]
            )
            n_train += bsz
            pending.append((bsz, metrics))
            if len(pending) >= log_every or it == len(train_loader) - 1:
                _flush_pending()
            # accumulate on device; fetch at epoch end
            if it == 0:
                loss_acc = metrics["loss"] * bsz
                part_acc = {k: metrics[k] * bsz for k in LOSS_KEYS}
            else:
                loss_acc = loss_acc + metrics["loss"] * bsz
                part_acc = {k: part_acc[k] + metrics[k] * bsz for k in LOSS_KEYS}
        train_loss = float(jax.device_get(loss_acc)) / max(n_train, 1)
        train_parts = {
            k: float(jax.device_get(v)) / max(n_train, 1) for k, v in part_acc.items()
        }
        # Sustained train-phase wall time (decode -> shard -> step -> logging,
        # bounded by the device_get above): the honest e2e-throughput number
        # bench.py's e2e_images_per_sec reports (VERDICT r4 Missing #3).
        history["train_time"].append(time.time() - t_train)
        history["n_train"].append(n_train)

        # ---- validate ----
        val_loss = 0.0
        val_parts = dict.fromkeys(LOSS_KEYS, 0.0)
        n_val = 0
        for batch in val_loader:
            bsz = _global_rows(batch)
            batch = shard_batch(batch, mesh)
            metrics = jax.device_get(eval_step(state, batch["rgb"], batch["depth"]))
            val_loss += float(metrics["loss"]) * bsz
            for k in LOSS_KEYS:
                val_parts[k] += float(metrics[k]) * bsz
            n_val += bsz
        val_loss /= max(n_val, 1)
        val_parts = {k: v / max(n_val, 1) for k, v in val_parts.items()}

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        print(
            f"Train Loss: {train_loss:.4f} (SI: {train_parts['si_loss']:.4f}, "
            f"Grad: {train_parts['grad_loss']:.4f}, Edge: {train_parts['edge_loss']:.4f})"
        )
        print(
            f"Val Loss: {val_loss:.4f} (SI: {val_parts['si_loss']:.4f}, "
            f"Grad: {val_parts['grad_loss']:.4f}, Edge: {val_parts['edge_loss']:.4f})"
        )

        # ---- early stopping + best checkpoint (src/main.py:200-230) ----
        if val_loss < best_val - min_delta:
            best_val = val_loss
            best_epoch = epoch
            counter = 0
            # val_loss is a fully-replicated global reduction, so every
            # process reaches this branch together; the barrier keeps
            # non-primaries from racing past a save still in flight.
            if dist.is_primary():
                save_checkpoint(
                    ckpt_path,
                    {
                        "epoch": epoch + 1,
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "best_val_loss": best_val,
                        "best_epoch": best_epoch,
                        "early_stopping_counter": counter,
                        "train_loss": train_loss,
                        "val_loss": val_loss,
                        "config": {
                            "model_name": model_name,
                            "num_epochs": num_epochs,
                            "early_stopping": {"patience": patience, "min_delta": min_delta},
                        },
                    },
                )
            dist.barrier("best_checkpoint_saved")
            print(
                f"New best model saved at epoch {epoch + 1} with validation loss: {val_loss:.4f}"
            )
        else:
            counter += 1
            print(f"EarlyStopping counter: {counter} out of {patience}")
            if counter >= patience:
                early_stop = True

        logger.log(
            {
                "epoch": epoch,
                "epoch_train_loss": train_loss,
                "epoch_val_loss": val_parts["si_loss"],
                "epoch_val_loss_combined": val_loss,
                **{f"epoch_train_{k}": v for k, v in train_parts.items()},
                **{f"epoch_val_{k}": v for k, v in val_parts.items()},
                "early_stopping_counter": counter,
                "early_stop_triggered": early_stop,
            }
        )
        print(f"The training time for epoch {epoch} is: {time.time() - t0:.2f}s.\n")

    print(f"\nBest model was from epoch {best_epoch + 1} with validation loss: {best_val:.4f}")
    logger.finish()

    # Reload best weights (src/main.py:250)
    if os.path.exists(ckpt_path):
        payload = load_checkpoint(
            ckpt_path,
            template={
                "epoch": 0,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "best_val_loss": 0.0,
                "best_epoch": 0,
                "early_stopping_counter": 0,
                "train_loss": 0.0,
                "val_loss": 0.0,
                "config": {
                    "model_name": model_name,
                    "num_epochs": num_epochs,
                    "early_stopping": {"patience": patience, "min_delta": min_delta},
                },
            },
        )
        params, batch_stats = payload["params"], payload["batch_stats"]
        if mesh is not None:
            # load_checkpoint returns host arrays; re-place them on the mesh so
            # the returned state keeps its replicated sharding (and subsequent
            # steps don't silently re-transfer from host every call).
            params = replicate(params, mesh)
            batch_stats = replicate(batch_stats, mesh)
        state = state.replace(params=params, batch_stats=batch_stats)
    return state, history


def evaluate(model, cfg, state, loader, mesh=None, n_samples: Optional[int] = None) -> dict:
    """Standalone metric evaluation (src/evaluation.py:136-185): batch-weighted
    SI-RMSE / AbsRel / delta@thres^j averages over the first n_samples, with the
    reference's excess-sample correction on the final batch."""
    metric_step = make_metric_step(model, cfg)
    totals: dict[str, float] = {}
    processed = 0
    for batch in loader:
        if n_samples is not None and processed >= n_samples:
            break
        bsz = _global_rows(batch)
        batch = shard_batch(batch, mesh)
        m = jax.device_get(metric_step(state, batch["rgb"], batch["depth"]))
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v) * bsz
        processed += bsz
        if n_samples is not None and processed > n_samples:
            excess = processed - n_samples
            for k, v in m.items():
                totals[k] -= float(v) * excess
            processed = n_samples
    return {k: v / max(processed, 1) for k, v in totals.items()}


def evaluate_full_suite(model, cfg, state, loader, mesh=None) -> dict:
    """The in-train 7-metric suite with the reference's final normalization
    (src/main.py:372-392)."""
    input_size = tuple(int(s) for s in cfg.framework.input_size)

    @jax.jit
    def step(state, rgb_u8, depth_raw):
        rgb, depth = T.preprocess_eval(rgb_u8, depth_raw, input_size=input_size)
        pred, _ = _apply_model(model, state.params, state.batch_stats, rgb, False)
        pred = resize_bilinear(pred, depth.shape[-2:], align_corners=True)
        return full_metric_suite(pred, depth)

    sums: dict[str, float] = {}
    n = 0
    pixels = None
    for batch in loader:
        bsz = _global_rows(batch)
        batch = shard_batch(batch, mesh)
        out = jax.device_get(step(state, batch["rgb"], batch["depth"]))
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += bsz
        if pixels is None:
            pixels = int(np.prod(tuple(int(s) for s in cfg.framework.input_size)))
    denom = max(n * (pixels or 1), 1)
    return {
        "MAE": sums["mae_sum"] / denom,
        "RMSE": float(np.sqrt(sums["sq_sum"] / denom)),
        "siRMSE": sums["sirmse_sum"] / max(n, 1),
        "REL": sums["rel_sum"] / denom,
        "Delta1": sums["delta1_count"] / denom,
        "Delta2": sums["delta2_count"] / denom,
        "Delta3": sums["delta3_count"] / denom,
    }


def generate_test_predictions(model, cfg, state, loader, predictions_dir, mesh=None):
    """Forward the test loader and save per-image 426x560 .npy predictions named
    by the second list-file token (src/util.py:292-328)."""
    os.makedirs(predictions_dir, exist_ok=True)
    predict_step = make_predict_step(model, cfg)
    for batch in loader:
        sharded = shard_batch(batch, mesh)
        out = predict_step(state, sharded["rgb"])
        if jax.process_count() > 1 and batch.get("_replicated", False):
            # Remainder batch replicated on every process: all processes hold
            # identical full outputs — only process 0 writes, to avoid
            # concurrent same-path writes on a shared filesystem.
            if jax.process_index() != 0:
                continue
            preds = np.asarray(out.addressable_shards[0].data)
        elif jax.process_count() > 1:
            # The output is data-sharded across hosts; each process writes its
            # own contiguous row block (batch["names"] is already the local
            # block under HostLoader(process_shard=...)).
            shards = sorted(
                out.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            parts, seen = [], set()
            for s in shards:  # dedup row blocks replicated over other axes
                start = s.index[0].start or 0
                if start not in seen:
                    seen.add(start)
                    parts.append(np.asarray(s.data))
            preds = np.concatenate(parts)
        else:
            preds = np.asarray(jax.device_get(out))
        for i, name in enumerate(batch["names"]):
            fname = name.split(" ")[1]
            np.save(os.path.join(predictions_dir, fname), preds[i])
