"""Device mesh + sharding policy.

The reference has no distributed training at all (SURVEY.md §2.6: a commented-out
``nn.DataParallel`` and DataLoader worker IPC are the closest things). The
TPU-native replacement is single-controller JAX over ICI: a ``('data', 'model')``
mesh, batches sharded on ``data``, parameters replicated (models here are <100M
params, so tensor parallelism is unnecessary — but the model axis exists so a
future tp layout only changes PartitionSpecs, not the step function).

Under ``jax.jit`` + GSPMD, gradient all-reduce *and* cross-device batch-norm
statistics come out as XLA collectives automatically — there is no NCCL analog to
manage, and no explicit psum in user code unless shard_map is chosen.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# --------------------------------------------------------------- active mesh
#
# Trace-time mesh registry. Ops that need an explicit per-shard lowering under
# multi-device execution (the Pallas windowed attention: custom calls have no
# GSPMD partitioning rule, so without shard_map they would force replication)
# read the active mesh here at TRACE time. It is registered by
# create_train_state / the tools when a training mesh exists. Because jitted
# functions capture it during tracing, set it before building step functions;
# changing it later only affects new traces.

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Register the mesh ops may shard_map over; returns the previous one."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return prev


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


class active_mesh:
    """Context manager form of set_active_mesh (tests, scoped benchmarks)."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        self._prev = set_active_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_active_mesh(self._prev)
        return False


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh; data=-1 means all remaining devices.
    If data*model is smaller than the device count, the first data*model
    devices are used (lets a mesh match a batch size that doesn't divide)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} exceeds {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_training_mesh(cfg, batch_size: int) -> Mesh:
    """Mesh from config with the data axis clamped to divide the batch size."""
    model = int(cfg.framework.mesh.get("model", 1))
    requested = int(cfg.framework.mesh.get("data", -1))
    n = len(jax.devices())
    usable = n // model
    data = clamp_data_axis(requested, batch_size, usable)
    return make_mesh(data, model)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """device_put array leaves with batch-dim sharding (arrays only; passthrough
    for lists like filenames). The committed placement lets the H2D copy overlap
    the previous step instead of blocking like the reference's per-step
    ``.to(device)`` (src/main.py:126).

    A batch whose leading dim does not divide over the 'data' axis (e.g. the
    final partial validation batch) is placed replicated instead — correct,
    just not parallel, and only ever hit on remainder batches.

    Multi-process (multi-host) runs route through
    ``jax.make_array_from_process_local_data``: each process passes only its
    contiguous row block of the global batch (HostLoader(process_shard=...) —
    parallel/distributed.py documents the contract) and the result is one
    global array over the mesh, exactly as if a single controller had
    device_put the full batch."""
    if mesh is None:
        return batch
    if jax.process_count() > 1:
        return _shard_batch_multiprocess(batch, mesh)
    n_data = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            if v.shape[0] % n_data == 0:
                out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
            else:
                out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            out[k] = v
    return out


def _shard_batch_multiprocess(batch: dict, mesh: Mesh) -> dict:
    """Assemble per-process local row blocks into global mesh-sharded arrays.

    Batches tagged ``_replicated`` by HostLoader(process_shard=...) — the
    non-dividing remainder policy — carry FULL rows on every process and are
    placed fully replicated, mirroring the single-process remainder fallback
    above. A sharded batch whose global rows don't divide the 'data' axis is
    an error (the loader's divisibility contract was violated)."""
    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    if batch.get("_replicated", False):
        out = {
            k: (replicate(v, mesh) if hasattr(v, "ndim") else v)
            for k, v in batch.items()
        }
        return out
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            global_rows = v.shape[0] * n_proc
            if global_rows % n_data:
                raise ValueError(
                    f"multi-process batch: global leading dim {global_rows} "
                    f"(local {v.shape[0]} x {n_proc} processes) does not "
                    f"divide the data axis ({n_data}); use drop_last or a "
                    "dividing batch size"
                )
            out[k] = jax.make_array_from_process_local_data(
                data_sharding(mesh, v.ndim), np.asarray(v)
            )
        else:
            out[k] = v
    return out


def clamp_data_axis(requested: int, batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest usable 'data' axis size: divides batch_size, <= device count."""
    n = n_devices if n_devices is not None else len(jax.devices())
    if requested == -1:
        requested = n
    requested = min(requested, n)
    while requested > 1 and batch_size % requested != 0:
        requested -= 1
    return max(requested, 1)


def replicate(tree, mesh: Optional[Mesh]):
    """Fully replicate a pytree of arrays over the mesh.

    Multi-process: device_put cannot target non-addressable devices, so global
    replicated arrays are built from per-process callbacks instead — every
    process must hold the same host values (true for deterministic init and
    checkpoint loads, the two callers)."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(x):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx]
            )

        return jax.tree_util.tree_map(put, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# ------------------------------------------------------------ tensor parallel
#
# Megatron-style sharding over the 'model' axis, expressed purely as GSPMD
# PartitionSpecs (the scaling-book recipe: annotate, let XLA insert the
# collectives). Attention/MLP input projections are column-parallel (output
# features sharded, biases sharded alongside); the projections that close the
# block (attn proj, MLP fc2) are row-parallel (input features sharded — XLA
# emits the all-reduce after the matmul). Everything else stays replicated.
# Applies to every transformer family in the zoo by module-name convention:
# ViT/DINOv2/Swin 'qkv', BEiT/CrossAttention 'q'/'k'/'v', MLP 'fc1' / 'fc2',
# output 'proj'.

_TP_COLUMN = {"qkv", "fc1", "q", "k", "v"}
_TP_ROW = {"proj", "fc2"}


def tp_param_spec(path: tuple, shape: tuple, n_model: int):
    """PartitionSpec for one param leaf under tensor parallelism.

    ``path`` is the flattened module path, ``shape`` the leaf shape. Dims that
    don't divide by the model-axis size stay replicated (correct, just not
    sharded) — GSPMD would handle uneven shards, but even shards keep the
    compiled program simple."""
    leaf = path[-1]
    mod = path[-2] if len(path) >= 2 else ""
    if leaf == "kernel" and mod in _TP_COLUMN and len(shape) == 2:
        if shape[1] % n_model == 0:
            return P(None, "model")
    elif leaf == "kernel" and mod in _TP_ROW and len(shape) == 2:
        if shape[0] % n_model == 0:
            return P("model", None)
    elif leaf == "bias" and mod in _TP_COLUMN and len(shape) == 1:
        if shape[0] % n_model == 0:
            return P("model")
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a params pytree with Megatron-style 'model'-axis shardings.

    Returns the sharded pytree; optimizer moments created from it afterwards
    (optax ``init`` -> ``zeros_like``) inherit the shardings automatically.

    Multi-process: device_put cannot target non-addressable devices, so each
    process materializes its own shards from the full host value via
    ``make_array_from_callback`` — valid because params come from a
    deterministic init or checkpoint load and are identical on every
    process."""
    from flax import traverse_util

    n_model = mesh.shape["model"]
    multiprocess = jax.process_count() > 1
    flat = traverse_util.flatten_dict(dict(params))
    out = {}
    for path, leaf in flat.items():
        spec = tp_param_spec(path, np.shape(leaf), n_model)
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            host = np.asarray(leaf)
            out[path] = jax.make_array_from_callback(
                host.shape, sharding, lambda idx, host=host: host[idx]
            )
        else:
            out[path] = jax.device_put(leaf, sharding)
    return traverse_util.unflatten_dict(out)
