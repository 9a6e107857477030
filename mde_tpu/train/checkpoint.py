"""Checkpointing: msgpack training checkpoints + PyTorch ``.pth`` ingestion.

The reference persists a best-model dict {epoch, model_state_dict,
optimizer_state_dict, best_val_loss, best_epoch, early_stopping_counter,
train_loss, val_loss, config} to ``results/best_model_{model_name}.pth`` on every
validation improvement (src/main.py:206-224) and reloads weights at the end of
training (src/main.py:250). We keep the exact filename contract but store a
flax-serialized msgpack payload; ``load_checkpoint`` sniffs the file header so a
genuine torch zip checkpoint at the same path is routed through the ``.pth``
importer instead (torch checkpoints are zip archives, magic ``PK``).

Unlike the reference, resume restores optimizer state as well — the reference
saves it but never loads it back (SURVEY.md §5.3, a defect we fix rather than
replicate).
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    def convert(x):
        # Pull device arrays to host; leave python scalars/strings untouched
        # (msgpack handles those natively, numpy str arrays it cannot).
        if isinstance(x, (jax.Array, np.ndarray)):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(convert, tree)


def save_checkpoint(path: str, payload: Mapping[str, Any]) -> None:
    """Serialize a checkpoint dict; array leaves become numpy, rest stays python."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state_dict = serialization.to_state_dict(_to_numpy(dict(payload)))
    blob = serialization.msgpack_serialize(state_dict)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Optional[Mapping[str, Any]] = None):
    """Load a checkpoint written by ``save_checkpoint``.

    If ``template`` is given, the result is restored onto it (shape-checked,
    original pytree structure — the equivalent of strict state_dict loading);
    otherwise the raw nested-dict payload is returned.
    """
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        blob = f.read()
    if head == b"PK":
        raise ValueError(
            f"{path} is a PyTorch zip checkpoint; use mde_tpu.train.torch_import to ingest it"
        )
    payload = serialization.msgpack_restore(blob)
    if template is not None:
        return serialization.from_state_dict(dict(template), payload)
    return payload


# ------------------------------------------------------ sharded (Orbax) format
#
# The msgpack format above gathers every leaf to one host — fine at this
# model scale (SURVEY.md §5.4), but it serializes through host RAM and loses
# shardings. The Orbax path writes each shard from the device holding it and
# restores directly onto a target sharding, so multi-chip training states
# round-trip without a host-side gather. Directory-based (one dir per step).


def save_checkpoint_sharded(dirpath: str, payload) -> None:
    """Write ``payload`` (pytree of arrays/scalars; arrays may be sharded over
    a Mesh) as an Orbax checkpoint directory. Blocks until durable."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(dirpath), payload, force=True)
        # context exit waits for the async write


def load_checkpoint_sharded(dirpath: str, template):
    """Restore an Orbax checkpoint onto ``template``'s structure/shardings.

    ``template`` may hold concrete arrays (their shape/dtype/sharding is used)
    or ``jax.ShapeDtypeStruct`` leaves with ``.sharding`` set — each leaf is
    restored directly to its target sharding, no host-side gather.
    """
    import orbax.checkpoint as ocp

    def to_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree_util.tree_map(to_abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(dirpath), abstract)

    # Orbax returns every leaf COMMITTED to its target sharding — including
    # leaves whose template was an *uncommitted* default-device scalar (optax
    # counts, TrainState.step: anything built by a bare jnp.asarray rather
    # than device_put). A committed SingleDeviceSharding scalar then pins
    # device 0, and jit refuses to mix it with mesh-placed params when the
    # state is restored onto a different topology. Hand those leaves back as
    # host numpy so they stay placement-neutral (auto-placed at first use),
    # exactly like the freshly-initialized state they replace.
    def neutralize(t, r):
        if isinstance(t, jax.Array) and not t.committed and isinstance(r, jax.Array):
            return np.asarray(jax.device_get(r))
        return r

    return jax.tree_util.tree_map(neutralize, template, restored)
