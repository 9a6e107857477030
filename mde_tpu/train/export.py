"""AOT model export: serialized StableHLO serving artifacts (jax.export).

Beyond the reference (which has no deployment story at all — its inference
surface is re-running the training codebase, src/generate_predictions.py): the
jitted predict path (preprocess -> forward -> align-corners resize to the
native 426x560, train/trainer.py::make_predict_step) is exported per batch
bucket, then serialized into ONE self-contained artifact. A serving process
deserializes and runs it with no model code, no checkpoint loading, and no
Python-side retracing — the TPU-native analog of a frozen graph.

Artifact format (``.mdex``): a zip archive holding ``meta.json`` (model name,
geometry, buckets, platforms, jax version), ONE shared ``weights.msgpack``
blob, and one ``b{N}.bin`` serialized ``jax.export.Exported`` program per
batch bucket. The per-bucket programs take the weight pytree as an ARGUMENT
(weights are not baked into each program as constants — format v1 did that
and the artifact scaled linearly with bucket count: 192 MB for the flagship
at (1,2,4,8); v2 stores the weights once and the programs are a few MB each).
``ExportedPredictor`` device_puts the weights once at load, so repeated
predict() calls never re-transfer them. Buckets mirror tools/serve.py's
dynamic batcher so the two compose.

TPU programs may contain Mosaic (Pallas) custom calls — e.g. the windowed
attention kernel — which jax.export only serializes with an explicit
stability waiver (``DisabledSafetyCheck.custom_call("tpu_custom_call")``);
the artifact is then jaxlib-version-coupled on TPU, which is the standard
trade for shipping custom kernels. CPU/GPU exports carry no such waiver.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

META_NAME = "meta.json"
WEIGHTS_NAME = "weights.msgpack"
FORMAT_VERSION = 2


def _blob_name(batch: int) -> str:
    return f"b{int(batch)}.bin"


def _plain(tree):
    """FrozenDict/TrainState subtrees -> plain nested dicts of host ndarrays,
    so the exported in_tree is reproducible at load time without flax model
    code (msgpack_restore returns exactly this structure)."""
    from flax import serialization

    return jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(jax.device_get(tree))
    )


def export_predict(
    model,
    cfg,
    state,
    batch_sizes: Sequence[int],
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export the predict step for each batch size; weights passed as an
    argument pytree, shared across buckets.

    Returns {"meta": dict, "blobs": {batch: bytes}, "weights": bytes}.
    ``platforms`` defaults to the current backend; pass e.g. ("cpu", "tpu")
    for a multi-platform artifact (lowered once per platform).
    """
    from flax import serialization
    from jax import export as jexp

    from .trainer import make_predict_step

    native = tuple(int(s) for s in cfg.framework.native_size)
    step = make_predict_step(model, cfg)

    weights = {"params": _plain(state.params), "batch_stats": _plain(state.batch_stats)}

    def predict(w, rgb_u8):
        s = state.replace(params=w["params"], batch_stats=w["batch_stats"])
        return step(s, rgb_u8)

    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    disabled = ()
    if "tpu" in plats:
        disabled = (jexp.DisabledSafetyCheck.custom_call("tpu_custom_call"),)

    w_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), weights
    )
    blobs = {}
    for b in batch_sizes:
        spec = jax.ShapeDtypeStruct((int(b), *native, 3), jnp.uint8)
        exp = jexp.export(
            jax.jit(predict), platforms=plats, disabled_checks=list(disabled)
        )(w_spec, spec)
        blobs[int(b)] = exp.serialize()
    meta = {
        "format_version": FORMAT_VERSION,
        "model_name": str(cfg.experiment.model_name),
        "model_type": str(cfg.model.model_type),
        "native_size": list(native),
        "input_size": [int(s) for s in cfg.framework.input_size],
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "platforms": list(plats),
        "jax_version": jax.__version__,
    }
    return {
        "meta": meta,
        "blobs": blobs,
        "weights": serialization.msgpack_serialize(weights),
    }


def save_exported(path: str, exported: dict) -> None:
    """Write the {meta, blobs, weights} bundle as a .mdex zip artifact."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(META_NAME, json.dumps(exported["meta"], indent=2))
        if "weights" in exported:
            zf.writestr(
                WEIGHTS_NAME, bytes(exported["weights"]),
                compress_type=zipfile.ZIP_STORED,
            )
        for b, blob in exported["blobs"].items():
            # serialized StableHLO is already compact; store uncompressed so
            # load is one mmap-friendly read
            zf.writestr(
                _blob_name(b), bytes(blob), compress_type=zipfile.ZIP_STORED
            )
    os.replace(tmp, path)


class ExportedPredictor:
    """A deserialized .mdex artifact: bucketed ``predict(rgb_u8)`` with no
    model code. Blobs deserialize lazily per bucket; calls run under jit (the
    exported computation is a single opaque call, so there is nothing to
    retrace beyond the thin wrapper). The shared weight blob is device_put
    ONCE here; every predict() call reuses the device copy."""

    def __init__(self, path: str):
        self.path = path
        with zipfile.ZipFile(path) as zf:
            self.meta = json.loads(zf.read(META_NAME))
            version = self.meta.get("format_version")
            if version != FORMAT_VERSION:
                raise ValueError(
                    f"{path}: unsupported artifact format {version!r}"
                )
            self._raw = {b: zf.read(_blob_name(b)) for b in self.meta["batch_sizes"]}
            from flax import serialization

            host_w = serialization.msgpack_restore(zf.read(WEIGHTS_NAME))
            self._weights = jax.device_put(host_w)
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"{path}: exported for platforms {self.meta['platforms']}, "
                f"current backend is {backend!r}"
            )
        self._calls: dict[int, Callable] = {}

    @property
    def batch_sizes(self) -> list[int]:
        return list(self.meta["batch_sizes"])

    def _call_for(self, batch: int) -> Callable:
        fn = self._calls.get(batch)
        if fn is None:
            from jax import export as jexp

            if batch not in self._raw:
                raise ValueError(
                    f"no exported bucket for batch {batch}; have {self.batch_sizes}"
                )
            exp = jexp.deserialize(self._raw[batch])
            fn = jax.jit(exp.call)
            self._calls[batch] = fn
        return fn

    def predict(self, rgb_u8: np.ndarray) -> np.ndarray:
        """(N, H_native, W_native, 3) uint8 -> (N, H_native, W_native) f32.
        N must be one of the exported buckets (compose with the serving
        batcher, which pads to bucket sizes)."""
        fn = self._call_for(int(rgb_u8.shape[0]))
        return np.asarray(jax.device_get(fn(self._weights, rgb_u8)))

    def warmup(self) -> None:
        h, w = self.meta["native_size"]
        for b in self.batch_sizes:
            self.predict(np.zeros((b, h, w, 3), np.uint8))


def load_exported(path: str) -> ExportedPredictor:
    return ExportedPredictor(path)
