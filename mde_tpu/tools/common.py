"""Shared plumbing for the entry-point tools: config resolution, path layout,
dataset/loader construction, model+state bootstrapping."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import config as config_lib
from ..data import DepthDataset, HostLoader, split_train_val
from ..models import init_model
from ..parallel import make_mesh
from ..train import TrainState, create_train_state, load_checkpoint

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs", "config.yaml")


def parse_config(description: str, extra=None):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=DEFAULT_CONFIG, help="path to config.yaml")
    p.add_argument("--data-dir", default=None, help="override paths.data_dir")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    if extra:
        extra(p)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Multi-host: MDE_DIST_* env vars opt every tool into the jax.distributed
    # runtime (must run before the first backend touch below;
    # parallel/distributed.py documents the variables and the data contract).
    from ..parallel import distributed

    distributed.initialize_from_env()
    cfg = config_lib.load(args.config)
    if args.data_dir:
        cfg.paths.data_dir = args.data_dir
    from ..core import compilation_cache

    compilation_cache.enable(cfg)
    return cfg, args


def resolve_paths(cfg):
    data_dir = cfg.paths.data_dir
    train_list = cfg.paths.get("train_list") or os.path.join(data_dir, "train_list.txt")
    test_list = cfg.paths.get("test_list") or os.path.join(data_dir, "test_list.txt")
    return {
        "train_dir": os.path.join(data_dir, "train"),
        "test_dir": os.path.join(data_dir, "test"),
        "train_list": train_list,
        "test_list": test_list,
        "results_dir": cfg.paths.results_dir,
        "predictions_dir": cfg.paths.predictions_dir,
    }


def build_loaders(cfg, paths, train: bool = True):
    fw = cfg.framework
    bs = int(cfg.training.batch_size)
    # Multi-host: each process decodes only its contiguous row block of every
    # global batch; non-dividing remainder batches fall back to replicated
    # placement (loader tags them _replicated).
    shard = (
        (jax.process_index(), jax.process_count())
        if jax.process_count() > 1
        else None
    )
    loaders = {}
    if train:
        full = DepthDataset(paths["train_dir"], paths["train_list"], has_gt=True)
        tr_idx, va_idx = split_train_val(len(full), fw.val_fraction, seed=fw.seed)
        cache = bool(fw.get("cache_dataset", False))
        loaders["train"] = HostLoader(
            full, tr_idx, bs, shuffle=True, drop_last=bool(fw.drop_last),
            num_workers=int(fw.num_workers), seed=fw.seed,
            prefetch_depth=int(fw.prefetch_depth), cache=cache,
            process_shard=shard,
        )
        loaders["val"] = HostLoader(
            full, va_idx, bs, shuffle=False, num_workers=int(fw.num_workers),
            cache=cache, process_shard=shard,
        )
    if os.path.exists(paths["test_list"]):
        test_ds = DepthDataset(paths["test_dir"], paths["test_list"], has_gt=False)
        loaders["test"] = HostLoader(
            test_ds, batch_size=bs, num_workers=int(fw.num_workers),
            process_shard=shard,
        )
    return loaders


def bootstrap_model(cfg, mesh=None, checkpoint: Optional[str] = None):
    """Build model + TrainState; restore checkpoint params when given/resuming."""
    model, resume_payload = init_model(cfg)
    h, w = (int(s) for s in cfg.framework.input_size)
    sample = jnp.zeros((1, h, w, 3), jnp.uint8)
    from ..data.transforms import preprocess_eval

    rgb = preprocess_eval(sample, None, input_size=(h, w), has_depth=False)
    state = create_train_state(model, jax.random.key(cfg.framework.seed), rgb, cfg, mesh)
    payload = resume_payload
    if checkpoint is not None and os.path.exists(checkpoint):
        payload = load_checkpoint(checkpoint)
    if payload is not None:
        from flax import serialization

        state = state.replace(
            params=serialization.from_state_dict(state.params, payload["params"]),
            batch_stats=serialization.from_state_dict(
                state.batch_stats, payload["batch_stats"]
            ),
        )
        if "opt_state" in payload:
            try:
                state = state.replace(
                    opt_state=serialization.from_state_dict(state.opt_state, payload["opt_state"])
                )
            except (KeyError, ValueError, TypeError):
                print("Warning: optimizer state in checkpoint is incompatible; reinitialized.")
    return model, state, payload
