"""Debug harness: dp vs dpxtp numeric gap under GSPMD, bisected.

FINDING (2026-08-17, fp32 CPU mesh): with an all-zeros input image the
dryrun's dp-vs-tp loss gap reached 2.9e-3 — in pure fp32, where collective
reassociation noise is ~1e-7. Bisect: init params bit-identical across
meshes; the FORWARD diverges (rel-L2 4.2e-4). Cause: a constant input makes
activations batch-constant, and train-mode BatchNorm normalizes by
sqrt(var~0 + eps=1e-5) — dividing ULP-level reassociation noise by 3.2e-3,
i.e. a ~300x amplifier per BN layer. With representative random inputs the
same two meshes agree to 2.8e-5. Kept as the tool for any future
sharding-equivalence investigation (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from mde_tpu.core import config as config_lib
from mde_tpu.models import MidasNetSemantics
from mde_tpu.parallel import make_mesh, shard_batch
from mde_tpu.train import create_train_state

h, w = 64, 96
cfg = config_lib.defaults()
cfg.framework.input_size = [h, w]
cfg.framework.native_size = [h, w]

model = MidasNetSemantics(dinov2_image_size=(28, 42))
devices = jax.devices()
rgb_f = jnp.zeros((1, h, w, 3), jnp.float32)
rgb_batch = jnp.zeros((8, h, w, 3), jnp.float32)

mesh_dp = make_mesh(data=8, model=1, devices=devices[:8])
mesh_tp = make_mesh(data=4, model=2, devices=devices[:8])

s_dp = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh_dp)
s_tp = create_train_state(model, jax.random.key(0), rgb_f, cfg, mesh_tp)

# 1. init params identical?
pd = jax.device_get(s_dp.params)
pt = jax.device_get(s_tp.params)
worst = 0.0
worst_path = None
from jax.tree_util import tree_flatten_with_path

flat_d, _ = tree_flatten_with_path(pd)
flat_t, _ = tree_flatten_with_path(pt)
for (path, a), (_, b) in zip(flat_d, flat_t):
    a, b = np.float32(a), np.float32(b)
    if a.shape != b.shape:
        print("SHAPE MISMATCH", path, a.shape, b.shape)
        continue
    d = float(np.max(np.abs(a - b)))
    if d > worst:
        worst, worst_path = d, path
print(f"init params maxdiff: {worst:.3e} at {jax.tree_util.keystr(worst_path) if worst_path else None}")

# 2. forward (train=True, batch-stat mutable) outputs
def fwd(params, batch_stats, rgb):
    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, rgb, train=True,
        mutable=["batch_stats"],
    )
    return out

f = jax.jit(fwd)
from jax.sharding import NamedSharding, PartitionSpec as P

rb_dp = jax.device_put(rgb_batch, NamedSharding(mesh_dp, P("data")))
rb_tp = jax.device_put(rgb_batch, NamedSharding(mesh_tp, P("data")))
o_dp = np.float32(jax.device_get(f(s_dp.params, s_dp.batch_stats, rb_dp)))
o_tp = np.float32(jax.device_get(f(s_tp.params, s_tp.batch_stats, rb_tp)))
rel = np.linalg.norm(o_dp - o_tp) / (np.linalg.norm(o_dp) + 1e-9)
print(f"forward rel-L2 dp vs tp: {rel:.3e}  (means {o_dp.mean():.6f} {o_tp.mean():.6f})")
