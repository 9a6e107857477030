"""Flagship end-to-end training smoke on the attached accelerator:
trains MidasNetSemantics on synthetic CIL-format data through the real
HostLoader and asserts the loss halves within 160 steps."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from mde_tpu.core import compilation_cache

compilation_cache.enable()  # warm restarts skip the remote compile helper

import time, numpy as np, jax, jax.numpy as jnp, os, tempfile
from mde_tpu.core import config as config_lib
from mde_tpu.models import build_model
from mde_tpu.train import create_train_state, make_train_step
from mde_tpu.data import synthetic, DepthDataset, HostLoader

root = tempfile.mkdtemp()
synthetic.generate(root, n_train=32, n_test=0, size=(426, 560))
ds = DepthDataset(root + "/train", root + "/train_list.txt")
loader = HostLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2)

cfg = config_lib.defaults()
model = build_model(cfg.model)
state = create_train_state(model, jax.random.key(0), jnp.zeros((1,448,576,3),jnp.float32), cfg)
step = make_train_step(model, cfg)
key = jax.random.key(1)
losses = []
t0 = time.time()
i = 0
for epoch in range(40):
    for batch in loader:
        state, m = step(state, jax.random.fold_in(key, i), batch["rgb"], batch["depth"])
        i += 1
        if i % 20 == 0:
            losses.append(float(m["loss"]))
            print(f"step {i}: loss {losses[-1]:.4f} ({(time.time()-t0)/i*1000:.0f} ms/step avg)", flush=True)
        if i >= 160: break
    if i >= 160: break
print("first->last:", losses[0], "->", losses[-1])
assert losses[-1] < 0.5 * losses[0], "flagship did not learn"
print("FLAGSHIP TPU TRAINING OK")
