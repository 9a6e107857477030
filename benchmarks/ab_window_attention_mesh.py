"""Same-process TPU A/B: does the Pallas windowed-attention win survive the
shard_map wrapper that keeps it live on multi-device meshes?

Only one physical chip is available here, so the wrapper is exercised over a
1-device ('data','model') mesh — that measures exactly the overhead the
wrapper adds (shard_map boundary + sharding constraints) without the (absent)
cross-chip parallelism. Three variants at the flagship 56x72/ws16 bf16 shape:

  xla direct / pallas direct / pallas via shard_map(1-device mesh)

Run from repo root: python benchmarks/ab_window_attention_mesh.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import timeit

timeit = functools.partial(timeit, steps=20, width=54)


def main():
    from mde_tpu.ops.window_attention import windowed_cross_attention
    from mde_tpu.parallel import active_mesh, make_mesh

    b, h, w, c, heads, ws = 8, 56, 72, 32, 8, 16
    for d in (jnp.bfloat16, jnp.float32):
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=d)
            for _ in range(3)
        )
        xla = jax.jit(
            lambda q, k, v: windowed_cross_attention(q, k, v, heads, ws, backend="xla")
        )
        pls = jax.jit(
            lambda q, k, v: windowed_cross_attention(q, k, v, heads, ws, backend="pallas")
        )
        t_xla = timeit(f"[{d.__name__}] window_attn xla direct", xla, q, k, v)
        t_pls = timeit(f"[{d.__name__}] window_attn pallas direct", pls, q, k, v)

        mesh = make_mesh(data=1, model=1)
        with active_mesh(mesh):
            # jit must trace INSIDE the active-mesh scope; also defeat
            # device_count()<=1 gating so the wrapper engages on one chip.
            import mde_tpu.ops.window_attention as wa

            orig = wa._shardable_mesh
            wa._shardable_mesh = lambda: mesh
            try:
                pls_mesh = jax.jit(
                    lambda q, k, v: windowed_cross_attention(
                        q, k, v, heads, ws, backend="pallas"
                    )
                )
                t_mesh = timeit(
                    f"[{d.__name__}] window_attn pallas shard_map(1dev)",
                    pls_mesh, q, k, v,
                )
            finally:
                wa._shardable_mesh = orig
        print(
            f"[{d.__name__}] pallas/xla = {t_xla / t_pls:.2f}x  "
            f"wrapped/direct overhead = {(t_mesh / t_pls - 1) * 100:+.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
