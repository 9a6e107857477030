"""Persistent XLA compilation-cache setup.

The axon remote compile helper makes first compiles expensive (20 s for small
programs to several minutes for the flagship, worsening over a session —
CLAUDE.md), and every CLI tool, server start, bench run and test process pays
it again. JAX's persistent compilation cache eliminates the repeat cost:
measured through the axon tunnel on 2026-08-18, a conv-stack program compiled
in 3.51 s cold and 0.03 s from a fresh process with a warm cache (117x), and
the full flagship ``entry()`` forward in 25.6 s cold vs 3.3 s warm (7.8x —
the residue is trace/lowering time, which the cache cannot remove).

``enable(cfg)`` is called by every entry funnel (tools/common.parse_config,
bench.py, __graft_entry__) before first backend use; ``framework.
compilation_cache: false`` opts out, ``framework.compilation_cache_dir``
overrides the default ``~/.cache/mde_tpu/xla`` (or $MDE_TPU_CACHE_DIR).

The cache key includes the backend/platform and compile options, so CPU-mesh
test processes and TPU runs coexist in one directory; entries below 1 s
compile time are not persisted (not worth the disk/IO), and the directory is
capped so an unattended server cannot grow it without bound.
"""

from __future__ import annotations

import os
from typing import Optional

_ENABLED_DIR: Optional[str] = None


def enable(cfg=None, dir_path: Optional[str] = None) -> Optional[str]:
    """Idempotently enable the persistent compilation cache; returns the
    cache dir, or None when disabled by config."""
    global _ENABLED_DIR
    if cfg is not None:
        fw = getattr(cfg, "framework", None)
        if fw is not None:
            if not bool(fw.get("compilation_cache", True)):
                return None
            dir_path = dir_path or fw.get("compilation_cache_dir", None)
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    path = (
        dir_path
        or os.environ.get("MDE_TPU_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "mde_tpu", "xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None  # unwritable cache location: run uncached, don't crash
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_compilation_cache_max_size", 4 * 1024**3)
    _ENABLED_DIR = path
    return path
