"""Multi-process (multi-host) runtime support.

The reference is strictly single-process (SURVEY.md §2.6/§5.8: no
torch.distributed anywhere); this module is the beyond-reference scaling story
for TPU pods that span hosts: single-controller JAX per process, coordinated
through ``jax.distributed`` over DCN, with the SAME mesh/GSPMD code path as
single-process training — ``jax.devices()`` simply becomes the global device
list and batch placement goes through
``jax.make_array_from_process_local_data`` instead of ``device_put``.

Design contract (kept deliberately identical to single-process numerics):

- every process computes the same global batch order (same seed/shuffle) and
  decodes only its contiguous row block (``HostLoader(process_shard=...)``);
- ``parallel.shard_batch`` assembles the local blocks into one global array
  over the ('data','model') mesh — GSPMD then inserts the cross-host
  collectives exactly as it does across chips;
- metric outputs are fully-replicated scalars, so every process sees identical
  losses and makes identical early-stopping decisions — no control-plane
  broadcast is needed;
- only process 0 writes checkpoints/logs; a ``sync_global_devices`` barrier
  keeps other processes from racing past the save.

On CPU (tests, dev) the same code runs with Gloo collectives
(``jax_cpu_collectives_implementation``) — tests/test_distributed.py drives a
real 2-process x 2-device training run and checks it against the
single-process 4-device mesh bit-for-bit-close.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    platform: Optional[str] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    On TPU pods all arguments are auto-detected from the environment
    (``jax.distributed.initialize()`` with no args). On CPU the Gloo
    collectives backend is selected — that is what makes ``psum`` & friends
    work across host processes without a TPU fabric.

    ``platform`` optionally forces the backend ('cpu' for tests/dev) — it must
    be applied before first backend use, which is why it is plumbed here.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if (platform or "").startswith("cpu") or os.environ.get("MDE_DIST_CPU"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def initialize_from_env() -> bool:
    """Initialize from MDE_DIST_* environment variables; returns True if a
    multi-process run was configured.

    - ``MDE_DIST_COORDINATOR`` — host:port of process 0's coordinator service
    - ``MDE_DIST_NUM_PROCESSES`` / ``MDE_DIST_PROCESS_ID``
    - ``MDE_DIST_CPU`` — force the CPU backend + Gloo collectives (dev/tests)

    With only ``MDE_DIST_AUTO=1`` set, calls ``jax.distributed.initialize()``
    bare for TPU-pod auto-detection.
    """
    if os.environ.get("MDE_DIST_AUTO"):
        initialize()
        return True
    coord = os.environ.get("MDE_DIST_COORDINATOR")
    if not coord:
        return False
    initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["MDE_DIST_NUM_PROCESSES"]),
        process_id=int(os.environ["MDE_DIST_PROCESS_ID"]),
        platform="cpu" if os.environ.get("MDE_DIST_CPU") else None,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns checkpoint/log side effects."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def barrier(name: str = "mde_barrier") -> None:
    """Block until every process reaches this point (no-op single-process).

    Used around primary-only filesystem side effects (checkpoint save) so
    non-primary processes cannot race ahead to a read of a file that is still
    being written.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_row_block(
    global_rows: int, process: Optional[int] = None, count: Optional[int] = None
) -> tuple[int, int]:
    """[start, stop) of this process's contiguous row block of a global batch.

    ``jax.devices()`` orders devices by process index, so a batch sharded over
    the 'data' mesh axis places contiguous row blocks per process; the host
    pipeline decodes exactly that block (HostLoader(process_shard=...)).
    ``process``/``count`` default to the runtime's values.
    """
    p = jax.process_index() if process is None else process
    n = jax.process_count() if count is None else count
    if global_rows % n:
        raise ValueError(
            f"global batch of {global_rows} rows does not split over {n} processes"
        )
    per = global_rows // n
    return p * per, (p + 1) * per
