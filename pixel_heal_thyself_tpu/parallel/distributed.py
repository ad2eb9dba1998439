"""Multi-host (multi-process) runtime: jax.distributed + per-host feeds.

No reference analog — the reference is strictly single-process/single-GPU
(SURVEY.md §2.10). TPU-native scale-out: one Python process per host, all
devices joined into one global mesh; XLA collectives ride ICI/DCN. Each
host loads a disjoint slice of every global batch and the global device
array is assembled with `jax.make_array_from_process_local_data`.

Bootstrap (any one of):
- TPU pod slices: set ``parallel.multihost=true`` — `jax.distributed
  .initialize()` auto-discovers the coordinator from the TPU metadata.
- Explicit (also the CPU smoke recipe): set ``PHT_COORDINATOR=host:port``,
  ``PHT_NUM_PROCESSES=N``, ``PHT_PROCESS_ID=i`` per process; see
  tests/test_multihost.py for the 2-process CPU version.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed(multihost: bool = False) -> bool:
    """Initialize the jax.distributed runtime if configured; idempotent.

    Must run before the first device use in the process. Returns True when
    this process is part of a multi-process run.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator = os.environ.get("PHT_COORDINATOR")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ["PHT_NUM_PROCESSES"]),
            process_id=int(os.environ["PHT_PROCESS_ID"]),
        )
        _initialized = True
        return True
    if multihost:
        jax.distributed.initialize()  # TPU pod auto-discovery
        _initialized = True
        return True
    return False


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_batch_bounds(global_batch: int) -> tuple[int, int]:
    """[lo, hi) rows of every global batch this process feeds.

    Contiguous equal slices in process order match how `jax.devices()`
    (process-major) lays the 'data' axis of the mesh out, so each host's
    rows land on its own devices without cross-host transfers.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} must divide by {n} processes",
        )
    per = global_batch // n
    lo = jax.process_index() * per
    return lo, lo + per


def put_global(tree, sharding):
    """device_put a host-local tree as global arrays on the mesh.

    Single-process: plain device_put. Multi-process: each leaf is this
    host's shard (or the full array for replicated shardings) and the
    global array is assembled across processes.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), tree,
    )
