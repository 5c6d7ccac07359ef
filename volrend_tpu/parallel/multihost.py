"""Multi-host runtime glue (SURVEY.md §5.8).

The reference has no distributed machinery; the TPU framework scales with
the standard JAX multi-host model: one process per host, DCN only for
process coordination + pose distribution, all tensor collectives (the grad
psum) over ICI inside ``shard_map``. This module wraps:

- ``init()``: ``jax.distributed.initialize`` from env or explicit args
  (no-op single-process fallback so the same entry point runs anywhere);
- ``global_mesh()``: a 1-D rays mesh over all global devices;
- ``pose_shard()``: which poses this host renders (work partitioning used
  by cli/headless.py and the RenderQueue; each host writes its own PNGs
  exactly like main_headless.cpp:216-222 writes per-pose files).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["init", "global_mesh", "pose_shard", "process_index",
           "process_count"]

_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-host runtime (idempotent; single-process
    no-op when no coordinator is configured)."""
    global _initialized
    if _initialized:
        return
    import jax
    coordinator_address = coordinator_address or os.environ.get(
        "VOLREND_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        _initialized = True  # single-process mode
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def global_mesh(axis_name: str = "rays"):
    """Flat mesh over every device in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def pose_shard(n_poses: int) -> List[int]:
    """Round-robin pose ids for this host."""
    return [i for i in range(n_poses)
            if i % process_count() == process_index()]
