"""Multi-host (pod / multislice) utilities.

The reference's multi-process surface is Lightning DDP rank-0 gating +
``strategy.broadcast`` (``ltng/cli.py:63-110``). TPU-native equivalents:
``jax.distributed`` initialization, process-0 gating, one-to-all
broadcast, and a mesh layout with an outer DCN axis so data-parallel
gradient all-reduce rides ICI within a slice and only crosses DCN at the
slice boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed on a multi-host pod slice. No-ops on a
    single host. On Cloud TPU the arguments auto-detect."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_pod_mesh(dcn_axis: Optional[int] = None,
                  time: int = 1) -> Mesh:
    """Mesh ('dcn', 'data', 'time'): outer axis = slice index (DCN),
    inner axes within a slice (ICI). Gradient psum over ('dcn','data')
    does the hierarchical reduction XLA optimizes for."""
    devices = jax.devices()
    n = len(devices)
    n_slices = dcn_axis or max(
        1, len({getattr(d, "slice_index", 0) for d in devices}))
    per_slice = n // n_slices
    data = per_slice // time
    arr = np.asarray(devices).reshape(n_slices, data, time)
    return Mesh(arr, ("dcn", "data", "time"))


def broadcast_one_to_all(tree):
    """Broadcast process-0's pytree to all processes (reference
    ``strategy.broadcast`` analog)."""
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def sync_global_devices(tag: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
