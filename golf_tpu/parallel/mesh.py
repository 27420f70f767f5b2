"""Device-mesh utilities.

The reference's distributed surface is single-node Lightning DDP
(``main.py:10-15``); here the equivalent is SPMD over a
``jax.sharding.Mesh``: batch sharded along a ``data`` axis (gradient
all-reduce inserted by XLA over ICI), with optional ``time`` axis for
sequence-sharded synthesis (see ``golf_tpu.parallel.timeshard``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, time: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // time
    assert data * time == n, (data, time, n)
    arr = np.asarray(devices).reshape(data, time)
    return Mesh(arr, ("data", "time"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)
