"""Device-mesh and sharding helpers.

The reference's only parallelism is single-process `nn.DataParallel`
(marscf_main.py:326) with DDP/NCCL plumbing disabled (train.py:40-62,
SURVEY.md §2.5). TPU-native equivalent: one SPMD program over a
`jax.sharding.Mesh`; the batch axis shards over the `data` mesh axis,
parameters are replicated, and gradient reduction is an XLA `psum`
riding ICI. A `model` axis is carried for future tensor sharding.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, *, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over `data`."""
    return jax.device_put(batch, batch_sharding(mesh, np.ndim(batch)))
