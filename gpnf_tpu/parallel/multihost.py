"""Multi-host (multi-slice) initialization and per-host data sharding.

The reference's DDP plumbing is disabled (train.py:40-62); the TPU-native
equivalent is `jax.distributed.initialize` + one global SPMD program whose
`data` mesh axis spans all hosts' local devices. Each host feeds only its
own shard; `jax.make_array_from_process_local_data` assembles the global
batch view.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Idempotent jax.distributed.initialize (env-driven when args omitted)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized / single-process
    return jax.process_index(), jax.process_count()


def global_mesh(model: int = 1):
    """Mesh over every device of every host; 'data' axis spans hosts."""
    return make_mesh(jax.devices(), model=model)


def shard_host_batch(mesh, local_batch: np.ndarray):
    """Assemble the global batch from this host's local shard.

    local_batch is this process's slice (global_batch / process_count rows);
    returns a global jax.Array sharded over the 'data' axis.
    """
    sharding = NamedSharding(mesh, P("data", *([None] * (local_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def host_shard_indices(n_items: int, seed: int, epoch: int):
    """Deterministic per-host partition of a dataset for this epoch."""
    rng = np.random.default_rng(seed + epoch)
    perm = rng.permutation(n_items)
    k = jax.process_count()
    per = n_items // k
    start = jax.process_index() * per
    return perm[start : start + per]
