"""Tensor-parallel training via GSPMD parameter sharding.

The reference has no tensor parallelism (SURVEY.md §2.5); this is the
TPU-native scale-out story beyond pure data parallel: large parameters are
sharded over the `model` mesh axis with NamedShardings and XLA's GSPMD
partitioner inserts the all-gathers/reduce-scatters around the convs and
matmuls. Optimizer state inherits the same layout, so memory for params,
grads, and moments all scales down with the model axis.
"""
from __future__ import annotations

from typing import Callable

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_spec(x, model_size: int, *, min_size: int = 1 << 15) -> P:
    """Shard the largest eligible axis over 'model'; replicate small leaves."""
    shape = np.shape(x)
    if model_size <= 1 or len(shape) == 0 or np.prod(shape) < min_size:
        return P()
    for axis in sorted(range(len(shape)), key=lambda a: -shape[a]):
        if shape[axis] % model_size == 0 and shape[axis] >= 2 * model_size:
            spec = [None] * len(shape)
            spec[axis] = "model"
            return P(*spec)
    return P()


def tree_shardings(tree, mesh: Mesh, *, min_size: int = 1 << 15):
    m = int(mesh.shape["model"])
    return jax.tree.map(
        lambda x: NamedSharding(mesh, leaf_spec(x, m, min_size=min_size)), tree)


def shard_tree(tree, mesh: Mesh, *, min_size: int = 1 << 15):
    """Place a pytree according to its inferred tensor-parallel layout."""
    return jax.tree.map(jax.device_put, tree, tree_shardings(tree, mesh,
                                                             min_size=min_size))


def make_tp_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                       mesh: Mesh, params, opt_state, *, donate: bool = True,
                       min_size: int = 1 << 15):
    """dp x tp train step: batch over 'data', params over 'model' (GSPMD).

    Returns (step, params, opt_state) with inputs re-placed to their sharded
    layouts. loss_fn(params, batch, rng) -> scalar.
    """
    param_sh = tree_shardings(params, mesh, min_size=min_size)
    opt_sh = tree_shardings(opt_state, mesh, min_size=min_size)
    batch_sh = NamedSharding(mesh, P("data", None, None, None))
    rep = NamedSharding(mesh, P())

    params = jax.tree.map(jax.device_put, params, param_sh)
    opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)

    def _step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(_step,
                   in_shardings=(param_sh, opt_sh, batch_sh, rep),
                   out_shardings=(param_sh, opt_sh, rep),
                   donate_argnums=(0, 1) if donate else ())
    return step, params, opt_state
