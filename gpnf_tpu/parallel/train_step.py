"""Data-parallel train/eval step builders (shard_map + psum over ICI).

TPU-native replacement for the reference's `nn.DataParallel` scatter/gather
(marscf_main.py:326) and disabled DDP/NCCL path (train.py:40-62): a single
SPMD program; each device computes grads on its batch shard, `pmean` reduces
them over the `data` axis, and the optimizer update runs replicated.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def shard_map(f, *, mesh, in_specs, out_specs):
    """Version-compat shard_map with replication checking off (psum'd outputs
    are replicated by construction; the checker can't always prove it)."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as legacy
        return legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_rep=False)


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """loss_fn(params, batch, rng) -> scalar loss (per-shard mean).

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, loss).
    With a mesh, the batch must be sharded over the 'data' axis (its leading
    dim divisible by the axis size); rng is replicated and folded with the
    device index so dequantization/dropout noise differs per shard.
    """

    def _update(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    if mesh is None:
        @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            params, opt_state = _update(params, opt_state, grads)
            return params, opt_state, loss

        return step

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data"), P()),
             out_specs=(P(), P(), P()))
    def sharded_step(params, opt_state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        grads = jax.lax.pmean(grads, "data")  # psum/n over ICI
        loss = jax.lax.pmean(loss, "data")
        params, opt_state = _update(params, opt_state, grads)
        return params, opt_state, loss

    return jax.jit(sharded_step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(metric_fn: Callable, mesh: Optional[Mesh] = None):
    """metric_fn(params, batch, rng) -> (B,) per-sample metric; returns mean."""
    if mesh is None:
        @jax.jit
        def step(params, batch, rng):
            return jnp.mean(metric_fn(params, batch, rng))

        return step

    @partial(shard_map, mesh=mesh, in_specs=(P(), P("data"), P()),
             out_specs=P())
    def sharded_eval(params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return jax.lax.pmean(jnp.mean(metric_fn(params, batch, rng)), "data")

    return jax.jit(sharded_eval)
