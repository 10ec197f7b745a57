"""Spatial parallelism: shard the image HEIGHT axis over a mesh axis with
halo exchange, so convolutional SR models run on images too large for one
chip (and inference latency scales with the spatial mesh).

The reference has no spatial/sequence parallelism (SURVEY.md §2.5); its SR
path (`test.py:75-88`) center-pads one image onto one GPU. The TPU-native
design: one SPMD program over a mesh axis `sp`; every stride-1 SAME conv
exchanges `(k-1)//2 * dilation` boundary rows with its mesh neighbors via
`jax.lax.ppermute` riding ICI, then convolves VALID on H. Devices at the
image border receive ZEROS from the missing neighbor — exactly SAME
zero-padding — so the sharded forward is bit-compatible with the
single-device one (pinned by tests/test_spatial.py).

Mechanism: `ops.conv.conv2d` consults a module-level context
(`spatial_axis(...)`), so the whole RRDB/SR stack becomes halo-aware
without threading a flag through every layer. Elementwise ops, 1x1 convs,
nearest 2x upsampling, and aligned 2x average pooling are all local to an
H-shard and need no communication.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

# active spatial-sharding context: (axis_name,) or None. Set only inside a
# shard_map body — plain (unsharded) calls never see it.
_SP_AXIS: Optional[str] = None


def current_spatial_axis() -> Optional[str]:
    return _SP_AXIS


@contextmanager
def spatial_axis(axis_name: str):
    """Mark the enclosed (shard_map-local) computation as H-sharded over
    `axis_name`; ops.conv.conv2d inserts halo exchanges while active."""
    global _SP_AXIS
    prev, _SP_AXIS = _SP_AXIS, axis_name
    try:
        yield
    finally:
        _SP_AXIS = prev


def halo_pad_h(x: jax.Array, axis_name: str, halo: int,
               layout: str = "NCHW") -> jax.Array:
    """Concatenate `halo` boundary rows from the previous/next H-shard.

    Border shards get zeros for the missing neighbor (ppermute semantics),
    which equals SAME zero-padding of the full image.
    """
    if halo <= 0:
        return x
    n = jax.lax.axis_size(axis_name)
    h_axis = 2 if layout == "NCHW" else 1
    h_local = x.shape[h_axis]
    assert h_local >= halo, (h_local, halo)
    top = jax.lax.slice_in_dim(x, 0, halo, axis=h_axis)
    bot = jax.lax.slice_in_dim(x, h_local - halo, h_local, axis=h_axis)
    from_prev = jax.lax.ppermute(bot, axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    from_next = jax.lax.ppermute(top, axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_prev, x, from_next], axis=h_axis)


def make_sp_mesh(devices: Optional[Sequence] = None, *, sp: Optional[int] = None,
                 data: int = 1) -> Mesh:
    """(data, sp) mesh: batch over `data`, image height over `sp`."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sp is None:
        sp = n // data
    assert data * sp == n, (data, sp, n)
    return Mesh(np.asarray(devices).reshape(data, sp), axis_names=("data", "sp"))


def sp_apply(fn, mesh: Mesh, *, layout: str = "NCHW", axis: str = "sp",
             data_axis: Optional[str] = "data"):
    """Wrap `fn(params, x) -> y` (same H in and out, e.g. an SR trunk at LR
    resolution, or H_out = s*H_local for an upsampling net) into an SPMD
    program with x/y H-sharded over `axis` (+ batch over `data_axis`).

    Returns a jitted function of (params, x) taking the FULL array; GSPMD
    moves shards, the shard_map body runs `fn` locally with halo-aware convs.
    """
    from .train_step import shard_map  # version-compat wrapper

    h_axis = 2 if layout == "NCHW" else 1
    spec = [None] * 4
    spec[h_axis] = axis
    if data_axis is not None:
        spec[0] = data_axis
    xspec = P(*spec)

    def local(params, x):
        with spatial_axis(axis):
            return fn(params, x)

    sharded = shard_map(local, mesh=mesh, in_specs=(P(), xspec),
                        out_specs=xspec)
    return jax.jit(sharded)
