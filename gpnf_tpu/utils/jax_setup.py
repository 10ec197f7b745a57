"""JAX runtime setup shared by the CLIs and benchmarks.

The build host has a single CPU core, so XLA compilation dominates cold
starts; a persistent compilation cache makes repeat invocations (benchmarks,
resumed training, tests) skip it.
"""
from __future__ import annotations

import os

import jax


def init_on_cpu(fn, *args, **kwargs):
    """Run a parameter-init function on the host CPU backend.

    Eager init executes hundreds of tiny ops; over a remote-TPU tunnel each
    op is a round trip. Running them on the local CPU and letting the first
    jitted call transfer the buffers turns minutes into milliseconds.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return fn(*args, **kwargs)


def setup(cache_dir: str | None = None):
    cache_dir = cache_dir or os.environ.get("GPNF_JAX_CACHE", "/tmp/gpnf_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older jax without the flags
        pass
