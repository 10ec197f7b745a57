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


def to_default_device(tree):
    """One bulk transfer of a CPU-initialized pytree to the default device.

    Arrays committed to the CPU backend are re-transferred on EVERY jitted
    call that consumes them (over a TPU tunnel: seconds per call). Call this
    once after `init_on_cpu` when the params will be reused across calls
    without flowing through a donating train step.
    """
    dev = jax.devices()[0]
    return jax.device_put(tree, dev)


def setup(cache_dir: str | None = None, prng_impl: str | None = "rbg"):
    """Compile cache + fast PRNG.

    prng_impl="rbg": dropout dominates threefry cost in the MixLogCDF nets
    (~24% of a train step at batch 256; rbg recovers a third of it). Same
    distributions, different stream — pass None to keep jax's default.
    """
    if os.environ.get("GPNF_FORCE_CPU", "0") == "1":
        # run the drive on the host CPU (the axon plugin overrides
        # JAX_PLATFORMS, so this must go through jax.config BEFORE backend
        # init). Used when the TPU is held by another client — two
        # concurrent tunnel clients deadlock (CLAUDE.md).
        cache_dir = cache_dir or os.environ.get(
            "GPNF_JAX_CACHE", "/tmp/gpnf_jax_cache_cpu")
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices",
                              int(os.environ.get("GPNF_CPU_DEVICES", "1")))
        except RuntimeError:
            pass
        if jax.default_backend() != "cpu":  # backend was already live
            raise RuntimeError(
                "GPNF_FORCE_CPU=1 but the backend initialized as "
                f"{jax.default_backend()!r} before setup() ran — refusing "
                "to open a second TPU tunnel client (CLAUDE.md: two "
                "concurrent clients deadlock). Call setup() before any "
                "jax use.")
    cache_dir = cache_dir or os.environ.get("GPNF_JAX_CACHE", "/tmp/gpnf_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older jax without the flags
        pass
    if prng_impl and os.environ.get("GPNF_PRNG", prng_impl) != "default":
        try:
            jax.config.update("jax_default_prng_impl",
                              os.environ.get("GPNF_PRNG", prng_impl))
        except Exception:  # noqa: BLE001
            pass
