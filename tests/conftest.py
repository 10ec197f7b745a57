"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); we convert its numeric
round-trip scripts into real pytest suites and add the multi-device fake
backend it lacked.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeat suite runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/gpnf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
