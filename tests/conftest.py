"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); we convert its numeric
round-trip scripts into real pytest suites and add the multi-device fake
backend it lacked.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
