#!/usr/bin/env python
"""Blocked-Cholesky throughput (GFLOP/s) — the BASELINE.json tracked metric.

Compares the fused Pallas kernel against XLA's native cholesky on the local
accelerator across sizes. Prints one JSON line per size.
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpnf_tpu.utils.jax_setup import setup
    setup()
    from gpnf_tpu.ops.pallas.cholesky import (cholesky_blocked,
                                              pallas_cholesky,
                                              pallas_cholesky_hbm)

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    import os
    sizes = tuple(int(s) for s in os.environ.get(
        "CHOL_SIZES", "256,512,1024,2048,4096,8192").split(","))
    for n in sizes:
        a = rng.standard_normal((n, n)).astype(np.float32)
        spd = jnp.asarray(a @ a.T + n * np.eye(n, dtype=np.float32))

        impls = {"xla_native": jax.jit(jnp.linalg.cholesky)}
        if on_tpu:
            if n < 2048:
                impls["pallas_fused"] = jax.jit(pallas_cholesky)
            else:
                impls["pallas_hbm"] = jax.jit(pallas_cholesky_hbm)
        else:
            impls["blocked_xla"] = jax.jit(
                lambda m: cholesky_blocked(m, use_pallas=False))

        reps = max(3, min(50, (2048 // n) * 12 + 3))

        def chained(fn):
            # remote-tunnel-safe timing: data-dependent chain of `reps`
            # factorizations inside ONE dispatch, so neither async dispatch
            # nor per-call RTT pollutes the measurement
            def body(_, a):
                l = fn(a)
                return spd + 1e-12 * l
            return jax.jit(lambda a: jax.lax.fori_loop(0, reps, body, a))

        for name, fn in impls.items():
            run = chained(fn)
            jax.block_until_ready(run(spd))
            t0 = time.time()
            jax.block_until_ready(run(spd))
            dt = (time.time() - t0) / reps
            l = fn(spd)
            gflops = (n**3 / 3) / dt / 1e9
            err = float(jnp.max(jnp.abs(l @ l.T - spd))) / n
            print(json.dumps({"metric": f"cholesky_{name}_n{n}",
                              "value": round(gflops, 2), "unit": "GFLOP/s",
                              "ms": round(dt * 1e3, 3),
                              "rel_err": f"{err:.2e}"}))


if __name__ == "__main__":
    main()
