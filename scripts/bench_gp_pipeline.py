#!/usr/bin/env python
"""GP marginal-likelihood pipeline benchmark: Cholesky + triangular solve +
logdet, comparing XLA-native linalg against the gpnf blocked Pallas solve
(ops/pallas/trisolve.py). One JSON line per (n, impl)."""
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
    from gpnf_tpu.ops.pallas.cholesky import cholesky_blocked
    from gpnf_tpu.ops.pallas.trisolve import tril_solve

    rng = np.random.default_rng(0)
    p = 8
    for n in (256, 512, 1024):
        a = rng.standard_normal((n, n)).astype(np.float32)
        spd = jnp.asarray(a @ a.T + n * np.eye(n, dtype=np.float32))
        y = jnp.asarray(rng.standard_normal((n, p)).astype(np.float32))

        def nlml_xla(k):
            l = jnp.linalg.cholesky(k)
            al = jax.scipy.linalg.solve_triangular(l, y, lower=True)
            return jnp.sum(al * al) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))

        def nlml_gpnf(k):
            l = cholesky_blocked(k)  # auto: native chol on TPU
            al = tril_solve(l, y)    # auto: Pallas blocked solve on TPU
            return jnp.sum(al * al) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))

        reps = 20
        for name, fn in (("xla_native", nlml_xla), ("gpnf", nlml_gpnf)):
            def chained(k0):
                def body(_, k):
                    v = fn(k)
                    return k + (1e-20 * v) * jnp.eye(n, dtype=k.dtype)
                return jax.lax.fori_loop(0, reps, body, k0)

            run = jax.jit(chained)
            jax.block_until_ready(run(spd))
            t0 = time.time()
            jax.block_until_ready(run(spd))
            dt = (time.time() - t0) / reps
            val = float(fn(spd))
            print(json.dumps({"metric": f"gp_nlml_pipeline_{name}_n{n}",
                              "ms": round(dt * 1e3, 3),
                              "value_check": round(val, 2)}))


if __name__ == "__main__":
    main()
