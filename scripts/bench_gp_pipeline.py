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

    import os

    rng = np.random.default_rng(0)
    p = 8
    sizes = tuple(int(s) for s in os.environ.get(
        "GP_SIZES", "256,512,1024,2048,4096").split(","))
    for n in sizes:
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

        # round-3 protocol: eager data-dependent rep chain + final scalar
        # readback (block_until_ready over the axon tunnel resolves on
        # enqueue-ACK, not execution), with per-rep DISTINCT input values —
        # the tunnel result-caches pure XLA executions on identical inputs
        # (measured: 100 reps of a chol-4096 pipeline in "0.0 ms" when the
        # perturbation collapsed below fp32 resolution). See
        # scripts/bench_cholesky.py for the full protocol notes.
        reps = 100  # chain-total >> the 30-100 ms readback RTT jitter
        step = jax.jit(lambda base, v, c: base + (c + 1e-12 * v)
                       * jnp.eye(base.shape[0], dtype=base.dtype))
        for name, fn in (("xla_native", nlml_xla), ("gpnf", nlml_gpnf)):
            fnj = jax.jit(fn)
            v = fnj(spd)
            val = float(v)              # compile + complete
            float(fnj(step(spd, v, jnp.float32(1e-2))))  # compile step
            rtts = []
            for _ in range(5):
                t0 = time.time()
                float(jnp.sum(y))
                rtts.append(time.time() - t0)
            rtt = sorted(rtts)[2]
            rounds = []
            for _ in range(3):
                t0 = time.time()
                for k in range(reps):
                    # the shift must beat the fp32 ulp of the diag (~n*2^-23)
                    v = fnj(step(spd, v, jnp.float32(1e-2 * (k + 1))))
                float(v)                # force the whole chain
                rounds.append(time.time() - t0)
            dt = max(sorted(rounds)[1] - rtt, 1e-9) / reps
            print(json.dumps({"metric": f"gp_nlml_pipeline_{name}_n{n}",
                              "ms": round(dt * 1e3, 3),
                              "value_check": round(val, 2)}), flush=True)


if __name__ == "__main__":
    main()
