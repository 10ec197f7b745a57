#!/usr/bin/env python
"""Blocked-Cholesky throughput (GFLOP/s) — the BASELINE.json tracked metric.

Compares the fused Pallas kernels against XLA's native cholesky on the local
accelerator across sizes. Prints one JSON line per size+impl.

Measurement protocol (round 3): eager DATA-DEPENDENT rep chain (each input
is the previous output perturbed, so nothing can be elided or overlapped)
finished by a SCALAR HOST READBACK, minus a separately-measured readback
RTT. This is the only protocol that measures device execution over the axon
tunnel: `jax.block_until_ready` there resolves on server enqueue-ACK, not
completion (measured: "0.05 ms" n=8192 factorizations), and chaining reps
inside one jitted fori_loop both hits the remote-compile payload limit at
large n and measured ~2x slower than reality for XLA's expander at n=4096
(11.4 vs 5.5 ms, docs/BENCHMARKS.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpnf_tpu.utils.jax_setup import setup
    setup()
    from gpnf_tpu.ops.pallas.cholesky import (_chol_recursive_tpu,
                                              cholesky_blocked,
                                              pallas_cholesky,
                                              pallas_cholesky_hbm)

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    pick = jax.jit(lambda x: x[0, 0])
    pert = jax.jit(lambda base, prev, s: base + s * prev)

    def timeit(fn, spd, reps):
        """Median of 3 rounds; reps sized by the caller so the chain's
        execution total (reps x exec) dwarfs the 30-100 ms RTT jitter of
        the single end readback."""
        out = fn(spd)
        float(pick(out))  # compile + complete
        float(pick(pert(spd, out, jnp.float32(1e-3))))
        rtts = []
        for _ in range(5):
            t0 = time.time()
            float(pick(spd))
            rtts.append(time.time() - t0)
        rtt = sorted(rtts)[2]
        rounds = []
        for _ in range(3):
            t0 = time.time()
            for k in range(reps):
                # scale must beat fp32 resolution of the spd entries
                # (diag ~ n, eps ~ n*2^-23) or inputs are BIT-IDENTICAL and
                # the tunnel can serve repeat executions from cache
                out = fn(pert(spd, out, jnp.float32(1e-3 * (k % 7 + 1))))
            float(pick(out))  # forces the whole chain to really execute
            rounds.append(time.time() - t0)
        dt = sorted(rounds)[1]
        return max(dt - rtt, 1e-9) / reps, out

    sizes = tuple(int(s) for s in os.environ.get(
        "CHOL_SIZES", "256,512,1024,2048,4096,8192").split(","))
    for n in sizes:
        a = rng.standard_normal((n, n)).astype(np.float32)
        spd = jnp.asarray(a @ a.T + n * np.eye(n, dtype=np.float32))

        impls = {"xla_native": jax.jit(jnp.linalg.cholesky)}
        if on_tpu:
            if n <= 2048:
                impls["pallas_fused"] = jax.jit(pallas_cholesky)
            if 2048 <= n <= 4096:
                impls["pallas_hbm"] = jax.jit(pallas_cholesky_hbm)
                # mixed precision: trailing GEMMs at 3-pass bf16x3 (2x MXU
                # rate), panel/diag HIGHEST — the r4 lever for the n>=4096
                # regime where XLA's near-peak trailing GEMMs win
                impls["pallas_hbm_mixed"] = jax.jit(
                    lambda m: pallas_cholesky_hbm(m,
                                                  trailing_precision="high"))
            if n == 4096:
                # wider panel under the 64 MB scoped budget
                impls["pallas_hbm_P512"] = jax.jit(
                    lambda m: pallas_cholesky_hbm(m, panel_width=512))
                impls["pallas_hbm_mixed_P512"] = jax.jit(
                    lambda m: pallas_cholesky_hbm(m, panel_width=512,
                                                  trailing_precision="high"))
            if n > 4096:
                # host-level recursion (5 async dispatches/level); cannot
                # run under an outer jit (remote-compile payload limit)
                impls["pallas_hbm_xl"] = _chol_recursive_tpu
        else:
            impls["blocked_xla"] = jax.jit(
                lambda m: cholesky_blocked(m, use_pallas=False))

        # total chain execution must dwarf RTT jitter: ~>=400 ms per round
        reps = {256: 200, 512: 200, 1024: 150, 2048: 100,
                4096: 40}.get(n, 12)
        for name, fn in impls.items():
            try:
                dt, _ = timeit(fn, spd, reps)
                gflops = (n**3 / 3) / dt / 1e9
                # accuracy check on the UNPERTURBED input (the timing chain's
                # last output is a factor of spd + perturbation, whose
                # residual would mask real kernel error)
                l = fn(spd)
                err = float(jnp.max(jnp.abs(l @ l.T - spd))) / n
                print(json.dumps({"metric": f"cholesky_{name}_n{n}",
                                  "value": round(gflops, 2),
                                  "unit": "GFLOP/s",
                                  "ms": round(dt * 1e3, 3),
                                  "rel_err": f"{err:.2e}"}), flush=True)
            except Exception as e:  # e.g. remote-compile payload limit
                print(json.dumps({"metric": f"cholesky_{name}_n{n}",
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
