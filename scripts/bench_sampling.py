#!/usr/bin/env python
"""Sampling (reverse-path) throughput for mAR-SCF — exercises the ConvLSTM
ancestral scan and the MixLogCDF bisection inverse (the reference's two
sequential hot loops, SURVEY.md §3.2)."""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    from gpnf_tpu.utils.jax_setup import setup, init_on_cpu, to_default_device
    setup()
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    batch = int(os.environ.get("BENCH_BATCH", 64))
    cfg = MarScfConfig(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                       coupling="mixlogcdf",
                       compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                       prior_scan_unroll=int(
                           os.environ.get("BENCH_PRIOR_UNROLL", 0)))
    model = MarScfFlow(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))

    sample = jax.jit(lambda p, r: model.sample(p, r, batch=batch, eps_std=1.0))
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    xs = sample(params, rng)
    jax.block_until_ready(xs)
    compile_s = time.time() - t0

    reps = int(os.environ.get("BENCH_REPS", 10))
    # pre-split keys on device: the timed loop issues pure async dispatches
    # with no eager tunnel ops between them (a host-side split per rep costs
    # an RTT each over the axon tunnel)
    subs = jax.random.split(rng, reps)
    jax.block_until_ready(subs)
    import jax.numpy as jnp

    reduce = jax.jit(jnp.sum)
    t0 = time.time()
    for i in range(reps):
        xs = sample(params, subs[i])
    # true host readback (execution is in-order, so reading the LAST
    # dispatch's data implies the whole loop completed; block_until_ready
    # alone resolves on tunnel enqueue-ACK — docs/BENCHMARKS.md protocol)
    float(reduce(xs))
    dt = (time.time() - t0) / reps

    # multi-batch chaining: `reps` sample batches inside ONE dispatch (keys
    # consumed on device), so the axon-tunnel RTT is paid once — this is the
    # pure DEVICE throughput a local host would see (VERDICT r2 item 9).
    def chained(p, keys):
        def body(i, _):
            return jnp.sum(model.sample(p, keys[i], batch=batch,
                                        eps_std=1.0))
        return jax.lax.fori_loop(0, reps, body, 0.0)

    chained_j = jax.jit(chained)
    float(chained_j(params, subs))  # compile + readback
    t0 = time.time()
    float(chained_j(params, subs))  # host readback = real completion
    dt_dev = (time.time() - t0) / reps

    print(json.dumps({"metric": "cifar10_mixlogcdf_K4_C96_sampling",
                      "value": round(batch / dt, 2), "unit": "images/sec/chip",
                      "sample_ms": round(dt * 1e3, 1),
                      "device_img_s": round(batch / dt_dev, 2),
                      "device_ms": round(dt_dev * 1e3, 1),
                      "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
