#!/usr/bin/env python
"""Break down mAR-SCF sampling time: AR prior scans vs flow-step inverses.

The reference's two sequential hot loops (SURVEY.md §3.2) are the ConvLSTM
per-channel sampling and the MixLogCDF bisection; this script times each in
isolation on the local accelerator.
"""
import os
import sys
import time

sys.path.insert(0, ".")


def timed(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.utils.jax_setup import setup, init_on_cpu, to_default_device
    setup()
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    batch = int(os.environ.get("BENCH_BATCH", 64))
    cfg = MarScfConfig(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                       coupling="mixlogcdf",
                       compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))
    model = MarScfFlow(cfg)
    params = to_default_device(init_on_cpu(model.init, jax.random.PRNGKey(0)))
    rng = jax.random.PRNGKey(1)

    # priors
    for level in (3, 2, 1):
        if level == cfg.L:
            fn = jax.jit(lambda p, r: model.prior.sample(p["prior"], r, cfg.L,
                                                         batch=batch))
            dt = timed(fn, params, rng)
        else:
            c, h, w = model.level_shapes[level - 1]
            z1 = jnp.zeros((batch, c // 2, h, w))
            fn = jax.jit(lambda p, r, z: model.prior.sample(p["prior"], r,
                                                            level, z1=z))
            dt = timed(fn, params, rng, z1)
        print(f"prior level {level} sample: {dt*1e3:8.1f} ms")

    # flow-step inverses per level (K steps scanned)
    for i in (2, 1, 0):
        c, h, w = model.level_shapes[i]
        z = jnp.zeros((batch, c, h, w))

        def inv(p, z, i=i):
            out, _ = model._run_level_steps(i, p["levels"][i]["steps"], z,
                                            jnp.zeros((batch,)), rng=None,
                                            train=False, inverse=True)
            return out

        dt = timed(jax.jit(inv), params, z)
        print(f"flow level {i+1} inverse (K={cfg.K}): {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
