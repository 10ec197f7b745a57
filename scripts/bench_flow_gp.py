#!/usr/bin/env python
"""Composed flow->GP pipeline benchmark (VERDICT r4 item 1): one joint
NLML + gradient evaluation — mAR-SCF encode of n images, RBF Gram on the
flattened latents, blocked Cholesky/solve, grads through flow params AND
GP hypers — timed at n in {1024, 2048, 4096} on the default backend.

One JSON line per n. Measurement follows the round-3 protocol
(docs/BENCHMARKS.md): data-dependent rep chain with per-rep input
perturbations above the fp32 ulp (the axon tunnel result-caches pure-XLA
executions on identical inputs) and a single final readback.
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

    from gpnf_tpu.utils.jax_setup import setup, init_on_cpu, to_default_device
    setup()
    from gpnf_tpu.models.gp import (FlowGP, GPConfig, GPRegression,
                                    flow_feature_fn)
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    s = int(os.environ.get("FLOWGP_IMAGE", 16))
    cfg = MarScfConfig(image_shape=(s, s, 3), L=2,
                       K=int(os.environ.get("FLOWGP_K", 2)),
                       hidden_channels=int(os.environ.get("FLOWGP_C", 32)),
                       coupling=os.environ.get("FLOWGP_COUPLING", "affine"),
                       use_attention=os.environ.get("FLOWGP_ATTN", "0") == "1",
                       num_blocks=2, drop_prob=0.0, prior="gaussian")
    flow = MarScfFlow(cfg)
    rng = jax.random.PRNGKey(0)
    flow_params = to_default_device(init_on_cpu(flow.init, rng))
    feat = flow_feature_fn(flow)

    sizes = tuple(int(v) for v in os.environ.get(
        "FLOWGP_SIZES", "1024,2048,4096").split(","))
    reps = int(os.environ.get("FLOWGP_REPS", 20))
    rng_np = np.random.default_rng(0)

    for n in sizes:
        x = jnp.asarray(rng_np.uniform(-0.5, 0.5, (n, 3, s, s))
                        .astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal(n).astype(np.float32))

        z0 = feat(flow_params, x[: min(n, 512)])
        gp = GPRegression(GPConfig(ard=False), z0.shape[-1])
        fgp = FlowGP(feat, gp)
        gp_hyper = gp.init_from_data(rng, z0, y[: z0.shape[0]])
        joint = {"gp": gp_hyper, "flow": flow_params}

        @jax.jit
        def nlml_grad(joint, x, y):
            val, grads = jax.value_and_grad(fgp.joint_nlml)(joint, x, y)
            # fold the gradient into one scalar so the chain carries a
            # data-dependence on the WHOLE backward pass
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return val, gsum

        @jax.jit
        def perturb(x, v, c):
            # shift well above the fp32 ulp of [-0.5, 0.5] pixels
            return x + (1e-4 * c + 1e-12 * v)

        v, g = nlml_grad(joint, x, y)
        val0 = float(v)  # compile + complete
        float(nlml_grad(joint, perturb(x, v, jnp.float32(1.0)), y)[0])

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
                v, g = nlml_grad(joint, perturb(x, v + g, jnp.float32(k + 1)),
                                 y)
            float(v)
            rounds.append(time.time() - t0)
        dt = max(sorted(rounds)[1] - rtt, 1e-9) / reps
        print(json.dumps({
            "metric": f"flow_gp_joint_nlml_grad_n{n}",
            "ms": round(dt * 1e3, 3),
            "image": s, "feat_dim": int(z0.shape[-1]),
            "coupling": cfg.coupling,
            "backend": jax.default_backend(),
            "value_check": round(val0, 4)}), flush=True)


if __name__ == "__main__":
    main()
