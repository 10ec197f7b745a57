#!/usr/bin/env python
"""GP-after-flow regression CLI — the repo's titular capability, built fresh
(the reference contains no GP code, SURVEY.md §0; composition spec from
BASELINE.json's north-star: "GP post-flow regression head ...
marginal-likelihood gradients").

Two modes:
  default        tabular synthetic regression, GP hypers by type-II MLE.
  --flow         the full composition: images -> mAR-SCF flow encode ->
                 exact GP on the flattened latents. Fits three models and
                 prints NLML trajectories + held-out RMSE for each:
                   raw      GP on flattened pixels (the baseline the flow
                            front-end must beat),
                   frozen   GP on features of a fixed flow,
                   joint    FlowGP.fit — marginal-likelihood gradients
                            through flow params AND GP hypers jointly.
                 The flow is a fresh ddi-initialized mAR-SCF by default;
                 --flow_pretrain_steps density-trains it on the inputs
                 first, --flow_checkpoint loads a train_marscf.py best
                 checkpoint (flags must match the trained config).

Uses the blocked (Pallas on TPU) Cholesky. Every optimization is a single
jitted lax.scan — no per-step dispatch over the TPU tunnel.
"""
import argparse
import time

import numpy as np


def make_regression(n, d, noise, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3, 3, (n, d)).astype(np.float32)
    f = np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, min(1, d - 1)]) + 0.3 * x[:, 0] ** 2 / 3
    y = (f + rng.normal(0, noise, n)).astype(np.float32)
    return x, y


def make_image_regression(n, size, noise, seed):
    """Images whose latent generative factors determine the target:
    oriented sinusoidal gratings; y = spatial frequency (+ noise). A GP
    on raw pixels must infer frequency from 3*size^2 correlated dims; the
    flow warp gives it a latent space adapted to the image manifold."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    freq = rng.uniform(1.0, 4.0, n).astype(np.float32)
    theta = rng.uniform(0, np.pi, n).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (n, 3)).astype(np.float32)
    grid = (np.cos(theta)[:, None, None] * xx[None]
            + np.sin(theta)[:, None, None] * yy[None])  # (n, S, S)
    img = 0.5 * np.sin(2 * np.pi * freq[:, None, None, None] * grid[:, None]
                       + phase[:, :, None, None])  # (n, 3, S, S) in [-.5,.5]
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    img = np.clip(img, -0.5, 0.5).astype(np.float32)
    y = (freq + rng.normal(0, noise, n)).astype(np.float32)
    return img, y


def run_tabular(args):
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.models.gp import GPConfig, GPRegression

    x, y = make_regression(args.n_train + args.n_test, args.dim, args.noise,
                           args.seed)
    x_tr, y_tr = jnp.asarray(x[: args.n_train]), jnp.asarray(y[: args.n_train])
    x_te, y_te = jnp.asarray(x[args.n_train :]), y[args.n_train :]

    gp = GPRegression(GPConfig(kernel=args.kernel, ard=True,
                               use_pallas_cholesky=False if args.no_pallas else None),
                      input_dim=args.dim)
    params = gp.init(jax.random.PRNGKey(args.seed))
    nlml0 = float(gp.neg_log_marginal_likelihood(params, x_tr, y_tr))
    params, nlml = gp.fit(params, x_tr, y_tr, steps=args.steps, lr=args.lr)
    mean, var = gp.posterior(params, x_tr, y_tr, x_te)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_te) ** 2)))
    inside = np.mean(np.abs(np.asarray(mean) - y_te)
                     <= 2 * np.sqrt(np.asarray(var)))
    print(f"kernel={args.kernel} N={args.n_train} D={args.dim} "
          f"backend={jax.default_backend()}")
    print(f"NLML: {nlml0:.4f} -> {nlml:.4f} | test RMSE {rmse:.4f} "
          f"| 2-sigma coverage {inside:.2%}")
    print(f"lengthscales {np.exp(np.asarray(params['log_lengthscale'])).round(3)} "
          f"noise {float(jnp.exp(params['log_noise'])):.4f}")


def _density_pretrain(model, params, x, steps, lr, seed):
    """Short full-batch density (bits/dim) training of the flow, one jitted
    lax.scan; mirrors the reference Adamax recipe at drive scale."""
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.training.optim import reference_adamax

    opt = reference_adamax(lr)
    opt_state = opt.init(params)

    @jax.jit
    def run(params, opt_state, x, rng):
        def body(carry, key):
            p, st = carry

            def loss_fn(p):
                _, nll = model.forward(p, x, rng=key, train=True)
                return jnp.mean(nll)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st = opt.update(grads, st, p)
            import optax
            return (optax.apply_updates(p, updates), st), loss

        keys = jax.random.split(rng, steps)
        (p, _), losses = jax.lax.scan(body, (params, opt_state), keys)
        return p, losses

    params, losses = run(params, opt_state, x, jax.random.PRNGKey(seed))
    return params, np.asarray(jax.device_get(losses))


def _fmt_traj(losses, k=5):
    idx = np.unique(np.linspace(0, len(losses) - 1, k).astype(int))
    return " -> ".join(f"{losses[i]:.4f}" for i in idx)


def run_flow(args):
    import jax
    import jax.numpy as jnp

    from gpnf_tpu.models.gp import (FlowGP, GPConfig, GPRegression,
                                    flow_feature_fn)
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    s = args.image_size
    imgs, y = make_image_regression(args.n_train + args.n_test, s, args.noise,
                                    args.seed)
    x_tr = jnp.asarray(imgs[: args.n_train])
    y_tr = jnp.asarray(y[: args.n_train])
    x_te = jnp.asarray(imgs[args.n_train :])
    y_te = y[args.n_train :]

    cfg = MarScfConfig(image_shape=(s, s, 3), L=args.flow_L, K=args.flow_K,
                       hidden_channels=args.flow_C,
                       coupling=args.flow_coupling,
                       use_attention=args.flow_attention,
                       num_blocks=2, drop_prob=0.0, prior="gaussian")
    flow = MarScfFlow(cfg)
    rng = jax.random.PRNGKey(args.seed)
    flow_params = to_default_device(init_on_cpu(flow.init, rng))
    if args.flow_checkpoint:
        from gpnf_tpu.training.checkpoints import CheckpointManager
        ckpt = CheckpointManager(args.flow_checkpoint)
        flow_params = ckpt.restore({"params": flow_params}, best=True)["params"]
        print(f"flow: restored checkpoint from {args.flow_checkpoint}")
    else:
        flow_params = flow.ddi(flow_params, x_tr[:256], jax.random.PRNGKey(1))
        if args.flow_pretrain_steps:
            t0 = time.time()
            flow_params, dlosses = _density_pretrain(
                flow, flow_params, x_tr[: min(args.n_train, 512)],
                args.flow_pretrain_steps, args.flow_pretrain_lr, args.seed)
            print(f"flow: density pretrain {args.flow_pretrain_steps} steps, "
                  f"bits/dim {_fmt_traj(dlosses)} "
                  f"({time.time() - t0:.1f}s)")

    feat = flow_feature_fn(flow)
    z_tr = feat(flow_params, x_tr)
    d_feat = z_tr.shape[-1]
    d_raw = int(np.prod(x_tr.shape[1:]))
    print(f"backend={jax.default_backend()} n_train={args.n_train} "
          f"image={s}x{s}x3 raw_dim={d_raw} flow_dim={d_feat} "
          f"flow=({args.flow_coupling} K={args.flow_K} C={args.flow_C} "
          f"L={args.flow_L} attn={args.flow_attention})")

    use_pallas = False if args.no_pallas else None
    results = {}

    # -- raw-pixel baseline ------------------------------------------------
    raw_gp = GPRegression(GPConfig(kernel=args.kernel, ard=False,
                                   use_pallas_cholesky=use_pallas), d_raw)
    x_tr_flat = x_tr.reshape(args.n_train, -1)
    x_te_flat = x_te.reshape(x_te.shape[0], -1)
    p_raw = raw_gp.init_from_data(rng, x_tr_flat, y_tr)
    t0 = time.time()
    nlml0 = float(raw_gp.neg_log_marginal_likelihood(p_raw, x_tr_flat, y_tr))
    p_raw, nlml_raw = raw_gp.fit(p_raw, x_tr_flat, y_tr, steps=args.steps,
                                 lr=args.lr)
    mean, _ = jax.jit(raw_gp.posterior)(p_raw, x_tr_flat, y_tr, x_te_flat)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_te) ** 2)))
    results["raw"] = (nlml0, nlml_raw, rmse, time.time() - t0)

    # -- flow features, frozen and joint ----------------------------------
    gp = GPRegression(GPConfig(kernel=args.kernel, ard=False,
                               use_pallas_cholesky=use_pallas), d_feat)
    fgp = FlowGP(feat, gp)
    p0 = {"gp": gp.init_from_data(rng, z_tr, y_tr)}

    # flow weights need a much smaller step than the log-scale GP hypers:
    # at the hypers' lr the warp outruns the hypers and the NLML diverges
    flow_lr = args.flow_lr if args.flow_lr is not None else args.lr * 0.1
    for mode, train_flow in (("frozen", False), ("joint", True)):
        t0 = time.time()
        p_gp, p_flow, losses = fgp.fit(
            p0, flow_params, x_tr, y_tr, steps=args.steps, lr=args.lr,
            flow_lr=flow_lr, train_flow=train_flow)
        mean, _ = jax.jit(fgp.posterior)(p_gp, p_flow, x_tr, y_tr, x_te)
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_te) ** 2)))
        results[mode] = (float(losses[0]), float(losses[-1]), rmse,
                         time.time() - t0)
        print(f"{mode:>6}: NLML {_fmt_traj(losses)}")

    print(f"{'model':>6} | {'NLML start':>10} | {'NLML end':>9} | "
          f"{'test RMSE':>9} | {'fit s':>6}")
    for mode in ("raw", "frozen", "joint"):
        n0, n1, rmse, dt = results[mode]
        print(f"{mode:>6} | {n0:10.4f} | {n1:9.4f} | {rmse:9.4f} | {dt:6.1f}")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=512)
    p.add_argument("--n_test", type=int, default=128)
    p.add_argument("--dim", type=int, default=4)
    p.add_argument("--kernel", default="rbf",
                   choices=["rbf", "matern12", "matern32", "matern52"])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--noise", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_pallas", action="store_true",
                   help="force the XLA blocked-Cholesky fallback")
    # flow-composition mode
    p.add_argument("--flow", action="store_true",
                   help="GP on mAR-SCF flow features (raw/frozen/joint)")
    p.add_argument("--image_size", type=int, default=16)
    p.add_argument("--flow_K", type=int, default=2)
    p.add_argument("--flow_C", type=int, default=32)
    p.add_argument("--flow_L", type=int, default=2)
    p.add_argument("--flow_coupling", default="affine",
                   choices=["affine", "mixlogcdf"])
    p.add_argument("--flow_attention", action="store_true")
    p.add_argument("--flow_lr", type=float, default=None,
                   help="joint-fit lr for the flow params (default: --lr)")
    p.add_argument("--flow_checkpoint", default=None,
                   help="train_marscf.py checkpoint dir (best ckpt restored)")
    p.add_argument("--flow_pretrain_steps", type=int, default=0,
                   help="density-pretrain the flow this many steps first")
    p.add_argument("--flow_pretrain_lr", type=float, default=1e-3)
    args = p.parse_args()

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()

    if args.flow:
        run_flow(args)
    else:
        run_tabular(args)


if __name__ == "__main__":
    main()
