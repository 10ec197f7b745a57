#!/usr/bin/env python
"""GP-after-flow regression CLI (the repo's titular capability, built fresh —
the reference contains no GP code, SURVEY.md §0).

Pipeline: [optionally] warp inputs through a trained/initialized flow, fit
exact GP hyperparameters by marginal likelihood, report NLML + held-out RMSE.
Uses the blocked (Pallas on TPU) Cholesky.
"""
import argparse

import numpy as np


def make_regression(n, d, noise, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3, 3, (n, d)).astype(np.float32)
    f = np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, min(1, d - 1)]) + 0.3 * x[:, 0] ** 2 / 3
    y = (f + rng.normal(0, noise, n)).astype(np.float32)
    return x, y


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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
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


if __name__ == "__main__":
    main()
