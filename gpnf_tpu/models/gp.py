"""Exact Gaussian-process regression head on flow-warped features.

New capability per BASELINE.json north-star (the reference repo contains no
GP code despite its name — SURVEY.md §0): Gram matrix construction,
jittered blocked Cholesky factorize/solve, and marginal-likelihood training
via autodiff through the factorization. The flow front-end warps inputs into
a latent space where a stationary kernel is a better fit; features are the
flow's encode() output.

Numerics: fp32 on TPU with fp32 MXU accumulation; tests validate predictive
means against a float64 numpy reference to fp32 tolerance.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.cholesky import cholesky_blocked
from ..ops.pallas.trisolve import tril_solve
from . import register_model

LOG2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------
def _sqdist(x1, x2, lengthscale):
    a = x1 / lengthscale
    b = x2 / lengthscale
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


def rbf_kernel(x1, x2, *, lengthscale, variance):
    return variance * jnp.exp(-0.5 * _sqdist(x1, x2, lengthscale))


def matern12_kernel(x1, x2, *, lengthscale, variance):
    r = jnp.sqrt(_sqdist(x1, x2, lengthscale) + 1e-12)
    return variance * jnp.exp(-r)


def matern32_kernel(x1, x2, *, lengthscale, variance):
    r = jnp.sqrt(_sqdist(x1, x2, lengthscale) + 1e-12)
    s = math.sqrt(3.0) * r
    return variance * (1.0 + s) * jnp.exp(-s)


def matern52_kernel(x1, x2, *, lengthscale, variance):
    r2 = _sqdist(x1, x2, lengthscale)
    r = jnp.sqrt(r2 + 1e-12)
    s = math.sqrt(5.0) * r
    return variance * (1.0 + s + 5.0 * r2 / 3.0) * jnp.exp(-s)


KERNELS = {"rbf": rbf_kernel, "matern12": matern12_kernel,
           "matern32": matern32_kernel, "matern52": matern52_kernel}


# --------------------------------------------------------------------------
# Exact GP regression
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class GPConfig:
    kernel: str = "rbf"
    ard: bool = True  # per-dimension lengthscales
    jitter: float = 1e-6
    use_pallas_cholesky: Optional[bool] = None  # None = auto by backend
    # Triangular-solve backend, independent of the Cholesky flag: forcing
    # the XLA Cholesky must not also force XLA's scalar-loop solve.
    use_pallas_trisolve: Optional[bool] = None  # None = auto by backend


@register_model("gp")
class GPRegression:
    """Exact GP with learnable (log) lengthscale / variance / noise."""

    def __init__(self, cfg: GPConfig, input_dim: int):
        self.cfg = cfg
        self.kernel_fn = KERNELS[cfg.kernel]
        self.input_dim = input_dim

    def init(self, key):
        del key
        ls_shape = (self.input_dim,) if self.cfg.ard else (1,)
        return {
            "log_lengthscale": jnp.zeros(ls_shape),
            "log_variance": jnp.zeros(()),
            "log_noise": jnp.full((), -2.0),
        }

    def init_from_data(self, key, x, y):
        """Median-heuristic hyperparameter init: lengthscale from the median
        pairwise distance of x, variance/noise from var(y). Unit-scale
        defaults (init()) saturate the kernel when features live far apart —
        e.g. flow latents — leaving ~0 gradients everywhere; this puts the
        fit in the responsive regime from step 0."""
        params = self.init(key)
        d2 = _sqdist(x, x, jnp.ones((1,), x.dtype))
        n = x.shape[0]
        off = d2[jnp.triu_indices(n, k=1)]
        med = jnp.median(off)
        log_ls = 0.5 * jnp.log(jnp.maximum(med / 2.0, 1e-12))
        var_y = jnp.maximum(jnp.var(y), 1e-8)
        return {
            "log_lengthscale": jnp.full_like(params["log_lengthscale"], log_ls),
            "log_variance": jnp.log(var_y),
            "log_noise": jnp.log(0.1 * var_y),
        }

    def _hyper(self, params):
        return (jnp.exp(params["log_lengthscale"]),
                jnp.exp(params["log_variance"]),
                jnp.exp(params["log_noise"]))

    def gram(self, params, x1, x2=None):
        ls, var, _ = self._hyper(params)
        x2 = x1 if x2 is None else x2
        return self.kernel_fn(x1, x2, lengthscale=ls, variance=var)

    def _factorize(self, params, x):
        ls, var, noise = self._hyper(params)
        n = x.shape[0]
        k = self.kernel_fn(x, x, lengthscale=ls, variance=var)
        k = k + (noise + self.cfg.jitter) * jnp.eye(n, dtype=k.dtype)
        l = cholesky_blocked(k, use_pallas=self.cfg.use_pallas_cholesky)
        return l

    def _solve(self, l, b, *, trans=False):
        # blocked Newton-inverse solve (ops/pallas/trisolve.py) — measured
        # on par with XLA's native jitted solve (docs/BENCHMARKS.md, r3
        # honesty correction); kept as default for CPU/TPU grad parity and
        # compile-payload headroom at n >= 4096
        return tril_solve(l, b, trans=trans,
                          use_pallas=self.cfg.use_pallas_trisolve)

    def neg_log_marginal_likelihood(self, params, x, y):
        """-log p(y | X) / N. y: (N,) or (N, P) independent outputs."""
        # full fp32 matmul passes: TPU's default bf16 passes destroy the
        # conditioning of the Gram factorization
        with jax.default_matmul_precision("highest"):
            y2d = y[:, None] if y.ndim == 1 else y
            n, p = y2d.shape
            l = self._factorize(params, x)
            a = self._solve(l, y2d)
            quad = jnp.sum(a * a)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
            mll = -0.5 * quad - 0.5 * p * logdet - 0.5 * n * p * LOG2PI
            return -mll / (n * p)

    def posterior(self, params, x_train, y_train, x_test):
        """Predictive mean and marginal variance at x_test."""
        with jax.default_matmul_precision("highest"):
            y2d = y_train[:, None] if y_train.ndim == 1 else y_train
            l = self._factorize(params, x_train)
            k_star = self.gram(params, x_train, x_test)  # (N, M)
            alpha = self._solve(l, self._solve(l, y2d), trans=True)
            mean = k_star.T @ alpha
            v = self._solve(l, k_star)
            ls, var, noise = self._hyper(params)
            k_ss = var  # stationary kernels: k(x,x) = variance
            post_var = jnp.maximum(k_ss - jnp.sum(v * v, axis=0), 1e-12) + noise
            mean = mean[:, 0] if y_train.ndim == 1 else mean
            return mean, post_var

    def fit(self, params, x, y, *, steps: int = 200, lr: float = 0.05):
        """Type-II MLE of the hyperparameters via Adam on the NLML.

        One jitted lax.scan over all steps (a per-step python loop pays
        seconds of dispatch per step over the axon TPU tunnel)."""
        import optax

        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def run(params, opt_state, x, y):
            def body(carry, _):
                p, st = carry
                loss, grads = jax.value_and_grad(
                    self.neg_log_marginal_likelihood)(p, x, y)
                updates, st = opt.update(grads, st, p)
                return (optax.apply_updates(p, updates), st), loss

            (p, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=steps)
            return p, losses

        params, losses = run(params, opt_state, x, y)
        return params, float(losses[-1])


class FlowGP:
    """GP regression on flow-warped features: z = flow.encode(x) -> GP(z, y).

    The "pre-processing with normalising flows" composition the repo is named
    after. `feature_fn(flow_params, x) -> (N, D)` is typically the flattened
    final-level latent of a trained MarScfFlow.
    """

    def __init__(self, feature_fn: Callable, gp: GPRegression):
        self.feature_fn = feature_fn
        self.gp = gp

    def init(self, key):
        return {"gp": self.gp.init(key)}

    def nlml(self, params, flow_params, x, y):
        z = self.feature_fn(flow_params, x)
        return self.gp.neg_log_marginal_likelihood(params["gp"], z, y)

    def joint_nlml(self, joint, x, y):
        """NLML as a function of ONE pytree {"gp": ..., "flow": ...} so a
        single value_and_grad yields marginal-likelihood gradients w.r.t.
        the GP hyperparameters AND every flow parameter (BASELINE.json
        north-star: "marginal-likelihood gradients" through the warp)."""
        z = self.feature_fn(joint["flow"], x)
        return self.gp.neg_log_marginal_likelihood(joint["gp"], z, y)

    def posterior(self, params, flow_params, x_train, y_train, x_test):
        z_tr = self.feature_fn(flow_params, x_train)
        z_te = self.feature_fn(flow_params, x_test)
        return self.gp.posterior(params["gp"], z_tr, y_train, z_te)

    def fit(self, params, flow_params, x, y, *, steps: int = 100,
            lr: float = 0.02, flow_lr: Optional[float] = None,
            train_flow: bool = True):
        """JOINT type-II MLE: Adam on the NLML through both the GP
        hyperparameters and the flow parameters.

        The whole optimization is one jitted lax.scan — over the axon
        tunnel a per-step python loop would pay seconds of dispatch per
        step. Returns (gp_params, flow_params, nlml_trajectory).
        With train_flow=False the flow is frozen (optax.set_to_zero) so
        the same compiled program serves as the frozen-features baseline.
        """
        import numpy as np
        import optax

        joint = {"gp": params["gp"], "flow": flow_params}
        tx_flow = (optax.adam(lr if flow_lr is None else flow_lr)
                   if train_flow else optax.set_to_zero())
        opt = optax.multi_transform(
            {"gp": optax.adam(lr), "flow": tx_flow},
            param_labels={"gp": "gp", "flow": "flow"})
        opt_state = opt.init(joint)

        @jax.jit
        def run(joint, opt_state, x, y):
            def body(carry, _):
                jp, st = carry
                loss, grads = jax.value_and_grad(self.joint_nlml)(jp, x, y)
                updates, st = opt.update(grads, st, jp)
                jp = optax.apply_updates(jp, updates)
                return (jp, st), loss

            (jp, _), losses = jax.lax.scan(body, (joint, opt_state), None,
                                           length=steps)
            return jp, losses

        joint, losses = run(joint, opt_state, x, y)
        return ({"gp": joint["gp"]}, joint["flow"],
                np.asarray(jax.device_get(losses)))


def flow_feature_fn(model):
    """Feature extractor from a MarScfFlow: deterministic encode, flattened z.

    logdet follows x.dtype so the same feature map runs in float64 for the
    finite-difference gradient verification (tests/test_flow_gp.py)."""
    import jax.numpy as jnp

    def feature_fn(flow_params, x):
        logdet = jnp.zeros((x.shape[0],), x.dtype)
        z, _ = model.encode(flow_params, x, logdet)
        return z.reshape(z.shape[0], -1)

    return feature_fn
