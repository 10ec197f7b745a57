"""Invertible 1x1 convolution with PLU parameterization.

Reference: flow_modules/common_modules.py:57-127 and
models/modules/Permutations.py:25-58. TPU-first redesign:

- The reference inverts L and U *in float64 on the CPU* every reverse step
  (common_modules.py:108-110) — a host<->device round trip per FlowStep. Here
  the inverse weight is assembled on-device from two fp32 triangular solves
  against the identity; the PLU structure makes this exact and stable.
- logdet = sum(log|s|) * H * W. The reference multiplies by W*W
  (common_modules.py:86,104 — `pixels = input.size()[-1]` then `pixels*pixels`),
  which is correct only for square inputs; we use the correct H*W
  (SURVEY.md §2.1 "known quirks").
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .conv import conv2d


def _plu_init(key, n: int):
    """Random orthogonal matrix -> P,L,U factors (numpy, init-time only)."""
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).ravel())
    w = np.linalg.qr(rng.standard_normal((n, n)))[0].astype(np.float32)
    import scipy.linalg  # init-time only

    p, l, u = scipy.linalg.lu(w)
    s = np.diag(u)
    return (
        jnp.asarray(p),
        jnp.asarray(np.tril(l, -1)),
        jnp.asarray(np.triu(u, 1)),
        jnp.asarray(np.sign(s)),
        jnp.asarray(np.log(np.abs(s))),
    )


class InvConv1x1:
    """PLU-decomposed invertible 1x1 conv. `p` and `sign_s` are fixed buffers."""

    def __init__(self, num_channels: int):
        self.nc = num_channels
        self._eye = np.eye(num_channels, dtype=np.float32)

    def init(self, key):
        p, l, u, sign_s, log_s = _plu_init(key, self.nc)
        return {"p": p, "l": l, "u": u, "sign_s": sign_s, "log_s": log_s}

    def _factors(self, params):
        # p / sign_s are BUFFERS in the reference (common_modules.py:74-75,
        # register_buffer): never trained. stop_gradient keeps them exactly
        # fixed under any momentum optimizer (zero grad from step 0 => zero
        # Adamax update) — training p off a permutation / sign_s off +-1
        # would silently invalidate the sum(log_s) logdet. Caught by
        # tests/test_optim.py::test_adamax_trajectory_lockstep_vs_torch.
        p = jax.lax.stop_gradient(params["p"])
        sign_s = jax.lax.stop_gradient(params["sign_s"])
        eye = jnp.asarray(self._eye)
        l = jnp.tril(params["l"], -1) + eye
        u = jnp.triu(params["u"], 1) + jnp.diag(sign_s * jnp.exp(params["log_s"]))
        return p, l, u

    def _ldj(self, params, x):
        h, w = x.shape[2], x.shape[3]
        return jnp.sum(params["log_s"]) * (h * w)

    def forward(self, params, x, logdet, **_):
        p, l, u = self._factors(params)
        w = (p @ l @ u).astype(x.dtype)
        y = conv2d(x, w[:, :, None, None])
        return y, logdet + self._ldj(params, x)

    def inverse(self, params, y, logdet, **_):
        p, l, u = self._factors(params)
        eye = jnp.asarray(self._eye)
        l_inv = solve_triangular(l, eye, lower=True, unit_diagonal=True)
        u_inv = solve_triangular(u, eye, lower=False)
        w_inv = (u_inv @ l_inv @ p.T).astype(y.dtype)
        x = conv2d(y, w_inv[:, :, None, None])
        return x, logdet - self._ldj(params, y)
