"""Glow-style affine coupling and the learned-Gaussian Split2d.

Reference: flow_modules/affine_coupling.py (NN_net 68-80, AffineCoupling
94-131, Split2d 135-158). Scale is sigmoid(raw + 2), logdet = sum log scale.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import GaussianDiag, split_channels, sum_except_batch
from .conv import Conv2d, Conv2dZeros


class NNNet:
    """conv3x3(+actnorm) -> relu -> conv1x1(+actnorm) -> relu -> zero-init conv3x3."""

    def __init__(self, in_ch: int, out_ch: int, hidden_ch: int):
        self.conv1 = Conv2d(in_ch, hidden_ch, 3)
        self.conv2 = Conv2d(hidden_ch, hidden_ch, 1)
        self.conv3 = Conv2dZeros(hidden_ch, out_ch, 3)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2),
                "conv3": self.conv3.init(k3)}

    def apply(self, params, x):
        x = jax.nn.relu(self.conv1.apply(params["conv1"], x))
        x = jax.nn.relu(self.conv2.apply(params["conv2"], x))
        return self.conv3.apply(params["conv3"], x)

    def ddi(self, params, x):
        """Data-dependent init for the fused actnorms inside conv1/conv2."""
        p1, h = self.conv1.ddi(params["conv1"], x)
        h = jax.nn.relu(h)
        p2, h = self.conv2.ddi(params["conv2"], h)
        h = jax.nn.relu(h)
        out = self.conv3.apply(params["conv3"], h)
        return dict(params, conv1=p1, conv2=p2), out


class AffineCoupling:
    """z2' = sigmoid(scale+2) * z2 + shift, (shift, scale) = cross-split NN(z1)."""

    def __init__(self, in_ch: int, out_ch: int, hidden_ch: int):
        self.net = NNNet(in_ch // 2, out_ch, hidden_ch)

    def init(self, key):
        return {"net": self.net.init(key)}

    def _shift_scale(self, params, z1):
        y = self.net.apply(params["net"], z1)
        shift, scale = split_channels(y, "cross")
        return shift, jax.nn.sigmoid(scale + 2.0)

    def forward(self, params, x, logdet, **_):
        from .pallas.fused_coupling import fused_affine_forward

        z1, z2 = split_channels(x)
        y = self.net.apply(params["net"], z1)
        shift, raw = split_channels(y, "cross")
        # fused Pallas kernel on TPU (transform + logdet in one VMEM pass)
        b = z2.shape[0]
        z2f, ldj = fused_affine_forward(z2.reshape(b, -1), shift.reshape(b, -1),
                                        raw.reshape(b, -1))
        logdet = logdet + ldj
        return jnp.concatenate([z1, z2f.reshape(z2.shape)], axis=1), logdet

    def inverse(self, params, y, logdet, **_):
        z1, z2 = split_channels(y)
        shift, scale = self._shift_scale(params, z1)
        z2 = (z2 - shift) / scale
        logdet = logdet - sum_except_batch(jnp.log(scale))
        return jnp.concatenate([z1, z2], axis=1), logdet

    def ddi(self, params, x, logdet):
        z1, _ = split_channels(x)
        p_net, _ = self.net.ddi(params["net"], z1)
        params = dict(params, net=p_net)
        y, logdet = self.forward(params, x, logdet)
        return params, y, logdet


class Split2dGaussian:
    """Glow split with a learned conditional diagonal-Gaussian prior on z2.

    Reference: affine_coupling.py:135-158 — the factored prior used when the
    ConvLSTM channel-AR prior is disabled.
    """

    def __init__(self, num_channels: int):
        self.conv = Conv2dZeros(num_channels // 2, num_channels, 3)

    def init(self, key):
        return {"conv": self.conv.init(key)}

    def _prior(self, params, z1):
        h = self.conv.apply(params["conv"], z1)
        return split_channels(h, "cross")

    def forward(self, params, x, logdet, **_):
        z1, z2 = split_channels(x)
        mean, logs = self._prior(params, z1)
        logdet = logdet + GaussianDiag.logp(mean, logs, z2)
        return z1, logdet

    def inverse(self, params, z1, logdet, *, rng=None, eps_std=None, **_):
        mean, logs = self._prior(params, z1)
        z2 = GaussianDiag.sample(rng, mean, logs, eps_std)
        return jnp.concatenate([z1, z2], axis=1), logdet
