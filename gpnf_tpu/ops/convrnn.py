"""Convolutional RNN library: Conv{1,2,3}d x {RNN, LSTM, GRU, PeepholeLSTM}.

Re-design of mar_prior/convolutional_rnn/ (module.py, functional.py): the
reference runs a Python loop over time steps (functional.py:144-160); here
the recurrence is a single `lax.scan`, and the input-to-hidden convolution
for the whole sequence is hoisted out of the scan and executed as one big
batched conv (B*T merged) so the MXU sees large matmuls
(SURVEY.md §7.1 "ConvLSTM prior as lax.scan").

Gate math matches functional.py:30-97 (LSTM/GRU/Peephole cells); "same"
padding matches ConvNdWithSamePadding (functional.py:248-275): for stride 1,
total pad d*(k-1) split floor/ceil.

Layout: sequences are (B, T, C, *spatial), batch-first like the reference's
`batch_first=True` usage (lstm.py:16).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

GATE_COUNT = {"RNN_TANH": 1, "RNN_RELU": 1, "LSTM": 4, "GRU": 3, "PeepholeLSTM": 4}


def _same_pad(k: int, d: int) -> Tuple[int, int]:
    total = d * (k - 1)
    return (total // 2, total - total // 2)


def _convnd(x, w, b=None, *, dilation=1, ndim=2):
    """N-d conv with reference-matching same padding; x (B, C, *sp), w (O, I, *k)."""
    k = w.shape[2:]
    dil = (dilation,) * ndim if isinstance(dilation, int) else tuple(dilation)
    pads = [_same_pad(kk, dd) for kk, dd in zip(k, dil)]
    spec = {1: ("NCH", "OIH", "NCH"), 2: ("NCHW", "OIHW", "NCHW"),
            3: ("NCDHW", "OIDHW", "NCDHW")}[ndim]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,) * ndim, padding=pads, rhs_dilation=dil,
        dimension_numbers=spec, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * ndim)
    return y.astype(x.dtype)


class ConvRNN:
    """Stacked unidirectional/bidirectional convolutional RNN.

    Hidden state: LSTM/PeepholeLSTM -> (h, c) each of shape
    (num_layers*num_directions, B, out_ch, *spatial); others -> h only.
    """

    def __init__(self, mode: str, in_channels: int, out_channels: int,
                 kernel_size, *, num_layers: int = 1, bidirectional: bool = False,
                 dilation=1, dropout: float = 0.0, ndim: int = 2):
        assert mode in GATE_COUNT, mode
        self.mode = mode
        self.in_ch, self.out_ch = in_channels, out_channels
        self.k = (kernel_size,) * ndim if isinstance(kernel_size, int) else tuple(kernel_size)
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.num_directions = 2 if bidirectional else 1
        self.dilation = dilation
        self.dropout = dropout
        self.ndim = ndim
        self.gate_size = GATE_COUNT[mode] * out_channels

    def init(self, key):
        layers = []
        stdv = 1.0 / jnp.sqrt(self.out_ch)
        n_per = 7 if self.mode == "PeepholeLSTM" else 4
        keys = jax.random.split(key, self.num_layers * self.num_directions * n_per)
        ki = iter(range(len(keys)))

        def u(shape):
            return jax.random.uniform(keys[next(ki)], shape, minval=-stdv, maxval=stdv)

        for layer in range(self.num_layers):
            for _ in range(self.num_directions):
                in_ch = self.in_ch if layer == 0 else self.out_ch * self.num_directions
                p = {
                    "w_ih": u((self.gate_size, in_ch, *self.k)),
                    "w_hh": u((self.gate_size, self.out_ch, *self.k)),
                    "b_ih": u((self.gate_size,)),
                    "b_hh": u((self.gate_size,)),
                }
                if self.mode == "PeepholeLSTM":
                    p["w_pi"] = u((self.out_ch, self.out_ch, *self.k))
                    p["w_pf"] = u((self.out_ch, self.out_ch, *self.k))
                    p["w_po"] = u((self.out_ch, self.out_ch, *self.k))
                layers.append(p)
        return {"layers": layers}

    # -- single-step cell (used by AR samplers) -----------------------------
    def cell(self, lp, igate, state):
        """One recurrence step. igate = conv(x_t, w_ih) + b_ih, precomputed."""
        mode = self.mode
        if mode in ("LSTM", "PeepholeLSTM"):
            h, c = state
            gates = igate + _convnd(h, lp["w_hh"], lp["b_hh"],
                                    dilation=self.dilation, ndim=self.ndim)
            i, f, g, o = jnp.split(gates, 4, axis=1)
            if mode == "PeepholeLSTM":
                i = i + _convnd(c, lp["w_pi"], dilation=self.dilation, ndim=self.ndim)
                f = f + _convnd(c, lp["w_pf"], dilation=self.dilation, ndim=self.ndim)
            i, f, g = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g)
            c_new = f * c + i * g
            if mode == "PeepholeLSTM":
                o = o + _convnd(c_new, lp["w_po"], dilation=self.dilation, ndim=self.ndim)
            o = jax.nn.sigmoid(o)
            h_new = o * jnp.tanh(c_new)
            return h_new, (h_new, c_new)
        if mode == "GRU":
            h = state
            gi = igate
            gh = _convnd(h, lp["w_hh"], lp["b_hh"], dilation=self.dilation, ndim=self.ndim)
            i_r, i_i, i_n = jnp.split(gi, 3, axis=1)
            h_r, h_i, h_n = jnp.split(gh, 3, axis=1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_i + h_i)
            n = jnp.tanh(i_n + r * h_n)
            h_new = n + z * (h - n)
            return h_new, h_new
        # vanilla RNN
        h = state
        pre = igate + _convnd(h, lp["w_hh"], lp["b_hh"], dilation=self.dilation,
                              ndim=self.ndim)
        h_new = jnp.tanh(pre) if mode == "RNN_TANH" else jax.nn.relu(pre)
        return h_new, h_new

    def input_gates(self, lp, x_seq):
        """Hoisted input->gates conv over the whole sequence: (B,T,C,*sp)."""
        b, t = x_seq.shape[:2]
        flat = x_seq.reshape(b * t, *x_seq.shape[2:])
        g = _convnd(flat, lp["w_ih"], lp["b_ih"], dilation=self.dilation, ndim=self.ndim)
        return g.reshape(b, t, *g.shape[1:])

    def _zero_state(self, batch, spatial, dtype):
        shape = (batch, self.out_ch, *spatial)
        h = jnp.zeros(shape, dtype)
        if self.mode in ("LSTM", "PeepholeLSTM"):
            return (h, jnp.zeros(shape, dtype))
        return h

    def _layer_scan(self, lp, x_seq, state, reverse=False):
        igates = self.input_gates(lp, x_seq)  # (B, T, G, *sp)
        igates_t = jnp.swapaxes(igates, 0, 1)  # scan over time axis

        def step(carry, ig):
            out, new_carry = self.cell(lp, ig, carry)
            return new_carry, out

        state, outs = jax.lax.scan(step, state, igates_t, reverse=reverse)
        return jnp.swapaxes(outs, 0, 1), state

    def apply(self, params, x_seq, hidden=None, *, rng=None, train=False):
        """x_seq (B, T, C, *sp) -> (out_seq (B, T, out_ch*dirs, *sp), hidden).

        `hidden` packs per-(layer, direction) states in reference order; pass
        the returned value back in to continue a sequence (AR sampling).
        """
        b = x_seq.shape[0]
        spatial = x_seq.shape[3:]
        lstm = self.mode in ("LSTM", "PeepholeLSTM")
        if hidden is None:
            states = [self._zero_state(b, spatial, x_seq.dtype)
                      for _ in range(self.num_layers * self.num_directions)]
        else:
            if lstm:
                h_all, c_all = hidden
                states = [(h_all[i], c_all[i]) for i in range(h_all.shape[0])]
            else:
                states = [hidden[i] for i in range(hidden.shape[0])]

        inp = x_seq
        new_states = []
        for layer in range(self.num_layers):
            outs = []
            for direction in range(self.num_directions):
                idx = layer * self.num_directions + direction
                lp = params["layers"][idx]
                out, st = self._layer_scan(lp, inp, states[idx], reverse=bool(direction))
                outs.append(out)
                new_states.append(st)
            inp = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
            if train and self.dropout > 0.0 and layer < self.num_layers - 1 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout, inp.shape)
                inp = jnp.where(keep, inp / (1.0 - self.dropout), 0.0)

        if lstm:
            hidden_out = (jnp.stack([s[0] for s in new_states]),
                          jnp.stack([s[1] for s in new_states]))
        else:
            hidden_out = jnp.stack(new_states)
        return inp, hidden_out


def Conv2dLSTM(in_channels, out_channels, kernel_size, **kw):
    return ConvRNN("LSTM", in_channels, out_channels, kernel_size, ndim=2, **kw)


def Conv2dGRU(in_channels, out_channels, kernel_size, **kw):
    return ConvRNN("GRU", in_channels, out_channels, kernel_size, ndim=2, **kw)


def Conv2dRNN(in_channels, out_channels, kernel_size, *, nonlinearity="tanh", **kw):
    mode = "RNN_TANH" if nonlinearity == "tanh" else "RNN_RELU"
    return ConvRNN(mode, in_channels, out_channels, kernel_size, ndim=2, **kw)


def Conv2dPeepholeLSTM(in_channels, out_channels, kernel_size, **kw):
    return ConvRNN("PeepholeLSTM", in_channels, out_channels, kernel_size, ndim=2, **kw)


def Conv1dLSTM(in_channels, out_channels, kernel_size, **kw):
    return ConvRNN("LSTM", in_channels, out_channels, kernel_size, ndim=1, **kw)


def Conv3dLSTM(in_channels, out_channels, kernel_size, **kw):
    return ConvRNN("LSTM", in_channels, out_channels, kernel_size, ndim=3, **kw)
