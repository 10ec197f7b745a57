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


def _convnd(x, w, b=None, *, dilation=1, ndim=2, groups=1, stride=1):
    """N-d conv with reference-matching same padding; x (B, C, *sp), w (O, I, *k)."""
    k = w.shape[2:]
    dil = (dilation,) * ndim if isinstance(dilation, int) else tuple(dilation)
    strides = (stride,) * ndim if isinstance(stride, int) else tuple(stride)
    pads = [_same_pad(kk, dd) for kk, dd in zip(k, dil)]
    spec = {1: ("NCH", "OIH", "NCH"), 2: ("NCHW", "OIHW", "NCHW"),
            3: ("NCDHW", "OIDHW", "NCDHW")}[ndim]
    # fp32 accumulation: explicit only for fp32 inputs — bf16 convs accumulate
    # fp32 on the MXU natively, and an explicit preferred type breaks the conv
    # transpose rule under AD (fp32 cotangent vs bf16 operand; see ops/conv.py)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads, rhs_dilation=dil,
        dimension_numbers=spec, feature_group_count=groups,
        preferred_element_type=preferred)
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
                 dilation=1, dropout: float = 0.0, ndim: int = 2,
                 scan_unroll: int = 1):
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
        # lax.scan unroll factor over the time axis: the per-wave convs of
        # these recurrences are tiny (launch-floor-bound on TPU); unrolling
        # lets XLA fuse the elementwise gate math across steps and drop the
        # loop-carried stacking copies, at a larger compiled program.
        # 0 = FULL unroll (lax.scan unroll=True). Measured +7% end-to-end on
        # the mAR-SCF flagship at unroll=8 (docs/BENCHMARKS.md r3 levers).
        self.scan_unroll = True if scan_unroll == 0 else max(1, scan_unroll)
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

        state, outs = jax.lax.scan(step, state, igates_t, reverse=reverse,
                                   unroll=self.scan_unroll)
        return jnp.swapaxes(outs, 0, 1), state

    def _apply_wavefront(self, params, x_seq):
        """Diagonal-wavefront evaluation of the stacked unidirectional LSTM.

        Exactly equivalent to the layer-by-layer scans, but the sequential
        chain shrinks from L*T steps to T+L-1 waves: at wave w, layer l
        processes its t = w - l, so all L layers' cells run concurrently as
        ONE grouped conv (their h2h convs batched with feature_group_count=L,
        the layer>=1 input convs with L-1 groups). On TPU the per-step conv
        triples in size (better MXU tiling) while the scan latency — the
        dominant cost of these small-spatial recurrences — drops ~L-fold.
        Preconditions checked by the caller: LSTM, unidirectional, zero
        initial state, no inter-layer dropout.
        """
        lps = params["layers"]
        ell = self.num_layers
        b, t = x_seq.shape[:2]
        spatial = x_seq.shape[3:]
        c = self.out_ch
        dtype = x_seq.dtype

        w_hh = jnp.concatenate([lp["w_hh"] for lp in lps], axis=0)
        b_hh = jnp.concatenate([lp["b_hh"] for lp in lps], axis=0)
        w_ih_r = jnp.concatenate([lps[l]["w_ih"] for l in range(1, ell)], axis=0)
        b_ih_r = jnp.concatenate([lps[l]["b_ih"] for l in range(1, ell)], axis=0)

        ig0 = self.input_gates(lps[0], x_seq)  # (B, T, G, *sp), b_ih included
        ig0 = jnp.swapaxes(ig0, 0, 1)
        ig0 = jnp.concatenate(
            [ig0, jnp.zeros((ell - 1,) + ig0.shape[1:], ig0.dtype)], axis=0)

        def merge_l(x):  # (L', B, C', *sp) -> (B, L'*C', *sp) group layout
            return jnp.moveaxis(x, 0, 1).reshape((b, -1) + spatial)

        def split_l(x, lcount):  # inverse of merge_l for conv outputs
            return jnp.moveaxis(
                x.reshape((b, lcount, -1) + spatial), 1, 0)

        h0 = jnp.zeros((ell, b, c) + spatial, dtype)
        layer_idx = jnp.arange(ell).reshape((ell,) + (1,) * (3 + len(spatial) - 1))

        def wave(carry, xs):
            h, cc = carry
            ig_t, w = xs
            ig_rest = split_l(
                _convnd(merge_l(h[: ell - 1]), w_ih_r, b_ih_r,
                        dilation=self.dilation, ndim=self.ndim,
                        groups=ell - 1), ell - 1)
            igates = jnp.concatenate([ig_t[None], ig_rest], axis=0)
            hh = split_l(
                _convnd(merge_l(h), w_hh, b_hh, dilation=self.dilation,
                        ndim=self.ndim, groups=ell), ell)
            gates = igates + hh  # (L, B, 4C, *sp)
            i, f, g, o = jnp.split(gates, 4, axis=2)
            i, f, g, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g),
                          jax.nn.sigmoid(o))
            c_new = f * cc + i * g
            h_new = o * jnp.tanh(c_new)
            active = (w >= layer_idx) & (w - layer_idx < t)
            h = jnp.where(active, h_new, h)
            cc = jnp.where(active, c_new, cc)
            return (h, cc), h[ell - 1]

        (h, cc), ys = jax.lax.scan(
            wave, (h0, h0), (ig0, jnp.arange(t + ell - 1)),
            unroll=self.scan_unroll)
        outs = jnp.swapaxes(ys[ell - 1: ell - 1 + t], 0, 1)
        return outs, (h, cc)

    def apply(self, params, x_seq, hidden=None, *, rng=None, train=False):
        """x_seq (B, T, C, *sp) -> (out_seq (B, T, out_ch*dirs, *sp), hidden).

        `hidden` packs per-(layer, direction) states in reference order; pass
        the returned value back in to continue a sequence (AR sampling).
        """
        if (self.mode == "LSTM" and not self.bidirectional
                and self.num_layers > 1 and hidden is None
                and (not train or self.dropout == 0.0)):
            return self._apply_wavefront(params, x_seq)
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
