"""ConvLSTM channel-autoregressive prior (mAR-SCF).

Reference: mar_prior/corr_prior.py (ChannelPriorUniScale 7-154,
ChannelPriorMultiScale 157-182) and mar_prior/lstm.py (ConvSeqEncoder).

TPU-first redesign (SURVEY.md §7.1):
  - teacher-forced likelihood = ONE pass: the channel axis becomes the scan
    axis of a ConvRNN whose input->gate convs are hoisted into a single
    batched conv over all channels;
  - ancestral sampling = `lax.scan` over channels with the LSTM state and the
    previous channel sample as carry, replacing the reference's Python loop
    (corr_prior.py:126-132).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.convrnn import ConvRNN, _convnd

LOG2PI = math.log(2.0 * math.pi)

# Per-level ConvLSTM kernel sizes / dilations (corr_prior.py:23-24).
KERNEL_SIZES = [5, 5, 3, 3, 3, 3, 3]
DILATIONS = [2, 1, 1, 1, 1, 1, 1]


class ConvSeqEncoder:
    """conv-embed -> ConvLSTM stack -> conv-out, time-distributed convs.

    Reference: mar_prior/lstm.py:7-43.
    """

    def __init__(self, input_ch: int, out_ch: int, embed_ch: int,
                 kernel_size: int = 5, dilation: int = 1, num_layers: int = 1,
                 dropout: float = 0.0, scan_unroll: int = 1):
        self.input_ch, self.out_ch, self.embed_ch = input_ch, out_ch, embed_ch
        self.k = kernel_size
        self.lstm = ConvRNN("LSTM", embed_ch, embed_ch, kernel_size,
                            num_layers=num_layers, dilation=dilation, ndim=2,
                            scan_unroll=scan_unroll)
        self.dropout = dropout

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        bound_e = 1.0 / math.sqrt(self.input_ch * self.k * self.k)
        bound_o = 1.0 / math.sqrt(self.embed_ch * 9)
        return {
            "embed_w": jax.random.uniform(k1, (self.embed_ch, self.input_ch, self.k, self.k),
                                          minval=-bound_e, maxval=bound_e),
            "embed_b": jnp.zeros((self.embed_ch,)),
            "out_w": jax.random.uniform(k2, (self.out_ch, self.embed_ch, 3, 3),
                                        minval=-bound_o, maxval=bound_o),
            "out_b": jnp.zeros((self.out_ch,)),
            "lstm": self.lstm.init(k3),
        }

    def _td(self, x_seq, w, b):
        """Time-distributed conv: (B,T,C,H,W) through one conv."""
        bsz, t = x_seq.shape[:2]
        flat = x_seq.reshape(bsz * t, *x_seq.shape[2:])
        y = _convnd(flat, w, b, ndim=2)
        return y.reshape(bsz, t, *y.shape[1:])

    def apply(self, params, x_seq, hidden=None, *, rng=None, train=False):
        x = self._td(x_seq, params["embed_w"], params["embed_b"])
        outs, hidden = self.lstm.apply(params["lstm"], x, hidden, rng=rng, train=train)
        out = self._td(outs, params["out_w"], params["out_b"])
        return out, hidden

    def step(self, params, x_t, states):
        """Single AR step. x_t (B,C,H,W); states = list of per-layer (h, c)."""
        x = _convnd(x_t, params["embed_w"], params["embed_b"], ndim=2)
        new_states = []
        inp = x
        for layer in range(self.lstm.num_layers):
            lp = params["lstm"]["layers"][layer]
            ig = _convnd(inp, lp["w_ih"], lp["b_ih"], dilation=self.lstm.dilation, ndim=2)
            out, st = self.lstm.cell(lp, ig, states[layer])
            new_states.append(st)
            inp = out
        out = _convnd(inp, params["out_w"], params["out_b"], ndim=2)
        return out, new_states

    def zero_states(self, batch, spatial, dtype=jnp.float32):
        shape = (batch, self.embed_ch, *spatial)
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(self.lstm.num_layers)]


class ChannelPriorUniScale:
    """p(z_c | z_<c, z1) for one level; channels are the AR sequence."""

    def __init__(self, nc_base: int, height: int, width: int, level: int,
                 tot_levels: int, hidden_size: int = 32, num_layers: int = 1,
                 dp_rate: float = 0.0, compute_dtype=None,
                 scan_unroll: int = 1):
        self.level, self.tot_levels = level, tot_levels
        # run the ConvLSTM/conv stack in this dtype (e.g. bf16, matching the
        # coupling networks); the Gaussian likelihood math stays fp32
        self.compute_dtype = compute_dtype
        self.height = height // (2**level)
        self.width = width // (2**level)
        self.is_final = level == tot_levels
        self.nc = nc_base * 2 ** (level + 1 if self.is_final else level)
        self.dp_rate = dp_rate
        # unroll factor for the ancestral-sampling channel scan (0 = full);
        # same launch-floor economics as the likelihood wavefront scan
        self.scan_unroll = True if scan_unroll == 0 else max(1, scan_unroll)
        input_ch = 1 if self.is_final else 5  # z channel (+4 cond-embedding ch)
        self.encoder = ConvSeqEncoder(
            input_ch=input_ch, out_ch=2, embed_ch=hidden_size,
            kernel_size=KERNEL_SIZES[level - 1], dilation=DILATIONS[level - 1],
            num_layers=num_layers, dropout=dp_rate, scan_unroll=scan_unroll)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"encoder": self.encoder.init(k1)}
        if not self.is_final:
            # z1 conditional embedding: conv5x5(nc->32) -> relu -> conv5x5(32->4)
            bound1 = 1.0 / math.sqrt(self.nc * 25)
            bound2 = 1.0 / math.sqrt(32 * 25)
            p["cond"] = {
                "w1": jax.random.uniform(k2, (32, self.nc, 5, 5), minval=-bound1, maxval=bound1),
                "b1": jnp.zeros((32,)),
                "w2": jax.random.uniform(k3, (4, 32, 5, 5), minval=-bound2, maxval=bound2),
                "b2": jnp.zeros((4,)),
            }
        return p

    def _cond_embed(self, params, z1):
        h = jax.nn.relu(_convnd(z1, params["cond"]["w1"], params["cond"]["b1"], ndim=2))
        return _convnd(h, params["cond"]["w2"], params["cond"]["b2"], ndim=2)  # (B,4,H,W)

    @staticmethod
    def _likelihood(mean, logs, z):
        return -0.5 * (logs * 2.0 + ((z - mean) ** 2) * jnp.exp(-2.0 * logs) + LOG2PI)

    def log_likelihood(self, params, z, *, rng=None, train=False):
        """z = (z1, z2) for intermediate levels, z for the final level -> (B,)."""
        if isinstance(z, tuple):
            z1, z2 = z
        else:
            z1, z2 = None, z
        b = z2.shape[0]
        t = z2.shape[1]
        z2_seq = z2[:, :, None]  # (B, T, 1, H, W)

        drop_rng = None
        if train and self.dp_rate > 0.0 and rng is not None:
            rng, drop_rng = jax.random.split(rng)

        z2_in = z2_seq
        if drop_rng is not None:  # per-(sample, channel) dropout, corr_prior.py:49-53
            keep = jax.random.bernoulli(drop_rng, 1.0 - self.dp_rate, (b, t, 1, 1, 1))
            z2_in = jnp.where(keep, z2_seq, 0.0)

        zeros = jnp.zeros((b, 1, 1, self.height, self.width), z2.dtype)
        lstm_input = jnp.concatenate([zeros, z2_in[:, :-1]], axis=1)
        if z1 is not None:
            cond = self._cond_embed(params, z1)[:, None]  # (B,1,4,H,W)
            cond = jnp.broadcast_to(cond, (b, t, 4, self.height, self.width))
            lstm_input = jnp.concatenate([lstm_input, cond], axis=2)

        enc_params = params["encoder"]
        if self.compute_dtype is not None:
            cast = lambda a: (a.astype(self.compute_dtype)
                              if jnp.issubdtype(a.dtype, jnp.floating) else a)
            enc_params = jax.tree.map(cast, enc_params)
            lstm_input = lstm_input.astype(self.compute_dtype)
        out, _ = self.encoder.apply(enc_params, lstm_input, rng=rng, train=train)
        out = out.astype(jnp.float32)
        means, logs = out[:, :, 0:1], out[:, :, 1:2]
        ll = self._likelihood(means, logs, z2_seq)
        return jnp.sum(ll.reshape(b, -1), axis=-1)

    def sample(self, params, rng, z1=None, batch: Optional[int] = None,
               eps_std: float = 1.0, dtype=jnp.float32):
        """Ancestral sampling over channels as one lax.scan."""
        if z1 is not None:
            batch = z1.shape[0]
            cond = self._cond_embed(params, z1)  # (B,4,H,W)
        else:
            assert batch is not None
            cond = None

        eps = jax.random.normal(rng, (self.nc, batch, 1, self.height, self.width), dtype)
        eps = eps * eps_std
        init_x = jnp.zeros((batch, 1, self.height, self.width), dtype)
        init_states = self.encoder.zero_states(batch, (self.height, self.width), dtype)

        enc_params = params["encoder"]

        def step(carry, eps_t):
            prev_z, states = carry
            x_t = prev_z if cond is None else jnp.concatenate([prev_z, cond], axis=1)
            out, states = self.encoder.step(enc_params, x_t, states)
            mean, logs = out[:, 0:1], out[:, 1:2]
            z_t = mean + jnp.exp(logs) * eps_t
            return (z_t, states), z_t

        _, z_seq = jax.lax.scan(step, (init_x, init_states), eps,
                                unroll=self.scan_unroll)
        # (T, B, 1, H, W) -> (B, T, H, W)
        return jnp.transpose(z_seq[:, :, 0], (1, 0, 2, 3))


class ChannelPriorMultiScale:
    """One ChannelPriorUniScale per level (corr_prior.py:157-182)."""

    def __init__(self, nc_base: int, height: int, width: int, levels: int,
                 hidden_size: int = 32, dp_rate: float = 0.0, num_layers: int = 2,
                 compute_dtype=None, scan_unroll: int = 1):
        self.levels = levels
        self.priors = [
            ChannelPriorUniScale(nc_base, height, width, level, levels,
                                 hidden_size=hidden_size, num_layers=num_layers,
                                 dp_rate=dp_rate, compute_dtype=compute_dtype,
                                 scan_unroll=scan_unroll)
            for level in range(1, levels + 1)
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.priors))
        return {"levels": [p.init(k) for p, k in zip(self.priors, keys)]}

    def log_likelihood(self, params, z, level, *, rng=None, train=False):
        return self.priors[level - 1].log_likelihood(
            params["levels"][level - 1], z, rng=rng, train=train)

    def sample(self, params, rng, level, z1=None, batch=None, eps_std=1.0,
               dtype=jnp.float32):
        return self.priors[level - 1].sample(
            params["levels"][level - 1], rng, z1=z1, batch=batch,
            eps_std=eps_std, dtype=dtype)
