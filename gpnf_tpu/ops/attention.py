"""Invertible checkerboard patch attention (exact log-det, exact inverse).

Reference: flow_modules/transformer.py (`Transformer_attn`, 31-326) and its
head-count/scoring ablations (transformer_x3/x5/x7/_8, SURVEY.md §2.1).

Math (derived from the reference, re-expressed in block form):
  - The input is cut into N = (H/p)*(W/p) patches of size p = W//2, flattened
    to D = C*p*p dims; element mask M[i,d] = 1 iff (i+d) even ("permute"
    flips it).
  - Queries/keys are 1x1 convs of the *masked* input; per-patch scores
    S = sum_h q_h k_h^T / scale; A = sigmoid(S + offset2) + offset3.
  - Only same-parity patch pairs interact. With E/O the even/odd patch index
    sets, m1 = A[E,E] + offset*I and m2 = A[O,O] + offset*I act as mixing
    matrices: for every feature dim d of odd parity, y[E,d] = m1 @ x[E,d];
    for every even-parity d, y[O,d] = m2 @ x[O,d]; masked elements pass
    through. The Jacobian is block-diagonal with D/2 copies of m1 and D/2 of
    m2, so logdet = (slogdet(m1) + slogdet(m2)) * D/2 — the reference's
    p*(p//2)*C (transformer.py:199-201), identical for even p.
  - Inverse recomputes A from the untouched masked half and applies two
    batched triangular-free solves (transformer.py:284-313 uses explicit
    `torch.inverse`; we use `jnp.linalg.solve`).

TPU-first notes: everything is static-shaped; the N/2 x N/2 blocks are tiny
(2x2 for square inputs) so slogdet/solve are negligible next to the q/k
convs, which XLA maps to the MXU.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .conv import conv2d


def checkerboard(shape) -> np.ndarray:
    """1 where the index-sum is even (transformer.py:10-11)."""
    return (1 - np.indices(shape).sum(axis=0) % 2).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _image_mask(c: int, h: int, w: int, p: int, permute: bool) -> np.ndarray:
    """The (n, d) patch checkerboard rendered into image space (c, h, w).

    Static (trace-time numpy), so masking in image space costs one fused
    elementwise multiply instead of a to_patches 6-D transpose round-trip.
    """
    hh, ww = h // p, w // p
    m = checkerboard((hh * ww, c * p * p))
    if permute:
        m = 1.0 - m
    m = m.reshape(hh, ww, c, p, p).transpose(2, 0, 3, 1, 4)
    return np.ascontiguousarray(m.reshape(c, h, w))


def to_patches(x: jax.Array, p: int) -> jax.Array:
    """(B,C,H,W) -> (B, N, C*p*p) with patch-major (row-major grid) ordering."""
    b, c, h, w = x.shape
    hh, ww = h // p, w // p
    x = x.reshape(b, c, hh, p, ww, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, hh * ww, c * p * p)


def from_patches(x: jax.Array, p: int, shape) -> jax.Array:
    b, c, h, w = shape
    hh, ww = h // p, w // p
    x = x.reshape(b, hh, ww, c, p, p)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


class InvertibleAttention:
    """`Transformer_attn` semantics with a configurable head count.

    num_heads=3 reproduces the ACTIVE configuration (transformer.py); 5/7/8
    cover the transformer_x5/x7/_8 ablation variants.
    """

    def __init__(self, num_channels: int, num_heads: int = 3, *,
                 offset_init: float = 0.99, offset2_init: float = 0.65,
                 offset3_init: float = -0.6, scale_init: float = 100.0,
                 score: str = "sigmoid"):
        self.nc = num_channels
        self.num_heads = num_heads
        self.offset_init = offset_init
        self.offset2_init = offset2_init
        self.offset3_init = offset3_init
        self.scale_init = scale_init
        # "sigmoid": A = sigmoid(S + offset2) + offset3 (flow_modules/
        # transformer.py:176-179). "softmax": A = softmax(S) row-normalized
        # over ALL patches before parity masking (transformer_x3.py:176-179
        # and the SRFlow-side models/modules/transformer.py, 5 heads).
        assert score in ("sigmoid", "softmax"), score
        self.score = score
        # image-space quadrant fast path for square inputs (n == 4); the
        # general patch path remains as the reference implementation and the
        # only path for non-square inputs. Tests flip this off to pin
        # equivalence.
        self.use_quad_path = True

    def init(self, key):
        ks = jax.random.split(key, 2 * self.num_heads)
        bound = np.sqrt(1.0 / (3.0 * self.nc))  # kaiming_uniform(a=sqrt(5)) fan_in=nc
        wq = jnp.stack([
            jax.random.uniform(ks[i], (self.nc, self.nc), minval=-bound, maxval=bound)
            for i in range(self.num_heads)])
        wk = jnp.stack([
            jax.random.uniform(ks[self.num_heads + i], (self.nc, self.nc),
                               minval=-bound, maxval=bound)
            for i in range(self.num_heads)])
        return {
            "wq": wq,  # (heads, out, in) 1x1-conv kernels
            "wk": wk,
            "offset": jnp.full((1,), self.offset_init),
            "offset2": jnp.full((1,), self.offset2_init),
            "offset3": jnp.full((1,), self.offset3_init),
            "scale": jnp.full((1,), self.scale_init),
        }

    # -- static helpers -----------------------------------------------------
    @staticmethod
    def _geometry(shape):
        _, c, h, w = shape
        p = w // 2
        n = (h // p) * (w // p)
        d = c * p * p
        return p, n, d

    def _blocks(self, params, x_masked_img, p, n):
        """Score matrices m1 (even patches) and m2 (odd patches), (B, n/2, n/2)."""
        # all heads in one conv: (heads*nc) output channels
        wq = params["wq"].reshape(self.num_heads * self.nc, self.nc, 1, 1)
        wk = params["wk"].reshape(self.num_heads * self.nc, self.nc, 1, 1)
        q = conv2d(x_masked_img, wq)  # (B, heads*C, H, W)
        k = conv2d(x_masked_img, wk)
        b = x_masked_img.shape[0]
        h_img, w_img = x_masked_img.shape[2], x_masked_img.shape[3]
        # per-head patches: (B, heads, N, D)
        def head_patches(t):
            t = t.reshape(b * self.num_heads, self.nc, h_img, w_img)
            t = to_patches(t, p)
            return t.reshape(b, self.num_heads, n, -1)

        qp, kp = head_patches(q), head_patches(k)
        scores = jnp.einsum("bhnd,bhmd->bnm", qp, kp,
                            preferred_element_type=jnp.float32) / params["scale"][0]
        if self.score == "softmax":
            # normalized over every patch (incl. the off-parity columns that
            # the checkerboard mask then zeroes) — reference keeps them in
            # the denominator.
            a = jax.nn.softmax(scores, axis=-1)
        else:
            a = jax.nn.sigmoid(scores + params["offset2"][0]) + params["offset3"][0]
        even = np.arange(0, n, 2)
        odd = np.arange(1, n, 2)
        eye = jnp.eye(n // 2, dtype=a.dtype) * params["offset"][0]
        m1 = a[:, even[:, None], even[None, :]] + eye
        m2 = a[:, odd[:, None], odd[None, :]] + eye
        return m1, m2

    @staticmethod
    def _slogabsdet(m):
        """log|det| for batched (B, n, n); closed form for the common n=2
        (square inputs give 4 patches -> 2x2 parity blocks), LU otherwise."""
        if m.shape[-1] == 2:
            det = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
            return jnp.log(jnp.abs(det))
        return jnp.linalg.slogdet(m)[1]

    @staticmethod
    def _solve(m, u):
        """Batched solve m @ x = u; closed-form 2x2 (adjugate) fast path."""
        if m.shape[-1] == 2:
            a, b = m[..., 0, 0], m[..., 0, 1]
            c, d = m[..., 1, 0], m[..., 1, 1]
            det = (a * d - b * c)[:, None]
            x0 = (d[:, None] * u[:, 0] - b[:, None] * u[:, 1]) / det
            x1 = (-c[:, None] * u[:, 0] + a[:, None] * u[:, 1]) / det
            return jnp.stack([x0, x1], axis=1)
        return jnp.linalg.solve(m, u)

    def _ldj(self, m1, m2, d):
        return (self._slogabsdet(m1) + self._slogabsdet(m2)) * (d // 2)

    # -- quadrant fast path (square inputs: p = W/2 => exactly 4 patches) ---
    #
    # With 4 patches the parity mixing matrices are 2x2, so y = m @ u is four
    # scalar-weighted quadrant sums: pure VPU elementwise work in image
    # space.  No to_patches/from_patches 6-D transposes anywhere — the r2/r3
    # xprof showed those layout copies as a ~40 ms/step bucket.  Patch
    # row-major order maps quadrants q00,q01,q10,q11 to patches 0,1,2,3;
    # even patches are (q00, q10), odd are (q01, q11).

    @staticmethod
    def _quads(t):
        ph, pw = t.shape[2] // 2, t.shape[3] // 2
        return (t[:, :, :ph, :pw], t[:, :, :ph, pw:],
                t[:, :, ph:, :pw], t[:, :, ph:, pw:])

    def _blocks_quad(self, params, x_masked_img):
        wq = params["wq"].reshape(self.num_heads * self.nc, self.nc, 1, 1)
        wk = params["wk"].reshape(self.num_heads * self.nc, self.nc, 1, 1)
        q = conv2d(x_masked_img, wq)  # (B, heads*C, H, W)
        k = conv2d(x_masked_img, wk)
        qs, ks = self._quads(q), self._quads(k)
        # scores[b, i, j] = <patch_i(q), patch_j(k)> summed over heads+dims
        scores = jnp.stack([
            jnp.stack([jnp.sum((qi * kj).astype(jnp.float32), axis=(1, 2, 3))
                       for kj in ks], axis=-1)
            for qi in qs], axis=-2) / params["scale"][0]
        if self.score == "softmax":
            a = jax.nn.softmax(scores, axis=-1)
        else:
            a = jax.nn.sigmoid(scores + params["offset2"][0]) + params["offset3"][0]
        eye = jnp.eye(2, dtype=a.dtype) * params["offset"][0]
        ev, od = np.array([0, 2]), np.array([1, 3])
        m1 = a[:, ev[:, None], ev[None, :]] + eye
        m2 = a[:, od[:, None], od[None, :]] + eye
        return m1, m2

    @staticmethod
    def _mix_quads(m1, m2, u, dtype):
        """y quadrants from 2x2 parity mixes; coefficients broadcast (B,1,1,1)."""
        u00, u01, u10, u11 = InvertibleAttention._quads(u)

        def c(m, i, j):
            return m[:, i, j][:, None, None, None].astype(dtype)

        y00 = c(m1, 0, 0) * u00 + c(m1, 0, 1) * u10
        y10 = c(m1, 1, 0) * u00 + c(m1, 1, 1) * u10
        y01 = c(m2, 0, 0) * u01 + c(m2, 0, 1) * u11
        y11 = c(m2, 1, 0) * u01 + c(m2, 1, 1) * u11
        top = jnp.concatenate([y00, y01], axis=3)
        bot = jnp.concatenate([y10, y11], axis=3)
        return jnp.concatenate([top, bot], axis=2)

    @staticmethod
    def _solve_quads(m1, m2, u, dtype):
        """Inverse 2x2 parity mixes on quadrants (closed-form adjugate)."""
        u00, u01, u10, u11 = InvertibleAttention._quads(u)

        def c(v):
            return v[:, None, None, None].astype(jnp.float32)

        a1, b1 = m1[..., 0, 0], m1[..., 0, 1]
        c1, d1 = m1[..., 1, 0], m1[..., 1, 1]
        det1 = c(a1 * d1 - b1 * c1)
        x00 = (c(d1) * u00 - c(b1) * u10) / det1
        x10 = (-c(c1) * u00 + c(a1) * u10) / det1
        a2, b2 = m2[..., 0, 0], m2[..., 0, 1]
        c2, d2 = m2[..., 1, 0], m2[..., 1, 1]
        det2 = c(a2 * d2 - b2 * c2)
        x01 = (c(d2) * u01 - c(b2) * u11) / det2
        x11 = (-c(c2) * u01 + c(a2) * u11) / det2
        top = jnp.concatenate([x00, x01], axis=3)
        bot = jnp.concatenate([x10, x11], axis=3)
        return jnp.concatenate([top, bot], axis=2).astype(dtype)

    def _forward_quad(self, params, x, logdet, permute):
        b, c, h, w = x.shape
        p, _, d = self._geometry(x.shape)
        mask = jnp.asarray(_image_mask(c, h, w, p, permute), dtype=x.dtype)
        x_masked = x * mask
        m1, m2 = self._blocks_quad(params, x_masked)
        logdet = logdet + self._ldj(m1, m2, d)
        yu = self._mix_quads(m1, m2, x * (1.0 - mask), x.dtype)
        return yu * (1.0 - mask) + x_masked, logdet

    def _inverse_quad(self, params, y, logdet, permute):
        b, c, h, w = y.shape
        p, _, d = self._geometry(y.shape)
        mask = jnp.asarray(_image_mask(c, h, w, p, permute), dtype=y.dtype)
        y_masked = y * mask
        m1, m2 = self._blocks_quad(params, y_masked)
        logdet = logdet - self._ldj(m1, m2, d)
        xu = self._solve_quads(m1, m2, y * (1.0 - mask), y.dtype)
        return xu * (1.0 - mask) + y_masked, logdet

    def forward(self, params, x, logdet, *, permute: bool = False, **_):
        p, n, d = self._geometry(x.shape)
        if n == 4 and self.use_quad_path:
            return self._forward_quad(params, x, logdet, permute)
        mask = jnp.asarray(checkerboard((n, d)))
        if permute:
            mask = 1.0 - mask
        xp = to_patches(x, p)
        x_masked = xp * mask
        m1, m2 = self._blocks(params, from_patches(x_masked, p, x.shape), p, n)
        logdet = logdet + self._ldj(m1, m2, d)

        u = xp * (1.0 - mask)
        y_even = jnp.einsum("bij,bjd->bid", m1, u[:, 0::2],
                            preferred_element_type=jnp.float32).astype(x.dtype)
        y_odd = jnp.einsum("bij,bjd->bid", m2, u[:, 1::2],
                           preferred_element_type=jnp.float32).astype(x.dtype)
        # interleave even/odd token rows (cheap reshape; no scatter)
        yu = jnp.stack([y_even, y_odd], axis=2).reshape(xp.shape)
        yp = yu * (1.0 - mask) + x_masked
        return from_patches(yp, p, x.shape), logdet

    def inverse(self, params, y, logdet, *, permute: bool = False, **_):
        p, n, d = self._geometry(y.shape)
        if n == 4 and self.use_quad_path:
            return self._inverse_quad(params, y, logdet, permute)
        mask = jnp.asarray(checkerboard((n, d)))
        if permute:
            mask = 1.0 - mask
        yp = to_patches(y, p)
        y_masked = yp * mask
        m1, m2 = self._blocks(params, from_patches(y_masked, p, y.shape), p, n)
        logdet = logdet - self._ldj(m1, m2, d)

        u = yp * (1.0 - mask)
        x_even = self._solve(m1, u[:, 0::2]).astype(y.dtype)
        x_odd = self._solve(m2, u[:, 1::2]).astype(y.dtype)
        xu = jnp.stack([x_even, x_odd], axis=2).reshape(yp.shape)
        xp = xu * (1.0 - mask) + y_masked
        return from_patches(xp, p, y.shape), logdet
