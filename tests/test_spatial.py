"""Spatial (halo-exchange) parallelism: the H-sharded SPMD forward must be
numerically identical to the single-device forward (parallel/spatial.py —
border shards receive zeros from ppermute == SAME zero padding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnf_tpu.models.rrdb import RRDBConfig, RRDBNet
from gpnf_tpu.ops.conv import conv2d
from gpnf_tpu.parallel.spatial import make_sp_mesh, sp_apply

KEY = jax.random.PRNGKey(0)


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_halo_conv_matches_same_conv():
    """One 3x3 stride-1 SAME conv, H sharded over 4 devices."""
    _need(4)
    mesh = make_sp_mesh(jax.devices()[:4], sp=4, data=1)
    x = jax.random.normal(KEY, (2, 5, 16, 12))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 3, 3)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (7,)) * 0.1

    ref = conv2d(x, w, b)
    fn = sp_apply(lambda p, xx: conv2d(xx, p["w"], p["b"]), mesh,
                  data_axis=None)
    out = fn({"w": w, "b": b}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dilated_and_1x1_convs_match():
    _need(4)
    mesh = make_sp_mesh(jax.devices()[:4], sp=4, data=1)
    x = jax.random.normal(KEY, (1, 4, 24, 8))
    w3 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3, 3)) * 0.1
    w5 = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 5, 5)) * 0.1
    w1 = jax.random.normal(jax.random.PRNGKey(3), (6, 4, 1, 1)) * 0.1

    def net(p, xx):
        h = jax.nn.relu(conv2d(xx, p["w3"]))
        h = jax.nn.relu(conv2d(h, p["w5"], dilation=2))  # halo = 4
        return conv2d(h, p["w1"])

    params = {"w3": w3, "w5": w5, "w1": w1}
    ref = net(params, x)
    out = sp_apply(net, mesh, data_axis=None)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_rrdb_sr_forward_spatially_sharded():
    """Full RRDB SR net (trunk + nearest-2x upconvs), dp x sp mesh."""
    _need(8)
    mesh = make_sp_mesh(jax.devices()[:8], sp=4, data=2)
    cfg = RRDBConfig(in_nc=3, out_nc=3, nf=8, nb=2, gc=4, scale=4)
    net = RRDBNet(cfg)
    params = net.init(KEY)
    lr = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 12))

    ref = net.apply(params, lr)
    out = sp_apply(lambda p, x: net.apply(p, x), mesh)(params, lr)
    assert out.shape == (2, 3, 64, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
