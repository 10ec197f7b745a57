"""flow_warp, multihost helpers (single-process path), logging."""
import jax
import jax.numpy as jnp
import numpy as np

from gpnf_tpu.ops.warp import flow_warp

KEY = jax.random.PRNGKey(0)


def test_flow_warp_identity():
    x = jax.random.normal(KEY, (2, 3, 8, 8))
    flow = jnp.zeros((2, 8, 8, 2))
    y = flow_warp(x, flow)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_flow_warp_integer_shift():
    x = jax.random.normal(KEY, (1, 2, 8, 8))
    flow = jnp.ones((1, 8, 8, 2))  # sample from (x+1, y+1)
    y = flow_warp(x, flow)
    np.testing.assert_allclose(np.asarray(y[0, :, :7, :7]),
                               np.asarray(x[0, :, 1:, 1:]), atol=1e-6)
    # out-of-bounds row/col zero-padded
    np.testing.assert_allclose(np.asarray(y[0, :, 7, :]), 0.0, atol=1e-6)


def test_flow_warp_subpixel():
    x = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None, None, None, :],
                 (1, 1, 8, 1))  # ramp along x
    flow = jnp.full((1, 8, 8, 2), 0.5).at[..., 1].set(0.0)  # dx=0.5
    y = flow_warp(x, flow)
    np.testing.assert_allclose(np.asarray(y[0, 0, 4, 2]), 2.5, atol=1e-6)


def test_multihost_single_process():
    from gpnf_tpu.parallel.multihost import (global_mesh, host_shard_indices,
                                             shard_host_batch)

    mesh = global_mesh()
    batch = np.random.default_rng(0).standard_normal((16, 3, 4, 4)).astype(np.float32)
    arr = shard_host_batch(mesh, batch)
    assert arr.shape == (16, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(arr), batch, atol=0)

    idx = host_shard_indices(100, seed=1, epoch=0)
    assert len(idx) == 100  # single process owns everything
    assert len(set(idx.tolist())) == 100


def test_metrics_writer(tmp_path):
    from gpnf_tpu.utils.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path), tensorboard=False)
    w.scalar("nll", 3.5, 10)
    w.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["tag"] == "nll" and lines[0]["step"] == 10


def test_frame_window_indices():
    from gpnf_tpu.data.video import clip_windows, frame_window_indices

    # reflection at the start: [-2,-1,0,1,2] -> [2,1,0,1,2]
    assert frame_window_indices(0, 9, 5) == [2, 1, 0, 1, 2]
    # reflection at the end
    assert frame_window_indices(9, 9, 5) == [7, 8, 9, 8, 7]
    # interior untouched
    assert frame_window_indices(5, 9, 5) == [3, 4, 5, 6, 7]
    assert frame_window_indices(0, 9, 3, "replicate") == [0, 0, 1]
    assert frame_window_indices(0, 9, 3, "circular") == [9, 0, 1]
    w = clip_windows(6, 3)
    assert w.shape == (6, 3)
