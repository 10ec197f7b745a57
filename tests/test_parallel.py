"""Data-parallel SPMD tests on the virtual 8-device CPU mesh: the sharded
train step must match the single-device step (psum grads == full-batch
grads), and the driver's dryrun must execute."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
from gpnf_tpu.parallel.mesh import make_mesh, shard_batch
from gpnf_tpu.parallel.train_step import make_eval_step, make_train_step

KEY = jax.random.PRNGKey(0)


def _setup():
    cfg = MarScfConfig(image_shape=(8, 8, 3), L=2, K=1, hidden_channels=8,
                       coupling="affine", use_attention=False, prior="gaussian")
    model = MarScfFlow(cfg)
    params = model.init(KEY)

    def metric_fn(params, batch, rng):
        _, nll = model.forward(params, batch, rng=rng, train=False)
        return nll

    return model, params, metric_fn


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_eval_matches_single_device():
    """pmean over shards == mean over the full batch (same rng per shard is
    avoided by folding, so compare with a deterministic metric)."""
    model, params, _ = _setup()

    def metric_fn(params, batch, rng):
        del rng  # deterministic: no dequant noise
        logdet = jnp.zeros((batch.shape[0],), jnp.float32)
        _, obj = model.encode(params, batch, logdet)
        return -obj

    mesh = make_mesh()
    x = jax.random.uniform(KEY, (16, 3, 8, 8)) - 0.5
    sharded = make_eval_step(metric_fn, mesh)
    single = make_eval_step(metric_fn, None)
    v_sh = float(sharded(params, shard_batch(mesh, x), KEY))
    v_si = float(single(params, x, KEY))
    np.testing.assert_allclose(v_sh, v_si, rtol=1e-5, atol=1e-5)


def test_train_step_grads_match_single_device():
    model, params, _ = _setup()

    def loss_fn(params, batch, rng):
        del rng
        logdet = jnp.zeros((batch.shape[0],), jnp.float32)
        _, obj = model.encode(params, batch, logdet)
        return jnp.mean(-obj) * 1e-4

    mesh = make_mesh()
    opt = optax.sgd(1e-3)
    x = jax.random.uniform(KEY, (16, 3, 8, 8)) - 0.5

    step_sh = make_train_step(loss_fn, opt, mesh, donate=False)
    step_si = make_train_step(loss_fn, opt, None, donate=False)

    p_sh, _, l_sh = step_sh(params, opt.init(params), shard_batch(mesh, x), KEY)
    p_si, _, l_si = step_si(params, opt.init(params), x, KEY)

    np.testing.assert_allclose(float(l_sh), float(l_si), rtol=1e-5)
    flat_sh = jax.tree.leaves(p_sh)
    flat_si = jax.tree.leaves(p_si)
    for a, b in zip(flat_sh, flat_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_graft_dryrun_multichip():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_two_process_multihost_matches_single():
    """Spawn 2 jax.distributed CPU processes (4 virtual devices each) running
    scripts/multihost_worker.py; their global-batch loss/grad must equal the
    single-process computation (VERDICT r1 item 8; parallel/multihost.py)."""
    import socket
    import subprocess
    import sys

    import numpy as np

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [subprocess.Popen(
        [sys.executable, "scripts/multihost_worker.py", str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        outs.append([float(v) for v in line.split()[1:]])

    # single-process reference
    gb = np.arange(8 * 3 * 4 * 4, dtype=np.float32).reshape(8, 3, 4, 4)
    gb = np.sin(gb * 0.1)
    w = np.full((3, 4, 4), 0.5, np.float32)
    ref_loss = np.mean((gb * w[None]) ** 2)
    import jax
    import jax.numpy as jnp

    g = jax.grad(lambda w: jnp.mean((jnp.asarray(gb) * w[None]) ** 2))(
        jnp.asarray(w))
    ref_gradsum = float(jnp.sum(g))

    for loss, gradsum in outs:
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
        np.testing.assert_allclose(gradsum, ref_gradsum, rtol=1e-4, atol=1e-6)
