"""Assembled video-SR model (models/video_sr.py).

Reference capability: MDVR_cascade_v41_arch.py:51-185 (MDVR_CA_SA) and the
NAS_GAN forward's align->fuse->recon->upsample pipeline
(model_search.py:525-620) — dead (unresolvable imports) in the reference,
live end-to-end here.
"""
import jax
import jax.numpy as jnp
import optax
import pytest

from gpnf_tpu.models.video_sr import (VideoSR, VideoSRConfig,
                                      charbonnier_sr_loss, pixel_shuffle)
from gpnf_tpu.parallel.train_step import make_train_step

SMALL = VideoSRConfig(nf=8, nframes=3, groups=2, front_rbs=1,
                      levels=((4, 2, 0), (4, 1, 1)))


def _data(key, cfg, b=2, h=8, w=8):
    k1, k2 = jax.random.split(key)
    clips = jax.random.uniform(k1, (b, cfg.nframes, 3, h, w))
    hr = jax.random.uniform(
        k2, (b, 3, h * cfg.total_scale, w * cfg.total_scale))
    return clips, hr


def test_pixel_shuffle_matches_torch_ordering():
    torch = pytest.importorskip("torch")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 3, 4))
    want = torch.pixel_shuffle(torch.from_numpy(jax.device_get(x)), 2).numpy()
    got = jax.device_get(pixel_shuffle(x, 2))
    assert jnp.allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("align,fusion", [("dkc", "conv"), ("pcd", "tsa")])
def test_forward_shape_and_grad(align, fusion):
    cfg = VideoSRConfig(nf=8, nframes=3, groups=2, front_rbs=1,
                        align=align, fusion=fusion,
                        levels=((4, 1, 0),))
    model = VideoSR(cfg)
    params = model.init(jax.random.PRNGKey(0))
    clips, hr = _data(jax.random.PRNGKey(1), cfg)
    sr = jax.jit(model.apply)(params, clips)
    assert sr.shape == hr.shape
    assert jnp.all(jnp.isfinite(sr))

    loss_fn = charbonnier_sr_loss(model)
    grads = jax.grad(lambda p: loss_fn(p, (clips, hr), None))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # most parameters participate at step 0. The offset-GENERATING chain
    # legitimately has zero grad at init: the DCN offset conv is zero-init
    # (standard DCN/reference behavior), so nothing flows upstream of it
    # until off_w takes its first step.
    nonzero = sum(bool(jnp.any(g != 0)) for g in leaves)
    assert nonzero >= len(leaves) // 2, (nonzero, len(leaves))


def test_two_level_cascade_is_x16():
    model = VideoSR(SMALL)
    params = model.init(jax.random.PRNGKey(0))
    clips, hr = _data(jax.random.PRNGKey(1), SMALL, b=1)
    assert SMALL.total_scale == 16
    sr = jax.jit(model.apply)(params, clips)
    assert sr.shape == hr.shape


def test_train_smoke_loss_decreases():
    cfg = VideoSRConfig(nf=8, nframes=3, groups=2, front_rbs=1,
                        levels=((4, 1, 0),))
    model = VideoSR(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    step = make_train_step(charbonnier_sr_loss(model), opt, mesh=None,
                           donate=False)
    # fixed clip/target pair: loss must fall monotonically-ish
    key = jax.random.PRNGKey(7)
    clips = jax.random.uniform(key, (2, 3, 3, 8, 8))
    hr = jnp.repeat(jnp.repeat(clips[:, 1], 4, axis=-2), 4, axis=-1)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, (clips, hr),
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.93, losses
    assert all(b <= a for a, b in zip(losses, losses[1:])), losses
