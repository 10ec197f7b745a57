"""Whole-model weight-transplant parity vs the torch reference.

The per-layer transplant tests (test_reference_parity.py) pin each bijector
family; these tests pin the *composition*: step order, level wiring, split /
prior routing, and the base-logdet / bits-per-dim constants. A complete
reference `MarScfFlow` (marscf_main.py:178-220) is built on CPU, its actnorms
data-dependent-initialized, ALL weights transplanted into the JAX
`MarScfFlow`, and the per-sample NLL (bits/dim) on a fixed dequantized batch
must agree to <= 1e-3 bits/dim (the BASELINE.md parity criterion).

Dequantization noise is the one stochastic input; both sides are fed the same
pre-dequantized tensor and the same base logdet -log(256)*D
(marscf_main.py:196-202), so the comparison is exact in expectation.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_transplant import (copy_marscf, import_marscf_main,  # noqa: E402
                            patch_cuda_away, t2n)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow  # noqa: E402

RNG = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    patch_cuda_away(monkeypatch)


def _randomize_zero_convs(ref_model):
    """Zero-init output convs make couplings/splits identity maps, which
    would hide conditioning/wiring bugs — give them small random weights."""
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for m in ref_model.modules():
            if type(m).__name__ == "Conv2dZeros":
                m.weight.normal_(0.0, 0.02, generator=gen)
                m.bias.normal_(0.0, 0.01, generator=gen)
                m.logs.normal_(0.0, 0.1, generator=gen)


def _build_ref(coupling, L, K, C, batch):
    ref_main = import_marscf_main()

    torch.manual_seed(0)
    ref = ref_main.MarScfFlow(batch, (32, 32, 3), coupling, L, K, C)
    _randomize_zero_convs(ref)
    # Trigger the data-dependent actnorm init (train-mode only,
    # common_modules.py:141-151), then freeze into eval mode.
    x_init = torch.tensor(
        (RNG.random((batch, 3, 32, 32), dtype=np.float32) - 0.5))
    with torch.no_grad():
        ref(x_init)
    ref.eval()
    return ref


def _nll_pair(coupling, L=2, K=2, C=32, batch=2):
    ref = _build_ref(coupling, L, K, C, batch)

    # fixed dequantized input in [-0.5, 0.5 + 1/256)
    x = (RNG.random((batch, 3, 32, 32), dtype=np.float32) - 0.5)
    z0 = x + RNG.random((batch, 3, 32, 32), dtype=np.float32) / 256.0
    num_dims = 3 * 32 * 32
    base = -math.log(256.0) * num_dims

    with torch.no_grad():
        _, obj_ref = ref.flow(torch.tensor(z0),
                              logdet=torch.full((batch,), base), reverse=False)
    nll_ref = -t2n(obj_ref) / (math.log(2.0) * num_dims)

    cfg = MarScfConfig(image_shape=(32, 32, 3), L=L, K=K, hidden_channels=C,
                       coupling=coupling, num_blocks=10, num_components=32,
                       drop_prob=0.2, use_attention=True, prior="convlstm",
                       prior_hidden=32, prior_layers=3, scan_steps=False,
                       remat=False, compute_dtype="float32")
    model = MarScfFlow(cfg)
    params = copy_marscf(ref, L, K)

    encode = jax.jit(lambda p, z, ld: model.encode(p, z, ld))
    _, obj = encode(params, jnp.asarray(z0),
                    jnp.full((batch,), base, jnp.float32))
    nll = -np.asarray(obj) / (math.log(2.0) * num_dims)
    return nll_ref, nll


@pytest.mark.parametrize("coupling", ["mixlogcdf", "affine"])
def test_marscf_fullmodel_nll_parity(coupling):
    nll_ref, nll = _nll_pair(coupling)
    assert np.all(np.isfinite(nll_ref)) and np.all(np.isfinite(nll))
    diff = np.max(np.abs(nll - nll_ref))
    assert diff <= 1e-3, (
        f"{coupling}: bits/dim diff {diff:.2e} (ref {nll_ref}, mine {nll})")


@pytest.mark.slow
def test_marscf_flagship_size_nll_parity():
    """FLAGSHIP composition pin: L=3, K=4, C=96 — the north-star benchmark
    config (README.md:40) — transplant NLL parity <= 1e-3 bits/dim. The toy
    L=2/K=2/C=32 test above pins the mechanics; this one pins the exact
    3-level wiring (level-3 4x4-patch attention, per-level prior kernel
    sizes/dilations, split routing) at production size."""
    nll_ref, nll = _nll_pair("mixlogcdf", L=3, K=4, C=96, batch=1)
    assert np.all(np.isfinite(nll_ref)) and np.all(np.isfinite(nll))
    diff = np.max(np.abs(nll - nll_ref))
    assert diff <= 1e-3, (
        f"flagship: bits/dim diff {diff:.2e} (ref {nll_ref}, mine {nll})")


# ---------------------------------------------------------------------------
# SRFlow: complete SRFlowNet (RRDB encoder + conditional flow), encode NLL
# parity + decode round trip. Reference: models/modules/SRFlowNet_arch.py
# 83-116 (normal_flow) / 145-158 (reverse_flow).
#
# The reference CondAffineSeparatedAndCond hard-codes in_channels_rrdb=320
# (FlowAffineCouplingsAblation.py:30) and FlowUpsamplerNet hard-codes 64
# rrdb channels per stacked block (get_n_rrdb_channels), so the small test
# model must keep nf=64 with 4 stacked blocks; the flow itself is shrunk to
# K=2, hidden 32, HR 32x32.
# ---------------------------------------------------------------------------
SR_K, SR_L = 2, 3
SR_OPT = {
    "scale": 4,
    "datasets": {"train": {"quant": 255}},
    "network_G": {
        "train_RRDB_delay": None,
        "flow": {
            "K": SR_K, "L": SR_L,
            "coupling": "CondAffineSeparatedAndCond",
            "additionalFlowNoAffine": 2,
            "hidden_channels": 32,
            "CondAffineSeparatedAndCond": {"hidden_channels": 32},
            "split": {"enable": True},
            "augmentation": {"noiseQuant": False},
            "stackRRDB": {"blocks": [0, 1, 2, 3], "concat": True},
            "fea_up0": True, "fea_up-1": True,
        },
    },
}


def _build_srflow_pair():
    from models.modules.SRFlowNet_arch import SRFlowNet as RefSRFlowNet

    from gpnf_tpu.models.srflow import SRFlowConfig, SRFlowNet

    torch.manual_seed(1)
    ref = RefSRFlowNet(in_nc=3, out_nc=3, nf=64, nb=4, gc=32, scale=4,
                       K=SR_K, opt=SR_OPT)
    _randomize_zero_convs(ref)
    gt_init = torch.rand(2, 3, 32, 32)
    lr_init = torch.rand(2, 3, 8, 8)
    with torch.no_grad():  # actnorm ddi (FlowActNorms.py:45-59, train only)
        ref(gt=gt_init, lr=lr_init, reverse=False, add_gt_noise=True)
    ref.eval()

    cfg = SRFlowConfig(scale=4, hr_size=32, K=SR_K, L=SR_L,
                       hidden_channels=32, additional_flow_no_affine=2,
                       use_attention=True, attn_heads=5, attn_score="softmax",
                       rrdb_nf=64, rrdb_nb=4, rrdb_gc=32,
                       stack_blocks=(0, 1, 2, 3), stack_concat=True,
                       quant=255, scan_steps=False, remat=False)
    mine = SRFlowNet(cfg)
    from ref_transplant import copy_srflownet
    params = copy_srflownet(ref)
    return ref, mine, params


def test_srflow_fullmodel_parity():
    ref, mine, params = _build_srflow_pair()

    gt = torch.rand(2, 3, 32, 32)  # pre-dequantized; noiseQuant disabled
    lr = torch.rand(2, 3, 8, 8)

    # conditioning-feature parity, incl. the reference's inplace-lrelu
    # mutation of stored fea_upN (RRDBNet_arch.py:106-119) and the
    # non-antialiased bilinear fea_up0/fea_up-1 downsamples (136-141)
    with torch.no_grad():
        ref_enc = ref.rrdbPreprocessing(lr)
    my_enc = mine.rrdb_preprocess(params, jnp.asarray(t2n(lr)))
    for k in ("fea_up2", "fea_up1", "fea_up0", "last_lr_fea"):
        np.testing.assert_allclose(np.asarray(my_enc[k]), t2n(ref_enc[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    with torch.no_grad():
        z_ref, nll_ref, _ = ref(gt=gt, lr=lr, reverse=False, add_gt_noise=True)

    gt_j, lr_j = jnp.asarray(t2n(gt)), jnp.asarray(t2n(lr))
    fwd = jax.jit(lambda p, g, l: mine.forward(p, g, l, rng=None))
    z, nll, _ = fwd(params, gt_j, lr_j)

    assert np.all(np.isfinite(np.asarray(nll)))
    diff = np.max(np.abs(np.asarray(nll) - t2n(nll_ref)))
    assert diff <= 1e-3, f"bits/dim diff {diff:.2e}"
    np.testing.assert_allclose(np.asarray(z), t2n(z_ref), rtol=5e-3, atol=5e-3)

    # decode parity: same z, eps_std=0 -> identical SR images
    with torch.no_grad():
        sr_ref, _ = ref(lr=lr, z=z_ref, eps_std=0.0, reverse=True,
                        add_gt_noise=True)
    rev = jax.jit(lambda p, l, zz: mine.reverse(
        p, l, z=zz, rng=jax.random.PRNGKey(0), eps_std=0.0))
    sr, _ = rev(params, lr_j, z)
    np.testing.assert_allclose(np.asarray(sr), t2n(sr_ref), rtol=1e-2,
                               atol=2e-3)
