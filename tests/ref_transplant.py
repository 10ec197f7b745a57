"""Weight-transplant helpers: torch reference modules -> gpnf_tpu param pytrees.

Imported by the per-layer parity tests (test_reference_parity.py) and the
whole-model parity tests (test_fullmodel_parity.py). Importing this module
stubs torchvision/PIL (data-only deps missing from this image) and puts
/root/reference on sys.path so the reference's math modules import.

Every `copy_*` function takes a live torch reference module and returns the
parameter pytree my corresponding JAX module expects. The mappings pin my
param layout to the reference's semantics:
  - flow_modules/common_modules.py: Actnormlayer 130-187, InvertibleConv1x1
    57-127 (LU branch)
  - flow_modules/affine_coupling.py: Conv2d 27-66, Conv2dZeros 10-25
  - flow_modules/mixlogcdf_nn.py: WNConv2d 12-29, GatedAttn 105-224,
    GatedConv 227-260, Rescale 263-276
  - flow_modules/transformer.py: Transformer_attn 31-326
  - mar_prior/lstm.py ConvSeqEncoder + mar_prior/corr_prior.py priors
"""
import sys
import types

import numpy as np

for _name in ("torchvision", "torchvision.transforms",
              "torchvision.transforms.functional", "torchvision.datasets",
              "torchvision.utils", "PIL"):
    sys.modules.setdefault(_name, types.ModuleType(_name))
sys.modules["PIL"].Image = object  # type: ignore[attr-defined]
sys.modules["PIL"].ImageDraw = object  # type: ignore[attr-defined]
if "natsort" not in sys.modules:  # utils/util.py:11, checkpoint sorting only
    _natsort = types.ModuleType("natsort")
    _natsort.natsorted = sorted  # type: ignore[attr-defined]
    sys.modules["natsort"] = _natsort
sys.modules["torchvision.utils"].make_grid = None  # utils/util.py:15

import collections
import collections.abc

if not hasattr(collections, "Iterable"):  # py>=3.10 for the reference's utils
    collections.Iterable = collections.abc.Iterable  # type: ignore[attr-defined]

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax.numpy as jnp
import torch


def patch_cuda_away(monkeypatch):
    """The reference hard-codes .cuda() (transformer.py:16,36-131 etc.)."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self,
                        raising=False)
    monkeypatch.setattr(torch.cuda, "is_available", lambda: False,
                        raising=False)


def t2n(t):
    return t.detach().cpu().numpy()


def j(t):
    return jnp.asarray(t2n(t))


# -- primitives ---------------------------------------------------------------
def copy_actnorm(ref):
    """flow_modules.common_modules.Actnormlayer -> gpnf ActNorm params."""
    return {"bias": j(ref.bias).reshape(-1), "logs": j(ref.logs).reshape(-1)}


def copy_invconv_plu(ref):
    """flow_modules.common_modules.InvertibleConv1x1 (LU) -> InvConv1x1."""
    return {"p": j(ref.p),
            "l": jnp.asarray(np.tril(t2n(ref.l), -1)),
            "u": jnp.asarray(np.triu(t2n(ref.u), 1)),
            "sign_s": j(ref.sign_s),
            "log_s": j(ref.log_s)}


def copy_conv2d(ref_conv):
    """flow_modules.affine_coupling.Conv2d (conv + fused actnorm) -> params."""
    p = {"w": j(ref_conv.weight)}
    if ref_conv.do_actnorm:
        p["an_bias"] = j(ref_conv.actnorm.bias).reshape(-1)
        p["an_logs"] = j(ref_conv.actnorm.logs).reshape(-1)
    else:
        p["b"] = j(ref_conv.bias)
    return p


def copy_conv2dzeros(ref_conv):
    return {"w": j(ref_conv.weight), "b": j(ref_conv.bias),
            "logs": j(ref_conv.logs).reshape(-1)}


def copy_wnconv(ref):
    conv = ref.conv  # torch weight_norm: weight_v, weight_g
    return {"v": j(conv.weight_v), "g": j(conv.weight_g).reshape(-1),
            "b": j(conv.bias)}


def copy_wndense(ref, bias=True):
    p = {"v": j(ref.weight_v), "g": j(ref.weight_g).reshape(-1)}
    if bias:
        p["b"] = j(ref.bias)
    return p


# -- couplings ----------------------------------------------------------------
def copy_affine_coupling(ref):
    """flow_modules.affine_coupling.AffineCoupling -> AffineCoupling params."""
    return {"net": {
        "conv1": copy_conv2d(ref.NN_net.conv1),
        "conv2": copy_conv2d(ref.NN_net.conv2),
        "conv3": copy_conv2dzeros(ref.NN_net.conv3),
    }}


def copy_mixlogcdf_coupling(ref):
    """flow_modules.mixlogcdf_coupling.MixLogCDFCoupling -> params."""
    blocks = []
    for blk in ref.nn.mid_convs:
        blocks.append({
            "conv": {"conv": copy_wnconv(blk.conv.conv),
                     "gate": copy_wnconv(blk.conv.gate)},
            "norm1": {"gamma": j(blk.norm_1.weight), "beta": j(blk.norm_1.bias)},
            "attn": {"in_proj": copy_wndense(blk.attn.in_proj, bias=False),
                     "gate": copy_wndense(blk.attn.gate)},
            "norm2": {"gamma": j(blk.norm_2.weight), "beta": j(blk.norm_2.bias)},
        })
    rescale_w = (t2n(ref.nn.rescale.weight_g)
                 * np.sign(t2n(ref.nn.rescale.weight_v)))
    return {"net": {
        "in_conv": copy_wnconv(ref.nn.in_conv),
        "blocks": blocks,
        "out_conv": copy_wnconv(ref.nn.out_conv),
        "rescale": jnp.asarray(rescale_w),
    }}


def copy_transformer_attn(ref, num_heads=3):
    """Transformer_attn (flow_modules 3-head, or models/modules 5-head) ->
    InvertibleAttention params."""
    heads = range(1, num_heads + 1)
    return {
        "wq": jnp.stack([j(getattr(ref, f"convq{i}"))[:, :, 0, 0]
                         for i in heads]),
        "wk": jnp.stack([j(getattr(ref, f"convk{i}"))[:, :, 0, 0]
                         for i in heads]),
        "offset": j(ref.offset).reshape(-1),
        "offset2": j(ref.offset2).reshape(-1),
        "offset3": j(ref.offset3).reshape(-1),
        "scale": j(ref.scale).reshape(-1),
    }


# -- ConvLSTM prior -----------------------------------------------------------
def copy_convseq_encoder(ref):
    """mar_prior.lstm.ConvSeqEncoder -> ConvSeqEncoder params (all layers)."""
    layers = []
    k = 0
    while hasattr(ref.lstm, f"weight_ih_l{k}"):
        layers.append({
            "w_ih": j(getattr(ref.lstm, f"weight_ih_l{k}")),
            "w_hh": j(getattr(ref.lstm, f"weight_hh_l{k}")),
            "b_ih": j(getattr(ref.lstm, f"bias_ih_l{k}")),
            "b_hh": j(getattr(ref.lstm, f"bias_hh_l{k}")),
        })
        k += 1
    return {
        "embed_w": j(ref.conv_embed.weight),
        "embed_b": j(ref.conv_embed.bias),
        "out_w": j(ref.conv_out1.weight),
        "out_b": j(ref.conv_out1.bias),
        "lstm": {"layers": layers},
    }


def copy_uniscale_prior(ref):
    """mar_prior.corr_prior.ChannelPriorUniScale -> ChannelPriorUniScale."""
    p = {"encoder": copy_convseq_encoder(ref.prior_lstm)}
    if ref.level != ref.tot_levels:
        p["cond"] = {
            "w1": j(ref.z1_cond_network[0].weight),
            "b1": j(ref.z1_cond_network[0].bias),
            "w2": j(ref.z1_cond_network[2].weight),
            "b2": j(ref.z1_cond_network[2].bias),
        }
    return p


def copy_multiscale_prior(ref):
    """mar_prior.corr_prior.ChannelPriorMultiScale -> ChannelPriorMultiScale."""
    return {"levels": [copy_uniscale_prior(u) for u in ref.prior_list]}


def import_marscf_main():
    """Import the reference driver module.

    The reference has a root-level `utils.py` (dataset factory) shadowed by
    its `utils/` package (SRFlow infra); `marscf_main.py:27` does
    `from utils import get_dataset`, which resolves to the package here. The
    symbol is only used under `__main__`, so patch a stub onto the package.
    """
    import utils as ref_utils_pkg
    if not hasattr(ref_utils_pkg, "get_dataset"):
        ref_utils_pkg.get_dataset = lambda *a, **k: None
    import marscf_main
    return marscf_main


# -- full mAR-SCF model -------------------------------------------------------
def copy_marscf_flowstep(ref_step):
    """marscf_main.FlowStep -> gpnf FlowStep params."""
    if ref_step.coupling_type == "mixlogcdf":
        coupling = copy_mixlogcdf_coupling(ref_step.coupling)
    else:
        coupling = copy_affine_coupling(ref_step.coupling)
    return {
        "actnorm": copy_actnorm(ref_step.actnormlayer),
        "invconv": copy_invconv_plu(ref_step.invert_1x1_layer),
        "attn1": copy_transformer_attn(ref_step.attn1),
        "attn2": copy_transformer_attn(ref_step.attn2),
        "coupling": coupling,
    }


def copy_marscf(ref_model, L, K):
    """marscf_main.MarScfFlow -> gpnf MarScfFlow params (scan_steps=False)."""
    layers = list(ref_model.flow.layers)
    levels = []
    idx = 0
    for lvl in range(L):
        idx += 1  # SqueezeLayer
        steps = [copy_marscf_flowstep(layers[idx + kk]) for kk in range(K)]
        idx += K
        if lvl < L - 1:
            idx += 1  # Split2dMsC (parameter-free)
        levels.append({"steps": steps})
    return {"levels": levels,
            "prior": copy_multiscale_prior(ref_model.flow.c_prior)}


# -- SRFlow stack ---------------------------------------------------------------
def copy_flow_conv2d(ref_conv):
    """models.modules.flow.Conv2d (conv + fused ActNorm2d) -> gpnf Conv2d."""
    if ref_conv.do_actnorm:
        return {"w": j(ref_conv.weight),
                "an_bias": j(ref_conv.actnorm.bias).reshape(-1),
                "an_logs": j(ref_conv.actnorm.logs).reshape(-1)}
    return {"w": j(ref_conv.weight), "b": j(ref_conv.bias)}


def copy_flow_conv2dzeros(ref_conv):
    """models.modules.flow.Conv2dZeros -> gpnf Conv2dZeros."""
    return {"w": j(ref_conv.weight), "b": j(ref_conv.bias),
            "logs": j(ref_conv.logs).reshape(-1)}


def copy_fnet(ref_seq):
    """CondAffineSeparatedAndCond.F(): Sequential(Conv2d, ReLU, Conv2d(1x1),
    ReLU, Conv2dZeros) -> gpnf _FNet params."""
    return {"hidden": [copy_flow_conv2d(ref_seq[0]), copy_flow_conv2d(ref_seq[2])],
            "out": copy_flow_conv2dzeros(ref_seq[4])}


def copy_cond_affine(ref):
    return {"f_affine": copy_fnet(ref.fAffine),
            "f_features": copy_fnet(ref.fFeatures)}


def copy_srflow_step(ref_step):
    """models.modules.FlowStep.FlowStep -> gpnf SRFlowStep params."""
    p = {"actnorm": {"bias": j(ref_step.actnorm.bias).reshape(-1),
                     "logs": j(ref_step.actnorm.logs).reshape(-1)},
         "invconv": {"w": j(ref_step.invconv.weight)},
         "attn1": copy_transformer_attn(ref_step.attn1, num_heads=5),
         "attn2": copy_transformer_attn(ref_step.attn2, num_heads=5)}
    if hasattr(ref_step, "affine"):
        p["affine"] = copy_cond_affine(ref_step.affine)
    return p


def copy_split2d_cond(ref_split):
    return {"conv": copy_flow_conv2dzeros(ref_split.conv)}


def copy_rrdb(ref):
    """models.modules.RRDBNet_arch.RRDBNet -> gpnf RRDBNet params."""
    def conv(c):
        return {"w": j(c.weight), "b": j(c.bias)}

    def rdb(block):
        return {f"conv{i}": conv(getattr(block, f"conv{i}")) for i in range(1, 6)}

    blocks = [{"rdb1": rdb(m.RDB1), "rdb2": rdb(m.RDB2), "rdb3": rdb(m.RDB3)}
              for m in ref.RRDB_trunk.children()]
    upconvs = [conv(ref.upconv1), conv(ref.upconv2)]
    for name in ("upconv3", "upconv4", "upconv5"):
        if hasattr(ref, name):
            upconvs.append(conv(getattr(ref, name)))
    return {"conv_first": conv(ref.conv_first), "blocks": blocks,
            "trunk_conv": conv(ref.trunk_conv), "upconvs": upconvs,
            "hr_conv": conv(ref.HRconv), "conv_last": conv(ref.conv_last)}


def copy_srflownet(ref):
    """SRFlowNet_arch.SRFlowNet -> gpnf SRFlowNet params (scan_steps=False).

    Walks flowUpsamplerNet.layers in forward order; layer kinds map 1:1 onto
    my FlowUpsamplerNet.structure (squeeze / step / split). The dead `self.f`
    head (FlowUpsamplerNet.py:107-110) has no counterpart.
    """
    layers = []
    for layer in ref.flowUpsamplerNet.layers:
        name = type(layer).__name__
        if name == "SqueezeLayer":
            layers.append({})
        elif name == "FlowStep":
            layers.append(copy_srflow_step(layer))
        elif name == "Split2d":
            layers.append(copy_split2d_cond(layer))
        else:
            raise AssertionError(f"unexpected reference layer {name}")
    return {"rrdb": copy_rrdb(ref.RRDB), "flow": {"layers": layers}}
