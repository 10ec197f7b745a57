"""Layer-by-layer SRFlow parity debug (run from repo root).

Walks the reference flowUpsamplerNet.encode and my FlowUpsamplerNet.encode in
lockstep on the same input, printing max |z diff| and logdet diff per layer.
"""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax as _jax_cfg

_jax_cfg.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import ref_transplant as rt
from ref_transplant import copy_srflownet, t2n

# neutralize .cuda()
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.is_available = lambda: False

import jax
import jax.numpy as jnp

from test_fullmodel_parity import SR_K, SR_L, SR_OPT


def main():
    from models.modules.SRFlowNet_arch import SRFlowNet as RefSRFlowNet

    from gpnf_tpu.models.srflow import SRFlowConfig, SRFlowNet

    torch.manual_seed(1)
    ref = RefSRFlowNet(in_nc=3, out_nc=3, nf=64, nb=4, gc=32, scale=4,
                       K=SR_K, opt=SR_OPT)
    gt_init = torch.rand(2, 3, 32, 32)
    lr_init = torch.rand(2, 3, 8, 8)
    with torch.no_grad():
        ref(gt=gt_init, lr=lr_init, reverse=False, add_gt_noise=True)
    ref.eval()

    cfg = SRFlowConfig(scale=4, hr_size=32, K=SR_K, L=SR_L,
                       hidden_channels=32, additional_flow_no_affine=2,
                       use_attention=True, attn_heads=5, attn_score="softmax",
                       rrdb_nf=64, rrdb_nb=4, rrdb_gc=32,
                       stack_blocks=(0, 1, 2, 3), stack_concat=True,
                       quant=255, scan_steps=False, remat=False)
    mine = SRFlowNet(cfg)
    params = copy_srflownet(ref)

    gt = torch.rand(2, 3, 32, 32)
    lr = torch.rand(2, 3, 8, 8)
    gt_j, lr_j = jnp.asarray(t2n(gt)), jnp.asarray(t2n(lr))

    # --- rrdb features ---
    with torch.no_grad():
        ref_enc = ref.rrdbPreprocessing(lr)
    my_enc = mine.rrdb_preprocess(params, lr_j)
    for k in sorted(set(ref_enc) & set(my_enc)):
        if ref_enc[k] is None:
            continue
        d = np.max(np.abs(np.asarray(my_enc[k]) - t2n(ref_enc[k])))
        print(f"rrdb[{k}]: shapes {tuple(ref_enc[k].shape)} vs "
              f"{tuple(my_enc[k].shape)} maxdiff {d:.3e}")

    # --- walk flow layers in lockstep ---
    import models.modules.FlowStep as RefFS
    import models.modules.Split as RefSplit
    from models.modules import flow as ref_flow

    z_ref = gt.clone()
    ld_ref = torch.zeros(2)
    z_my = gt_j
    ld_my = jnp.zeros((2,), jnp.float32)

    structure = mine.flow.structure
    my_params = params["flow"]["layers"]
    ref_layers = list(ref.flowUpsamplerNet.layers)
    ref_shapes = ref.flowUpsamplerNet.output_shapes
    assert len(structure) == len(ref_layers), (len(structure), len(ref_layers))

    for i, ((kind, mod, level), p, rl, shape) in enumerate(
            zip(structure, my_params, ref_layers, ref_shapes)):
        size = shape[2]
        ref_level = int(np.log(160 / size) / np.log(2))
        with torch.no_grad():
            if isinstance(rl, RefFS.FlowStep):
                ft_ref = ref_enc[ref.flowUpsamplerNet.levelToName[ref_level]]
                z_ref, ld_ref = rl(z_ref, ld_ref, reverse=False,
                                   rrdbResults=ft_ref)
            elif isinstance(rl, RefSplit.Split2d):
                z_ref, ld_ref, _eps = rl(z_ref, ld_ref, reverse=False, ft=None)
            else:
                z_ref, ld_ref = rl(z_ref, ld_ref, reverse=False)

        if kind == "squeeze":
            z_my, ld_my = mod.forward(p, z_my, ld_my)
        elif kind == "step":
            ft = my_enc[mine.flow.level_names[level]]
            z_my, ld_my = mod.forward(p, z_my, ld_my, ft=ft)
        else:
            ft = None
            z_my, ld_my, _eps2 = mod.forward(p, z_my, ld_my, ft=ft)

        zd = np.max(np.abs(np.asarray(z_my) - t2n(z_ref)))
        ldd = np.max(np.abs(np.asarray(ld_my) - t2n(ld_ref)))
        name = type(rl).__name__
        extra = getattr(rl, "flow_coupling", "")
        print(f"[{i:2d}] {kind:8s} {name:14s} {extra:28s} lvl {level}/{ref_level}"
              f" zdiff {zd:.3e} lddiff {ldd:.3e}")


    # --- end-to-end nll decomposition ---
    import math

    print("walk final ld ref:", t2n(ld_ref), "mine:", np.asarray(ld_my))
    with torch.no_grad():
        z_f, ld_f = ref.flowUpsamplerNet(gt=gt, rrdbResults=ref_enc,
                                         logdet=torch.zeros(2), reverse=False)
    z_fm, ld_fm = mine.flow.encode(params["flow"], gt_j, my_enc,
                                   jnp.zeros((2,), jnp.float32))
    print("flow-only ld ref:", t2n(ld_f), "mine:", np.asarray(ld_fm))

    with torch.no_grad():
        z_r, nll_r, ld_r = ref(gt=gt, lr=lr, reverse=False, add_gt_noise=True)
    z_m, nll_m, ld_m = mine.forward(params, gt_j, lr_j, rng=None)
    print("ref z final:", tuple(z_r.shape), "mine:", tuple(z_m.shape))
    print("z maxdiff:", np.max(np.abs(np.asarray(z_m) - t2n(z_r))))
    print("logdet ref:", t2n(ld_r), "mine:", np.asarray(ld_m))
    print("nll ref:", t2n(nll_r), "mine:", np.asarray(nll_m))


if __name__ == "__main__":
    main()
