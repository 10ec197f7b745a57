#!/usr/bin/env python
"""SRFlow evaluation CLI — TPU-native equivalent of test.py: per-image SR at
each heat, PSNR/SSIM(/LPIPS when available) + LR-consistency PSNR, incremental
CSV written atomically (test.py:91-169)."""
import argparse
import csv
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--ckpt", default=None, help="checkpoint npz (default: latest)")
    p.add_argument("--heats", default="0.5,0.75,1.0")
    p.add_argument("--out_csv", default="./results/srflow_measure.csv")
    p.add_argument("--n_max", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpnf_tpu.models.srflow import SRFlowNet
    from gpnf_tpu.training.checkpoints import CheckpointManager
    from gpnf_tpu.training.srflow_loop import make_sr_sampler
    from gpnf_tpu.utils.metrics import Measure, lr_consistency_psnr
    from gpnf_tpu.utils.options import parse_options
    from train_srflow import build_from_opt, load_datasets

    opt = parse_options(args.opt, is_train=False)
    model_cfg, _ = build_from_opt(opt)
    model = SRFlowNet(model_cfg)
    params = model.init(jax.random.PRNGKey(0))

    # eval configs don't derive the models dir; fall back to the training
    # experiment layout so a fresh test run picks up the trained weights
    root = (opt["path"].get("root") if opt["path"] else None) or "."
    default_models = os.path.join(root, "experiments", opt.get("name", ""), "models")
    ckpt_dir = args.ckpt or (opt["path"].get("models") if opt["path"] else None) \
        or default_models
    if ckpt_dir and os.path.isdir(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            params = mgr.restore({"params": params})["params"]
            print(f"restored step {mgr.latest_step()} from {ckpt_dir}")
        else:
            print(f"WARNING: no checkpoint under {ckpt_dir}; evaluating random init")
    else:
        print(f"WARNING: checkpoint dir {ckpt_dir} missing; evaluating random init")

    _, val_set = load_datasets(opt, model_cfg)
    sampler = make_sr_sampler(model)
    measure = Measure()
    heats = [float(h) for h in args.heats.split(",")]

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    rows = []
    rng = jax.random.PRNGKey(1)
    for i, (lr_img, hr_img) in enumerate(val_set.batches(1, shuffle=False)):
        if i >= args.n_max:
            break
        for heat in heats:
            rng, sub = jax.random.split(rng)
            sr = sampler(params, jnp.asarray(lr_img), sub, heat)
            sr_u8 = np.clip(np.asarray(sr)[0].transpose(1, 2, 0) * 255, 0, 255)
            hr_u8 = hr_img[0].transpose(1, 2, 0) * 255
            lr_u8 = lr_img[0].transpose(1, 2, 0) * 255
            psnr_v, ssim_v, lpips_v = measure.measure(sr_u8, hr_u8)
            lrc = lr_consistency_psnr(sr_u8, lr_u8, model_cfg.scale)
            rows.append({"img": i, "heat": heat, "psnr": round(psnr_v, 3),
                         "ssim": round(ssim_v, 4),
                         "lpips": "n/a" if lpips_v is None else round(lpips_v, 4),
                         "lr_consistency_psnr": round(lrc, 3)})
            print(rows[-1])
            # incremental atomic CSV (test.py:159-165)
            tmp = args.out_csv + ".tmp"
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
            os.replace(tmp, args.out_csv)

    print(f"wrote {args.out_csv}")


if __name__ == "__main__":
    main()
