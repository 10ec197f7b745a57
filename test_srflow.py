#!/usr/bin/env python
"""SRFlow evaluation CLI — TPU-native equivalent of the reference test.py:
walks the WHOLE val set, super-resolves at each heat (batched sampling, not
per-image), writes the SR images as PNGs under results/<conf>/<heat>/, and
accumulates a resumable, atomically-renamed CSV with the reference's column
schema (conf, heat, name, PSNR, SSIM, LPIPS, 'LRC PSNR' — test.py:150-165).
LPIPS has no wheel in this environment; the column is emitted as n/a unless
a substitute metric is enabled (utils/metrics.py)."""
import argparse
import csv
import os

import numpy as np


def _read_done(path):
    done = set()
    if os.path.isfile(path):
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                done.add((float(row["heat"]), int(row["name"])))
    return done


def _write_rows(path, rows, fieldnames):
    tmp = path + "_"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, path)  # atomic rename (test.py:159-165)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--ckpt", default=None, help="checkpoint npz (default: latest)")
    p.add_argument("--heats", default="0.5,0.75,1.0")
    p.add_argument("--out_dir", default="./results")
    p.add_argument("--n_max", type=int, default=None,
                   help="cap on val images (default: full set, like test.py)")
    p.add_argument("--batch", type=int, default=8,
                   help="sampling batch per heat")
    p.add_argument("--no_images", action="store_true",
                   help="skip writing SR PNGs")
    p.add_argument("--lpips_rf", action="store_true",
                   help="fill the LPIPS column with the in-env random-feature "
                        "perceptual distance (not comparable to AlexNet-LPIPS)")
    p.add_argument("--lpips_proxy", action="store_true",
                   help="fill the LPIPS column with the TRAINED-feature "
                        "perceptual proxy (utils/perceptual.py)")
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
    conf = opt.get("name") or os.path.basename(args.opt).replace(".yml", "")
    model_cfg, _ = build_from_opt(opt)
    model = SRFlowNet(model_cfg)
    params = model.init(jax.random.PRNGKey(0))

    # eval configs don't derive the models dir; fall back to the training
    # experiment layout so a fresh test run picks up the trained weights
    root = (opt["path"].get("root") if opt["path"] else None) or "."
    default_models = os.path.join(root, "experiments", conf, "models")
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
    measure = Measure(lpips_substitute=args.lpips_rf,
                      lpips_proxy=args.lpips_proxy)
    heats = [float(h) for h in args.heats.split(",")]

    test_dir = os.path.join(args.out_dir, conf)
    os.makedirs(test_dir, exist_ok=True)
    csv_path = os.path.join(test_dir, "measure_full.csv")
    fieldnames = ["conf", "heat", "name", "PSNR", "SSIM", "LPIPS", "LRC PSNR"]
    done = _read_done(csv_path)
    rows = []
    if os.path.isfile(csv_path):
        with open(csv_path, newline="") as f:
            rows = list(csv.DictReader(f))

    # materialize the val pairs once; batch per heat (uniform crop sizes)
    pairs = []
    for lr_img, hr_img in val_set.batches(1, shuffle=False):
        pairs.append((lr_img[0], hr_img[0]))
        if args.n_max is not None and len(pairs) >= args.n_max:
            break

    rng = jax.random.PRNGKey(1)
    for heat in heats:
        heat_dir = os.path.join(test_dir, f"{heat:0.2f}".replace(".", ""))
        if not args.no_images:
            os.makedirs(heat_dir, exist_ok=True)
        todo = [i for i in range(len(pairs)) if (heat, i) not in done]
        for c0 in range(0, len(todo), args.batch):
            chunk = todo[c0 : c0 + args.batch]
            lr_b = np.stack([pairs[i][0] for i in chunk])
            rng, sub = jax.random.split(rng)
            sr_b = np.asarray(sampler(params, jnp.asarray(lr_b), sub, heat))
            for j, i in enumerate(chunk):
                sr_u8 = np.clip(sr_b[j].transpose(1, 2, 0) * 255, 0, 255)
                hr_u8 = pairs[i][1].transpose(1, 2, 0) * 255
                lr_u8 = pairs[i][0].transpose(1, 2, 0) * 255
                psnr_v, ssim_v, lpips_v = measure.measure(sr_u8, hr_u8)
                lrc = lr_consistency_psnr(sr_u8, lr_u8, model_cfg.scale)
                row = {"conf": conf, "heat": heat, "name": i,
                       "PSNR": round(psnr_v, 3), "SSIM": round(ssim_v, 4),
                       "LPIPS": "n/a" if lpips_v is None else round(lpips_v, 4),
                       "LRC PSNR": round(lrc, 3)}
                rows.append(row)
                print(", ".join(f"{k}: {v}" for k, v in row.items()))
                if not args.no_images:
                    from gpnf_tpu.utils.png import write_png

                    write_png(os.path.join(heat_dir, f"{i:06d}.png"),
                               sr_u8.astype(np.uint8))
            _write_rows(csv_path, rows, fieldnames)

    if rows:
        _write_rows(csv_path, rows, fieldnames)
        for heat in heats:
            hr_rows = [r for r in rows if float(r["heat"]) == heat]
            if hr_rows:
                mean_psnr = np.mean([float(r["PSNR"]) for r in hr_rows])
                mean_ssim = np.mean([float(r["SSIM"]) for r in hr_rows])
                mean_lrc = np.mean([float(r["LRC PSNR"]) for r in hr_rows])
                lp = [r["LPIPS"] for r in hr_rows if r["LPIPS"] != "n/a"]
                lp_s = f"{np.mean([float(v) for v in lp]):.4f}" if lp else "n/a"
                print(f"Mean heat {heat}: PSNR: {mean_psnr:.2f}, "
                      f"SSIM: {mean_ssim:.4f}, LPIPS: {lp_s}, "
                      f"LRC PSNR: {mean_lrc:.2f}")
    print(f"Results in: {csv_path}")


if __name__ == "__main__":
    main()
