#!/usr/bin/env python
"""Build pklv4 LR/HR training pickles from an image directory.

Reference: prepare_data.py (random crops + MATLAB-bicubic downscale,
to_pklv4 36-44, main 71-93). PNG reading uses a minimal decoder (no PIL in
this environment); unsupported formats are skipped with a warning.
"""
import argparse
import glob
import os
import sys

import numpy as np

from gpnf_tpu.data.lrhr import to_pklv4
from gpnf_tpu.utils.png import read_png  # noqa: F401  (re-export: measure.py/tests import it)
from gpnf_tpu.utils.imresize import imresize




def main():
    p = argparse.ArgumentParser()
    p.add_argument("img_dir")
    p.add_argument("--out_prefix", default="./datasets/custom")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--crop", type=int, default=160, help="HR crop size (0=full)")
    p.add_argument("--crops_per_img", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    paths = sorted(glob.glob(os.path.join(args.img_dir, "*.png")))
    assert paths, f"no PNGs under {args.img_dir}"

    hrs, lrs = [], []
    for path in paths:
        try:
            img = read_png(path)
        except Exception as e:  # noqa: BLE001
            print(f"skip {path}: {e}", file=sys.stderr)
            continue
        crops = [img]
        if args.crop and img.shape[0] >= args.crop and img.shape[1] >= args.crop:
            crops = []
            for _ in range(args.crops_per_img):
                y = int(rng.integers(0, img.shape[0] - args.crop + 1))
                x = int(rng.integers(0, img.shape[1] - args.crop + 1))
                crops.append(img[y : y + args.crop, x : x + args.crop])
        for c in crops:
            h = c.shape[0] - c.shape[0] % args.scale
            w = c.shape[1] - c.shape[1] % args.scale
            c = c[:h, :w]
            lr = np.clip(imresize(c.astype(np.float64), 1.0 / args.scale), 0, 255)
            hrs.append(c.astype(np.uint8))
            lrs.append(lr.astype(np.uint8))

    to_pklv4(hrs, f"{args.out_prefix}.pklv4")
    to_pklv4(lrs, f"{args.out_prefix}_X{args.scale}.pklv4")
    print(f"{len(hrs)} pairs -> {args.out_prefix}.pklv4 / _X{args.scale}.pklv4")


if __name__ == "__main__":
    main()
