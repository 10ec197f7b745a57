#!/usr/bin/env python
"""Directory-comparison metric CLI — equivalent of Measure.py:84-134:
PSNR/SSIM(/LPIPS when available) between paired images in two directories.
Supports PNG (built-in decoder) and .npy arrays."""
import argparse
import glob
import os

import numpy as np

from gpnf_tpu.utils.metrics import Measure


def load_image(path):
    if path.endswith(".npy"):
        return np.load(path)
    from prepare_data import read_png

    return read_png(path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--ext", default="png")
    args = p.parse_args()

    a_paths = sorted(glob.glob(os.path.join(args.dir_a, f"*.{args.ext}")))
    b_paths = sorted(glob.glob(os.path.join(args.dir_b, f"*.{args.ext}")))
    assert a_paths and len(a_paths) == len(b_paths), (len(a_paths), len(b_paths))

    m = Measure()
    psnrs, ssims, lpipss = [], [], []
    for pa, pb in zip(a_paths, b_paths):
        ia, ib = load_image(pa), load_image(pb)
        psnr_v, ssim_v, lpips_v = m.measure(ia.astype(np.float64),
                                            ib.astype(np.float64))
        psnrs.append(psnr_v)
        ssims.append(ssim_v)
        if lpips_v is not None:
            lpipss.append(lpips_v)
        print(f"{os.path.basename(pa)}: psnr {psnr_v:.3f} ssim {ssim_v:.4f}"
              + (f" lpips {lpips_v:.4f}" if lpips_v is not None else ""))
    print(f"mean: psnr {np.mean(psnrs):.3f} ssim {np.mean(ssims):.4f}"
          + (f" lpips {np.mean(lpipss):.4f}" if lpipss else " lpips n/a"))


if __name__ == "__main__":
    main()
