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
    from gpnf_tpu.utils.png import read_png

    return read_png(path)


def _to_nchw(img):
    """HWC (or HW) uint8/float -> (1, 3, H, W) float in [0, 1]."""
    x = np.asarray(img)
    if x.ndim == 2:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    if x.dtype == np.uint8 or x.max() > 1.5:
        x = x.astype(np.float32) / 255.0
    return np.transpose(x, (2, 0, 1))[None].astype(np.float32)


def compute_fid(a_paths, b_paths, batch: int = 64, seed: int = 0) -> float:
    """Random-feature FID between two image directories (unpaired; the
    in-env stand-in for the reference's Inception FID, Measure.py + README
    FID=33.6 — absolute values not comparable, see utils/fid.py)."""
    from gpnf_tpu.utils.fid import RandomFeatureEmbedder, fid_between

    def batches(paths):
        for i in range(0, len(paths), batch):
            yield np.concatenate([_to_nchw(load_image(p))
                                  for p in paths[i : i + batch]], axis=0)

    return fid_between(RandomFeatureEmbedder(seed=seed),
                       batches(a_paths), batches(b_paths))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--ext", default="png")
    p.add_argument("--fid", action="store_true",
                   help="also print random-feature FID between the two dirs")
    p.add_argument("--lpips_proxy", action="store_true",
                   help="report the trained-feature perceptual distance "
                        "(utils/perceptual.py; a documented in-env proxy, "
                        "not comparable to AlexNet-LPIPS)")
    args = p.parse_args()

    a_paths = sorted(glob.glob(os.path.join(args.dir_a, f"*.{args.ext}")))
    b_paths = sorted(glob.glob(os.path.join(args.dir_b, f"*.{args.ext}")))
    assert a_paths and len(a_paths) == len(b_paths), (len(a_paths), len(b_paths))

    if args.fid:
        print(f"fid_rf: {compute_fid(a_paths, b_paths):.4f}")

    m = Measure(lpips_proxy=args.lpips_proxy)
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
