#!/usr/bin/env python
"""Quantify the LPIPS substitutes' fidelity (r3 VERDICT item 9).

AlexNet-LPIPS (Measure.py:31-53) is unobtainable in this zero-egress env;
the build ships two substitutes: `lpips_rf` (random-feature LPIPS recipe,
utils/metrics.py) and `lpips_proxy` (self-supervised trained encoder,
utils/perceptual.py). This script bounds their fidelity on a corruption
ladder — the standard sanity protocol for a perceptual metric without
human MOS data:

  1. build textured base images (filtered noise + edges: synthetic but
     spectrum-shaped like natural crops);
  2. corrupt each with {gaussian blur, additive noise, JPEG-ish block-DCT
     quantization, bilinear down-up} at 6 severities;
  3. per corruption: Spearman rank-correlate each metric against severity
     (a usable perceptual metric must be monotone in severity);
  4. across ALL pairs: Spearman of each substitute against PSNR/SSIM
     (they should agree on gross ranking while not being identical).

Writes docs/LPIPS_PROXY_VALIDATION.md. CPU-only, no TPU required.
"""
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# corruption ladder
# ---------------------------------------------------------------------------
def _gauss_kernel(sigma):
    r = max(1, int(3 * sigma))
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return k / k.sum()


def blur(img, sigma):
    if sigma <= 0:
        return img.copy()
    k = _gauss_kernel(sigma)
    out = img.astype(np.float64)
    pad = len(k) // 2
    # separable conv with edge padding, per channel
    out = np.pad(out, ((pad, pad), (0, 0), (0, 0)), mode="edge")
    out = np.stack([np.convolve(out[:, j, c], k, mode="valid")
                    for j in range(img.shape[1])
                    for c in range(img.shape[2])], axis=1)
    out = out.reshape(img.shape[0], img.shape[1], img.shape[2])
    out = np.pad(out, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    out = np.stack([np.convolve(out[i, :, c], k, mode="valid")
                    for i in range(img.shape[0])
                    for c in range(img.shape[2])], axis=0)
    # stacked (H*C, W) with channel fastest -> (H, C, W) -> (H, W, C)
    out = out.reshape(img.shape[0], img.shape[2], img.shape[1])
    return out.transpose(0, 2, 1).astype(np.float32)


def add_noise(img, sigma, rng):
    return np.clip(img + rng.normal(0, sigma, img.shape), 0, 1).astype(
        np.float32)


def _dct_mat(n=8):
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] /= np.sqrt(2)
    return (m * np.sqrt(2.0 / n)).astype(np.float64)


def jpegish(img, q):
    """Block-DCT quantization: q in (0, 1]; smaller = harsher."""
    n = 8
    d = _dct_mat(n)
    h, w, c = img.shape
    hh, ww = h - h % n, w - w % n
    out = img.copy().astype(np.float64)
    # luminance-like flat quant table scaled by 1/q
    step = (np.arange(n)[:, None] + np.arange(n)[None, :] + 1) / (8.0 * q)
    for ci in range(c):
        for i in range(0, hh, n):
            for j in range(0, ww, n):
                b = out[i:i + n, j:j + n, ci] - 0.5
                coef = d @ b @ d.T
                coef = np.round(coef / step) * step
                out[i:i + n, j:j + n, ci] = d.T @ coef @ d + 0.5
    return np.clip(out, 0, 1).astype(np.float32)


def downup(img, factor):
    """Bilinear down-up by integer factor (area down, bilinear up)."""
    if factor <= 1:
        return img.copy()
    h, w, c = img.shape
    hh, ww = h // factor * factor, w // factor * factor
    small = img[:hh, :ww].reshape(
        hh // factor, factor, ww // factor, factor, c).mean(axis=(1, 3))
    # nearest-ish bilinear upsample via repeat + box blur
    up = np.repeat(np.repeat(small, factor, 0), factor, 1)
    up = blur(up, factor / 2.0)
    out = img.copy()
    out[:hh, :ww] = up
    return out.astype(np.float32)


def make_base_images(n=6, size=64, seed=0):
    """Filtered-noise textures + geometric edges: 1/f-ish spectrum."""
    rng = np.random.default_rng(seed)
    imgs = []
    for i in range(n):
        spec = rng.normal(size=(size, size, 3)) + 1j * rng.normal(
            size=(size, size, 3))
        fy = np.fft.fftfreq(size)[:, None]
        fx = np.fft.fftfreq(size)[None, :]
        amp = 1.0 / (np.sqrt(fy**2 + fx**2) + 1.0 / size)[..., None]
        img = np.real(np.fft.ifft2(spec * amp, axes=(0, 1)))
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        # add hard edges (perceptual metrics care about structure)
        x0, y0 = rng.integers(8, size - 24, 2)
        img[y0:y0 + 16, x0:x0 + 16] = rng.random(3)[None, None]
        imgs.append(img.astype(np.float32))
    return imgs


# ---------------------------------------------------------------------------
def spearman(a, b):
    """Tie-corrected Spearman (severity vectors are heavily tied: every
    ladder level repeats across the base images)."""
    from scipy.stats import spearmanr
    return float(spearmanr(np.asarray(a, np.float64),
                           np.asarray(b, np.float64)).statistic)


def main():
    from gpnf_tpu.utils.metrics import lpips_rf, psnr, ssim
    from gpnf_tpu.utils.perceptual import lpips_proxy

    rng = np.random.default_rng(1)
    bases = make_base_images()
    ladders = {
        "blur": [("sigma", s, lambda im, s=s: blur(im, s))
                 for s in (0.5, 1.0, 1.5, 2.5, 4.0, 6.0)],
        "noise": [("sigma", s, lambda im, s=s: add_noise(im, s, rng))
                  for s in (0.01, 0.03, 0.06, 0.1, 0.18, 0.3)],
        "jpegish": [("1/q", 1 / q, lambda im, q=q: jpegish(im, q))
                    for q in (2.0, 1.0, 0.5, 0.25, 0.12, 0.06)],
        "downup": [("factor", f, lambda im, f=f: downup(im, f))
                   for f in (2, 4, 8)],
    }

    rows = []  # (corruption, severity_idx, psnr, ssim, rf, proxy)
    for cname, ladder in ladders.items():
        for sev_idx, (_, sval, fn) in enumerate(ladder):
            for bi, base in enumerate(bases):
                cor = fn(base)
                rows.append((cname, sev_idx, sval,
                             psnr(base * 255, cor * 255),
                             ssim(base * 255, cor * 255),
                             lpips_rf(base, cor),
                             lpips_proxy(base, cor)))

    rows = np.array([(r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows],
                    dtype=np.float64)
    names = [r for r in ladders]
    per_corr = {}
    idx = 0
    for cname, ladder in ladders.items():
        k = len(ladder) * len(bases)
        sub = rows[idx:idx + k]
        idx += k
        per_corr[cname] = {
            "psnr": spearman(sub[:, 0], -sub[:, 2]),   # severity vs -psnr
            "ssim": spearman(sub[:, 0], -sub[:, 3]),
            "lpips_rf": spearman(sub[:, 0], sub[:, 4]),
            "lpips_proxy": spearman(sub[:, 0], sub[:, 5]),
        }

    overall = {
        "rf_vs_psnr": spearman(rows[:, 4], -rows[:, 2]),
        "rf_vs_ssim": spearman(rows[:, 4], -rows[:, 3]),
        "proxy_vs_psnr": spearman(rows[:, 5], -rows[:, 2]),
        "proxy_vs_ssim": spearman(rows[:, 5], -rows[:, 3]),
        "rf_vs_proxy": spearman(rows[:, 4], rows[:, 5]),
    }

    lines = [
        "# LPIPS-substitute validation (r4)",
        "",
        "AlexNet-LPIPS (`Measure.py:31-53`) needs pretrained torchvision",
        "weights — unobtainable here (zero egress). The build ships two",
        "substitutes: `lpips_rf` (LPIPS recipe over fixed random features,",
        "`utils/metrics.py:61`) and `lpips_proxy` (trained self-supervised",
        "encoder, `utils/perceptual.py`). This page bounds their fidelity on",
        "a corruption ladder (blur / additive noise / JPEG-ish block-DCT",
        "quantization / bilinear down-up at increasing severity over",
        f"{len(bases)} textured base images): a usable perceptual distance",
        "must rank severity monotonically and agree with PSNR/SSIM on gross",
        "ordering. Produced by `scripts/validate_lpips_proxy.py`.",
        "",
        "## Spearman rank correlation vs severity (higher = better; PSNR/",
        "SSIM shown as the bar to clear)",
        "",
        "| corruption | -PSNR | -SSIM | lpips_rf | lpips_proxy |",
        "|---|---|---|---|---|",
    ]
    for cname in names:
        c = per_corr[cname]
        lines.append(f"| {cname} | {c['psnr']:.3f} | {c['ssim']:.3f} | "
                     f"{c['lpips_rf']:.3f} | {c['lpips_proxy']:.3f} |")
    lines += [
        "",
        "## Cross-metric agreement over all pairs",
        "",
        "| pair | Spearman |",
        "|---|---|",
        f"| lpips_rf vs -PSNR | {overall['rf_vs_psnr']:.3f} |",
        f"| lpips_rf vs -SSIM | {overall['rf_vs_ssim']:.3f} |",
        f"| lpips_proxy vs -PSNR | {overall['proxy_vs_psnr']:.3f} |",
        f"| lpips_proxy vs -SSIM | {overall['proxy_vs_ssim']:.3f} |",
        f"| lpips_rf vs lpips_proxy | {overall['rf_vs_proxy']:.3f} |",
        "",
        "## Reading",
        "",
        "- Monotonicity in severity is the hard requirement: every ladder",
        "  column for the substitutes should be near the PSNR/SSIM bar.",
        "- Perfect correlation with PSNR would make the substitutes",
        "  redundant; values in ~0.6-0.95 mean they carry structure-weighted",
        "  information while preserving gross ranking.",
        "- Absolute values are NOT AlexNet-LPIPS-comparable; CSVs label the",
        "  columns `lpips_rf` / `lpips_proxy`, never `lpips`.",
        "",
    ]
    out = os.path.join(REPO, "docs", "LPIPS_PROXY_VALIDATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
