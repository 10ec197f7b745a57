"""LR/HR paired dataset for SRFlow (pickled image lists, "pklv4").

Reference: data/LRHR_PKL_dataset.py (LRHR_PKLDataset 27-129, aug fns
132-179) and prepare_data.py (to_pklv4 36-44). Images are stored as lists of
uint8 HWC arrays in two pickles (`*_X4.pklv4` LR, `*.pklv4` HR). Training
crops are random LR-aligned patches with flips/rotations; values scale to
[0, 1] floats, NCHW.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


def load_pkls(path: str) -> List[np.ndarray]:
    assert os.path.isfile(path), path
    with open(path, "rb") as f:
        images = pickle.load(f)
    return [np.asarray(im) for im in images]


def to_pklv4(obj, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=4)


@dataclass
class LRHRConfig:
    lr_path: str = ""
    hr_path: str = ""
    crop_size: int = 160  # HR crop (GT_size)
    scale: int = 4
    use_flip: bool = True
    use_rot: bool = True
    center_crop_hr_size: Optional[int] = None


class LRHRDataset:
    """Paired loader; synthesizes LR by box-downsampling HR when only HR
    exists (keeps tests/benchmarks runnable without reference pickles)."""

    def __init__(self, cfg: LRHRConfig, *, train: bool = True, seed: int = 0,
                 hr_images: Optional[List[np.ndarray]] = None,
                 lr_images: Optional[List[np.ndarray]] = None):
        self.cfg = cfg
        self.train = train
        self.rng = np.random.default_rng(seed)
        # KPI draws come from their OWN stream, drawn unconditionally, so
        # logging cadence never shifts the crop/flip/rot stream (seeded
        # runs stay reproducible across logging configs)
        self._kpi_rng = np.random.default_rng(seed + 0x5EED)
        if hr_images is None:
            hr_images = load_pkls(cfg.hr_path)
        if lr_images is None:
            if cfg.lr_path and os.path.isfile(cfg.lr_path):
                lr_images = load_pkls(cfg.lr_path)
            else:
                lr_images = [self._box_down(im, cfg.scale) for im in hr_images]
        assert len(hr_images) == len(lr_images)
        self.hr = hr_images
        self.lr = lr_images
        self.measures = None  # KPI sampling (LRHR_PKL_dataset.py:106-129)

    @staticmethod
    def _box_down(im: np.ndarray, scale: int) -> np.ndarray:
        h, w = im.shape[:2]
        h, w = h - h % scale, w - w % scale
        im = im[:h, :w].astype(np.float32)
        im = im.reshape(h // scale, scale, w // scale, scale, -1).mean((1, 3))
        return im.astype(np.uint8)

    def __len__(self):
        return len(self.hr)

    def sample_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (lr, hr) as float32 CHW in [0, 1]."""
        cfg = self.cfg
        hr, lr = self.hr[idx], self.lr[idx]
        if cfg.center_crop_hr_size:
            hr = _center_crop(hr, cfg.center_crop_hr_size)
            lr = _center_crop(lr, cfg.center_crop_hr_size // cfg.scale)
        if self.train and cfg.crop_size:
            lr_crop = cfg.crop_size // cfg.scale
            y = int(self.rng.integers(0, lr.shape[0] - lr_crop + 1))
            x = int(self.rng.integers(0, lr.shape[1] - lr_crop + 1))
            lr = lr[y : y + lr_crop, x : x + lr_crop]
            hr = hr[y * cfg.scale : y * cfg.scale + cfg.crop_size,
                    x * cfg.scale : x * cfg.scale + cfg.crop_size]
            if cfg.use_flip and self.rng.random() < 0.5:
                lr, hr = lr[:, ::-1], hr[:, ::-1]
            if cfg.use_rot:
                k = int(self.rng.integers(0, 4))
                lr, hr = np.rot90(lr, k), np.rot90(hr, k)
        lr = np.ascontiguousarray(lr.transpose(2, 0, 1)).astype(np.float32) / 255.0
        hr = np.ascontiguousarray(hr.transpose(2, 0, 1)).astype(np.float32) / 255.0
        # KPI sampling: keep pixel means/stds of the first and ~5% of pairs
        # as a data-sanity signal (LRHR_PKL_dataset.py:106-112)
        kpi_draw = self._kpi_rng.random()  # unconditional: cadence-invariant
        if self.measures is None or kpi_draw < 0.05:
            self.measures = {
                "hr_means": float(np.mean(hr)), "hr_stds": float(np.std(hr)),
                "lr_means": float(np.mean(lr)), "lr_stds": float(np.std(lr)),
            }
        return lr, hr

    def print_and_reset(self, tag: str, log_fn=print):
        """Emit the sampled KPI line and clear it
        (LRHR_PKL_dataset.py:123-129)."""
        m = self.measures or {}
        log_fn("[KPI] " + tag + ": "
               + ", ".join(f"{k}={m[k]:.2f}" for k in sorted(m)))
        self.measures = None

    def batches(self, batch_size: int, *, shuffle: Optional[bool] = None,
                drop_last: bool = True):
        shuffle = self.train if shuffle is None else shuffle
        idx = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(idx)
        end = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
        for s in range(0, end, batch_size):
            pairs = [self.sample_pair(i) for i in idx[s : s + batch_size]]
            lr = np.stack([p[0] for p in pairs])
            hr = np.stack([p[1] for p in pairs])
            yield lr, hr


def _center_crop(im: np.ndarray, size: int) -> np.ndarray:
    h, w = im.shape[:2]
    y, x = (h - size) // 2, (w - size) // 2
    return im[y : y + size, x : x + size]


def synthetic_lrhr(n: int = 16, hr_size: int = 64, scale: int = 4, seed: int = 0):
    """Deterministic structured HR images + box-downsampled LR (for tests)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hr_size, 0:hr_size].astype(np.float32) / hr_size
    hr = []
    for _ in range(n):
        phase = rng.uniform(0, 2 * np.pi, 3)
        freq = rng.uniform(1, 5, 3)
        img = 0.5 + 0.5 * np.sin(2 * np.pi * freq[None, None] * (xx + yy)[:, :, None]
                                 + phase[None, None])
        hr.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return hr
