"""Dataset factory: MNIST / CIFAR-10 / ImageNet-32/64 / synthetic.

Reference: utils.py:11-96 (`get_dataset`) built on torchvision; this build
reads the standard on-disk formats directly (CIFAR-10 python pickle batches,
MNIST idx files, ImageNet-32/64 npz or image folders) and falls back to a
deterministic synthetic dataset when no files are present (zero-egress
environments), so tests and benchmarks always run.

Pixel convention matches the reference's Normalize((0.5,), (1,)):
values live in [-0.5, 0.5] as float32, NCHW.
"""
from __future__ import annotations

import gzip
import os
import pickle
import struct
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from .transforms import mnist_glow_pad


@dataclass
class DatasetSpec:
    name: str
    image_shape: Tuple[int, int, int]  # H, W, C
    train_images: np.ndarray  # uint8 NCHW
    test_images: np.ndarray
    augment: str  # "cifar" | "none"


class NumpyLoader:
    """Shuffling mini-batch iterator with host-side augmentation.

    Replaces torch DataLoader workers; batches are contiguous numpy arrays
    ready for a single host->device transfer.
    """

    def __init__(self, images: np.ndarray, batch_size: int, *, shuffle: bool,
                 augment: str = "none", seed: int = 0, drop_last: bool = True):
        self.images = images
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self):
        n = self.images.shape[0] // self.batch_size
        if not self.drop_last and self.images.shape[0] % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[np.ndarray]:
        from . import native

        idx = np.arange(self.images.shape[0])
        if self.shuffle:
            self.rng.shuffle(idx)
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        use_native = native.available()
        for start in range(0, end, self.batch_size):
            batch = self.images[idx[start : start + self.batch_size]]
            if self.augment == "cifar":
                n = batch.shape[0]
                shifts = self.rng.integers(0, 6, size=n).astype(np.int32)
                horiz = (self.rng.random(n) < 0.5).astype(np.uint8)
                flip = (self.rng.random(n) < 0.5).astype(np.uint8)
                if use_native:  # one fused C++ pass over the batch
                    batch = native.shift_flip_augment(batch, 3, shifts, horiz, flip)
                else:
                    batch = _numpy_shift_flip(batch, 3, shifts, horiz, flip)
            if use_native:
                yield native.u8_to_centered_f32(batch)
            else:
                yield batch.astype(np.float32) / 255.0 - 0.5


def _numpy_shift_flip(batch: np.ndarray, pixels: int, shifts, horizontal,
                      flip) -> np.ndarray:
    """Numpy reference for the native kernel (same sampled decisions)."""
    n, _, h, w = batch.shape
    padded = np.pad(batch, ((0, 0), (0, 0), (pixels, pixels), (pixels, pixels)),
                    mode="edge")
    out = np.empty_like(batch)
    for i in range(n):
        s = int(shifts[i])
        if horizontal[i]:
            img = padded[i, :, pixels : pixels + h, s : s + w]
        else:
            img = padded[i, :, s : s + h, pixels : pixels + w]
        out[i] = img[:, :, ::-1] if flip[i] else img
    return out


# --------------------------------------------------------------------------
# On-disk readers
# --------------------------------------------------------------------------
def _load_cifar10(root: str):
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(base):
        return None

    def read(fn):
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        return d[b"data"].reshape(-1, 3, 32, 32)

    train = np.concatenate([read(f"data_batch_{i}") for i in range(1, 6)])
    test = read("test_batch")
    return train.astype(np.uint8), test.astype(np.uint8)


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, = struct.unpack(">i", f.read(4))
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "i" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _load_mnist(root: str):
    names = ["train-images-idx3-ubyte", "t10k-images-idx3-ubyte"]
    out = []
    for n in names:
        found = None
        for cand in (os.path.join(root, n), os.path.join(root, n + ".gz"),
                     os.path.join(root, "MNIST", "raw", n),
                     os.path.join(root, "MNIST", "raw", n + ".gz")):
            if os.path.exists(cand):
                found = cand
                break
        if found is None:
            return None
        out.append(_read_idx(found))
    return mnist_glow_pad(out[0]), mnist_glow_pad(out[1])


def _load_imagenet_npz(root: str, size: int):
    """Downsampled-ImageNet npz shards (train_data_batch_*.npz / val_data.npz)."""
    import glob

    train_files = sorted(glob.glob(os.path.join(root, "train_data_batch_*.npz")))
    val = os.path.join(root, "val_data.npz")
    if not train_files or not os.path.exists(val):
        return None

    def read(fn):
        d = np.load(fn)
        return d["data"].reshape(-1, 3, size, size).astype(np.uint8)

    return np.concatenate([read(f) for f in train_files]), read(val)


def _load_imagefolder(root: str, size: int):
    """ImageFolder-style directory reader (reference utils.py:49-76 uses
    torchvision.ImageFolder on downsampled-ImageNet directories): recursively
    reads `<root>/train/**.png` and `<root>/val/**.png` (class subdirs
    allowed and ignored — density modeling is unconditional). PNG decoding
    uses the built-in codec (no PIL in this environment)."""
    import glob

    from ..utils.png import read_png

    def read_split(split):
        paths = sorted(glob.glob(os.path.join(root, split, "**", "*.png"),
                                 recursive=True))
        if not paths:
            return None
        imgs = []
        for p in paths:
            img = read_png(p)  # (H, W, C) uint8
            if img.shape[:2] != (size, size):
                raise ValueError(f"{p}: expected {size}x{size}, got {img.shape}")
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            imgs.append(np.transpose(img, (2, 0, 1)))
        return np.stack(imgs).astype(np.uint8)

    train, val = read_split("train"), read_split("val")
    if train is None or val is None:
        return None
    return train, val


def _synthetic(size: int, n_train: int = 2048, n_test: int = 512, seed: int = 7):
    """Deterministic structured images (smooth gradients + texture)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    def make(n):
        phase = rng.uniform(0, 2 * np.pi, (n, 3, 1, 1)).astype(np.float32)
        freq = rng.uniform(1, 4, (n, 3, 1, 1)).astype(np.float32)
        img = 0.5 + 0.5 * np.sin(2 * np.pi * freq * (xx + yy)[None, None] + phase)
        img = img + rng.normal(0, 0.08, (n, 3, size, size)).astype(np.float32)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    return make(n_train), make(n_test)


def get_dataset(name: str, batch_size: int, data_root: Optional[str] = None,
                seed: int = 0, allow_synthetic: bool = True):
    """Returns (train_loader, test_loader, image_shape[HWC])."""
    name = name.lower()
    assert name in ("cifar10", "mnist", "imagenet_32", "imagenet_64", "synthetic"), name
    root = data_root or os.environ.get("GPNF_DATA_ROOT", "./data")

    loaded = None
    augment = "none"
    if name == "cifar10":
        loaded = _load_cifar10(root)
        size, augment = 32, "cifar"
    elif name == "mnist":
        loaded = _load_mnist(root)
        size = 32
    elif name == "imagenet_32":
        loaded = _load_imagenet_npz(root, 32) or _load_imagefolder(root, 32)
        size = 32
    elif name == "imagenet_64":
        loaded = _load_imagenet_npz(root, 64) or _load_imagefolder(root, 64)
        size = 64
    else:
        size = 32

    if loaded is None:
        if not allow_synthetic:
            raise FileNotFoundError(f"no on-disk data for {name} under {root}")
        loaded = _synthetic(size)

    train, test = loaded
    train_loader = NumpyLoader(train, batch_size, shuffle=True, augment=augment, seed=seed)
    test_loader = NumpyLoader(test, batch_size, shuffle=False)
    return train_loader, test_loader, (size, size, 3)


class PrefetchLoader:
    """Background-thread prefetcher: batch prep (gather + augment + convert)
    and the host->device transfer overlap the device step.

    Wraps any batch iterable; a worker thread stays `depth` batches ahead
    and (optionally) `jax.device_put`s each batch so the training loop pops
    device-resident arrays. The torch reference gets this from DataLoader
    worker processes (train.py); one thread suffices here because the prep
    path releases the GIL inside numpy/C++ augment and the transfer.

    Iteration protocol matches NumpyLoader (len = inner len, fresh epoch
    per __iter__; the worker is per-epoch and joins at exhaustion).
    """

    def __init__(self, inner, *, depth: int = 2, to_device: bool = True):
        self.inner = inner
        self.depth = max(1, depth)
        self.to_device = to_device

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        stop = threading.Event()  # set when the consumer abandons iteration

        def put_or_stop(item):
            """q.put that aborts when the consumer went away (ADVICE r4:
            a plain blocking put leaks the worker + device batches when the
            generator is dropped mid-epoch, e.g. a max_steps break)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self.inner:
                    if stop.is_set():
                        return
                    if self.to_device:
                        import jax
                        batch = jax.device_put(batch)
                    if not put_or_stop(batch):
                        return
            except BaseException as e:  # surfaced on the consumer side
                put_or_stop(e)
                return
            put_or_stop(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            try:  # unblock a put-in-flight, then reap the thread
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
