from .datasets import get_dataset, DatasetSpec, NumpyLoader
from .transforms import shift_augment, mnist_glow_pad, random_flip

__all__ = ["get_dataset", "DatasetSpec", "NumpyLoader", "shift_augment",
           "mnist_glow_pad", "random_flip"]
