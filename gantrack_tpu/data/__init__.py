"""Data subsystem: streaming datasets, infinite loader, preprocessing."""

from .dataset import (
    GANDataset,
    ImageFolderZipDataset,
    ShardedArrayDataset,
    ZipSliceDataset,
    open_dataset,
)
from .loader import InfiniteLoader, infinite_indices

__all__ = [
    "GANDataset",
    "ImageFolderZipDataset",
    "ShardedArrayDataset",
    "ZipSliceDataset",
    "open_dataset",
    "InfiniteLoader",
    "infinite_indices",
]
