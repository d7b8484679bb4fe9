"""Framework utilities: config, checkpointing, logging."""

from .config import EasyDict, Logger, allocate_run_dir, construct_class_by_name, dump_options, load_yaml
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint, save_image_grid
from .url import is_url, open_url

__all__ = [
    "is_url",
    "open_url",
    "EasyDict",
    "Logger",
    "allocate_run_dir",
    "construct_class_by_name",
    "dump_options",
    "load_yaml",
    "latest_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "save_image_grid",
]
