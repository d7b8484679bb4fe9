"""Checkpointing: full-train-state orbax snapshots + image grid export.

Improvement over the reference (SURVEY §5.4): snapshots carry optimizer
moments, EMA, pl_mean, ADA p, and RNG — resume is exact, unlike the
reference's weights-only pickle resume
(``training_loop_mi_multimodal.py:199-204``).  A pickle-free
``network-snapshot-<kimg>`` naming scheme keeps the run-dir layout
familiar.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else step
    path = os.path.join(ckpt_dir, f"state-{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(e for e in os.listdir(ckpt_dir) if e.startswith("state-"))
    return os.path.join(ckpt_dir, entries[-1]) if entries else None


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1),
                    grid_size: Optional[tuple] = None) -> None:
    """Export a [N,H,W,C] batch as one PNG grid (reference
    ``training_loop_mi_multimodal.py:96-123`` save_image_grid)."""
    from PIL import Image

    lo, hi = drange
    img = (np.asarray(images, np.float32) - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)

    n, h, w, c = img.shape
    if grid_size is None:
        gw = max(int(np.ceil(np.sqrt(n))), 1)
        gh = int(np.ceil(n / gw))
    else:
        gw, gh = grid_size
    grid = np.zeros((gh * h, gw * w, c), dtype=np.uint8)
    for i in range(min(n, gw * gh)):
        y, x = divmod(i, gw)
        grid[y * h : (y + 1) * h, x * w : (x + 1) * w] = img[i]
    if c == 1:
        Image.fromarray(grid[:, :, 0], "L").save(path)
    elif c == 2:
        # multimodal pair: save channels side by side
        pair = np.concatenate([grid[:, :, 0], grid[:, :, 1]], axis=1)
        Image.fromarray(pair, "L").save(path)
    else:
        Image.fromarray(grid, "RGB").save(path)


def resolve_checkpoint_path(checkpoint: str) -> Optional[str]:
    """Resolve a checkpoint argument to a concrete ``state-*`` path.

    Accepts a ``state-*`` path itself, a run dir (latest snapshot under
    its ``checkpoints/``), or a directory holding ``state-*`` entries
    directly.  Returns ``None`` when nothing is found.
    """
    if os.path.basename(checkpoint).startswith("state-"):
        return checkpoint if os.path.isdir(checkpoint) else None
    if os.path.isdir(checkpoint):
        return (latest_checkpoint(os.path.join(checkpoint, "checkpoints"))
                or latest_checkpoint(checkpoint))
    return None


def resolve_network(checkpoint: str):
    """Resolve a ``--network`` argument to ``(state dict, path)``.

    Accepts anything :func:`resolve_checkpoint_path` does, or a reference
    ``network-snapshot-*.pkl`` converted on the fly (parity with the
    reference, whose every tool consumes pickles via
    ``legacy.load_network_pkl``).  Returns ``(None, None)`` when no
    checkpoint is found.
    """
    if checkpoint.endswith((".pkl", ".pickle")):
        from ..models.torch_compat import state_dict_from_pickle

        return state_dict_from_pickle(checkpoint), checkpoint
    path = resolve_checkpoint_path(checkpoint)
    if path is None:
        return None, None
    return load_checkpoint(path, None), path
