"""Training loop orchestration: ticks, snapshots, image grids, metrics.

Capability parity with the reference
``training/training_loop_mi_multimodal.py:126-494``: the per-tick status
line (same field names), ``stats.jsonl``, real/fake image grid exports,
full-state snapshots with metric evaluation per snapshot, abort
callbacks, and resource telemetry.  The hot loop itself is the compiled
``TrainStepper`` (see ``step.py``); this module is pure host-side
orchestration.
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np
import psutil

from ..data.loader import InfiniteLoader
from ..parallel.mesh import shard_batch
from ..utils.checkpoint import save_checkpoint, save_image_grid
from . import stats as stats_lib
from .step import TrainStepper
from .train_state import GANTrainState


def setup_snapshot_image_grid(dataset, random_seed: int = 0, gw: Optional[int] = None,
                              gh: Optional[int] = None):
    """Pick a label-grouped grid of real images (reference
    ``training_loop:52-92`` simplified: random per-label buckets)."""
    rnd = np.random.RandomState(random_seed)
    gw = gw or max(min(7680 // dataset.image_shape[1], 32), 4)
    gh = gh or max(min(4320 // dataset.image_shape[0], 32), 4)
    indices = rnd.choice(len(dataset), size=gw * gh, replace=len(dataset) < gw * gh)
    images, labels = [], []
    for i in indices:
        img, label, _ = dataset[int(i)]
        images.append(img)
        labels.append(label)
    return (gw, gh), np.stack(images), np.stack(labels)


def training_loop(
    *,
    run_dir: str,
    stepper: TrainStepper,
    state: GANTrainState,
    loader: InfiniteLoader,
    mesh,
    total_kimg: int = 25000,
    kimg_per_tick: int = 4,
    snapshot_ticks: Optional[int] = 50,
    image_snapshot_ticks: Optional[int] = 50,
    metrics: Sequence[str] = (),
    metric_fn: Optional[Callable[[GANTrainState], dict]] = None,
    sample_fn: Optional[Callable[[GANTrainState, np.ndarray, np.ndarray], np.ndarray]] = None,
    abort_fn: Optional[Callable[[], bool]] = None,
    progress_fn: Optional[Callable[[int, int], None]] = None,
    verbose: bool = True,
) -> GANTrainState:
    """Run until ``total_kimg``; returns the final state.

    ``sample_fn(state, grid_z, grid_c) -> images`` renders EMA samples for
    the fakes grid; ``metric_fn(state) -> {name: value}`` evaluates the
    configured metrics on a snapshot.
    """
    start_time = time.time()
    collector = stats_lib.Collector()
    jsonl = stats_lib.JsonlLogger(os.path.join(run_dir, "stats.jsonl"))
    batch_size = stepper.cfg.batch_size

    # Export the reals grid + initial fakes (reference ``:263-279``).
    grid_z = grid_c = None
    if image_snapshot_ticks is not None and sample_fn is not None:
        (gw, gh), reals, grid_labels = setup_snapshot_image_grid(loader.dataset)
        save_image_grid(reals / 127.5 - 1, os.path.join(run_dir, "reals.png"),
                        grid_size=(gw, gh))
        rng = np.random.default_rng(0)
        grid_z = rng.standard_normal((gw * gh, stepper.cfg.z_dim)).astype(np.float32)
        grid_c = grid_labels.astype(np.float32)
        fakes = sample_fn(state, grid_z, grid_c)
        save_image_grid(fakes, os.path.join(run_dir, "fakes_init.png"), grid_size=(gw, gh))

    cur_tick = 0
    tick_start_nimg = int(state.cur_nimg)
    tick_start_time = time.time()
    maintenance_time = 0.0
    done = False

    cur_nimg = int(state.cur_nimg)  # host mirror; the loop never syncs per step
    pending_moments = []
    images, labels = next(loader)
    next_batch = shard_batch(mesh, (images, labels))
    while not done:
        # ------------------------------------------------ hot loop body
        batch = next_batch
        state, moments = stepper(state, batch[0], batch[1])
        # Enqueue the next H2D while the step runs on device (the loader
        # thread already prefetched the host copy).
        images, labels = next(loader)
        next_batch = shard_batch(mesh, (images, labels))
        pending_moments.append(moments)  # device arrays; fetched at tick time

        cur_nimg += batch_size
        done = cur_nimg >= total_kimg * 1000
        if (not done) and (cur_tick != 0) and (cur_nimg < tick_start_nimg + kimg_per_tick * 1000):
            continue

        for m in jax.device_get(pending_moments):
            collector.update(m)
        pending_moments.clear()

        # ------------------------------------------------- tick report
        tick_end_time = time.time()
        fields = {
            "Progress/tick": cur_tick,
            "Progress/kimg": cur_nimg / 1e3,
            "Timing/total_sec": tick_end_time - start_time,
            "Timing/sec_per_tick": tick_end_time - tick_start_time,
            "Timing/sec_per_kimg": (tick_end_time - tick_start_time)
            / max(cur_nimg - tick_start_nimg, 1) * 1000,
            "Timing/maintenance_sec": maintenance_time,
            "Resources/cpu_mem_gb": psutil.Process(os.getpid()).memory_info().rss / 2**30,
            "Progress/augment": collector.mean("Progress/augment"),
        }
        # Device memory in the tick record (reference reports peak GPU
        # memory per tick, training_loop_mi_multimodal.py:392-395).
        from ..utils.profiling import device_memory_stats

        for k, v in device_memory_stats().items():
            fields[f"Resources/{k}"] = v
        if verbose:
            msg = " ".join([
                f"tick {cur_tick:<5d}",
                f"kimg {fields['Progress/kimg']:<8.1f}",
                f"time {fields['Timing/total_sec']:<8.1f}s",
                f"sec/kimg {fields['Timing/sec_per_kimg']:<7.2f}",
                f"augment {fields['Progress/augment']:.3f}",
                f"G_loss {collector.mean('Loss/G/loss'):.3f}",
                f"D_loss {collector.mean('Loss/D/loss'):.3f}",
            ])
            print(msg)
        record = {**fields, **{k: v["mean"] for k, v in collector.as_dict().items()}}
        jsonl.write(record)
        collector.clear()

        maintenance_start = time.time()
        if abort_fn is not None and abort_fn():
            done = True
            print("Aborting...")

        # --------------------------------------------- image snapshots
        if (
            image_snapshot_ticks is not None and sample_fn is not None
            and (done or cur_tick % image_snapshot_ticks == 0) and cur_tick > 0
        ):
            fakes = sample_fn(state, grid_z, grid_c)
            save_image_grid(
                fakes, os.path.join(run_dir, f"fakes{cur_nimg // 1000:06d}.png"),
                grid_size=(gw, gh),
            )

        # ------------------------------------------- network snapshots
        if snapshot_ticks is not None and (done or cur_tick % snapshot_ticks == 0) and cur_tick > 0:
            path = save_checkpoint(os.path.join(run_dir, "checkpoints"), state)
            if metric_fn is not None and metrics:
                results = metric_fn(state)
                for name, value in results.items():
                    print(f"metric {name}: {value:.4f}")

        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        cur_tick += 1
        tick_start_nimg = cur_nimg
        maintenance_time = time.time() - maintenance_start
        tick_start_time = time.time()

    jsonl.close()
    return state
