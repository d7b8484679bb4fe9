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

import inspect
import os
import threading
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


def _call_metric_fn(metric_fn, state, kimg):
    """Pass ``kimg`` through when the metric_fn accepts it (so async
    jsonl rows are stamped with snapshot kimg, not completion time);
    plain ``metric_fn(state)`` callables keep working."""
    try:
        sig = inspect.signature(metric_fn)
        accepts = ("kimg" in sig.parameters or any(
            p.kind == inspect.Parameter.VAR_KEYWORD
            for p in sig.parameters.values()))
    except (TypeError, ValueError):
        accepts = False
    return metric_fn(state, kimg=kimg) if accepts else metric_fn(state)


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
    metric_fn: Optional[Callable[..., dict]] = None,
    metric_snapshot_every: int = 1,
    metric_async: bool = False,
    sample_fn: Optional[Callable[[GANTrainState, np.ndarray, np.ndarray], np.ndarray]] = None,
    abort_fn: Optional[Callable[[], bool]] = None,
    progress_fn: Optional[Callable[[int, int], None]] = None,
    verbose: bool = True,
) -> GANTrainState:
    """Run until ``total_kimg``; returns the final state.

    ``sample_fn(state, grid_z, grid_c) -> images`` renders EMA samples for
    the fakes grid; ``metric_fn(state, kimg=...) -> {name: value}``
    evaluates the configured metrics on a snapshot.

    Metric-cadence mitigation (the reference couples metrics to every
    snapshot, paying ~24% overhead at its own ``--snap=10 --tick=4``
    recipe, ``docs/evidence/metric_overhead.md``):

    * ``metric_snapshot_every=N`` evaluates metrics only on every N-th
      snapshot (checkpoints still save on ALL snapshots, so any skipped
      metric can be recomputed later via ``tools/analysis.py``).
    * ``metric_async=True`` runs ``metric_fn`` on the snapshot state in
      a background thread while training continues; JAX arrays are
      immutable, so the captured state is a consistent snapshot, and the
      jsonl row is stamped with the snapshot's kimg, not completion
      time.  At most one metric thread runs at a time (a still-running
      one is joined first).
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

    snapshot_idx = 0
    metric_thread = [None]

    def run_metrics(snap_state, kimg):
        # A metric failure (e.g. a transient remote-compile error on the
        # tunneled runtime) must not kill a multi-day training run: the
        # checkpoint already persists the state, so log and keep
        # training; the metric can be recomputed from the snapshot later
        # (tools/analysis.py metric re-runner).
        try:
            results = _call_metric_fn(metric_fn, snap_state, kimg)
            for name, value in results.items():
                print(f"metric {name}: {value:.4f}")
        except Exception as e:  # noqa: BLE001 — deliberate isolation
            import traceback

            print(f"metric evaluation failed at kimg {kimg} "
                  f"(continuing): {e!r}")
            traceback.print_exc()

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

        # Bound the dispatch queue: without a periodic host sync the loop
        # can run a full tick (hundreds of steps) ahead of the device,
        # pinning every in-flight input literal host-side — on the
        # tunneled runtime this ballooned to tens of GB and stalled the
        # box (r5: 70 GB RES, 100% iowait at kimg 140).  One small fetch
        # every 16 steps caps in-flight work at ~16 batches for ~2 ms of
        # amortised cost.
        if len(pending_moments) % 16 == 0:
            np.asarray(jax.tree.leaves(pending_moments[-1])[0])

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
            snapshot_idx += 1
            run_now = (done or (snapshot_idx - 1) % max(metric_snapshot_every, 1) == 0)
            if metric_fn is not None and metrics and run_now:
                kimg = cur_nimg // 1000
                if metric_async and not done:
                    if metric_thread[0] is not None:
                        metric_thread[0].join()
                    t = threading.Thread(target=run_metrics,
                                         args=(state, kimg), daemon=True)
                    t.start()
                    metric_thread[0] = t
                else:
                    if metric_thread[0] is not None:
                        metric_thread[0].join()
                        metric_thread[0] = None
                    run_metrics(state, kimg)

        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        cur_tick += 1
        tick_start_nimg = cur_nimg
        maintenance_time = time.time() - maintenance_start
        tick_start_time = time.time()

    if metric_thread[0] is not None:
        metric_thread[0].join()
    jsonl.close()
    return state
