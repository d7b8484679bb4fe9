"""Feature-extraction plumbing shared by all quality metrics.

Capability parity with the reference ``metrics/metric_utils.py``:
``MetricOptions`` (``:23-38``), detector management (``:47-58``),
dataset/generator feature passes with multimodal channel selection and
1→3-channel expansion (``:201-323``), and md5-keyed dataset-feature
caching.  TPU-native: feature extraction is one jitted NHWC inference
function; with a multi-device mesh the batch axis is sharded across the
chips (the reference's rank-interleaved extraction,
``metric_utils.py:117-125,237``) — real batches device_put sharded, and
the generator pass runs G→postprocess→detector as ONE sharded jit with
no per-batch host round-trip.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataset import GANDataset
from ..parallel.mesh import DATA_AXIS
from .feature_stats import FeatureStats, cache_path


@dataclasses.dataclass
class MetricOptions:
    """Everything a metric needs (reference ``MetricOptions :23-38``)."""

    generator: Optional[Callable[[jax.Array, Optional[jax.Array]], jax.Array]] = None
    #   generator(z, c) -> images in [-1, 1], NHWC (jit-compatible)
    mapping: Optional[Callable[[jax.Array, Optional[jax.Array]], jax.Array]] = None
    #   mapping(z, c) -> ws [N, num_ws, w_dim]  (needed by w-space PPL)
    synthesis: Optional[Callable[[jax.Array], jax.Array]] = None
    #   synthesis(ws) -> images in [-1, 1], NHWC  (needed by w-space PPL)
    z_dim: int = 512
    c_dim: int = 0
    dataset: Optional[GANDataset] = None
    detector: Optional["Detector"] = None
    mode_idx: Optional[int] = None      # multimodal channel select
    num_items: Optional[int] = None
    batch_size: int = 64
    cache_dir: Optional[str] = None
    seed: int = 0
    progress: Optional[Callable[[int, int], None]] = None
    mesh: Optional[Mesh] = None   # shard extraction over these devices


def auto_metric_batch(resolution: int, floor: int = 32, cap: int = 256) -> int:
    """Feature-extraction batch for a given image resolution.

    Large batches amortise per-dispatch latency (~33 ms on the tunneled
    runtime; at batch 64 that alone is ~29% of a fid50k pass) and keep
    the G->detector pipeline MXU-bound — measured 552 -> 798 imgs/s going
    64 -> 256 at 256².  Halve per resolution doubling so the rendered
    [B, H, W, C] batch stays bounded at high resolutions.
    """
    b = (256 * 256 * 256) // max(resolution * resolution, 1)
    return int(min(cap, max(floor, b)))


class Detector:
    """A jitted feature extractor: float images 0..255 NHWC(3) → [N, D].

    ``sharded(mesh)`` returns a view whose calls split the batch across
    the mesh's data axis (rows padded to a device multiple, features
    gathered) — the TPU-mesh equivalent of the reference's rank-sharded
    feature extraction (``metric_utils.py:117-125``).
    """

    def __init__(self, apply_fn, params, name: str, mesh: Optional[Mesh] = None):
        self.name = name
        self.apply_fn = apply_fn
        self.params = params
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        fn = lambda imgs: apply_fn(params, imgs)
        if self.mesh is not None:
            self._fn = jax.jit(
                fn,
                in_shardings=NamedSharding(self.mesh, P(DATA_AXIS)),
                out_shardings=NamedSharding(self.mesh, P()),
            )
        else:
            self._fn = jax.jit(fn)

    def sharded(self, mesh: Optional[Mesh]) -> "Detector":
        if mesh is None or mesh.devices.size <= 1 or self.mesh is mesh:
            return self
        return Detector(self.apply_fn, self.params, self.name, mesh=mesh)

    def device_features(self, images: jax.Array) -> jax.Array:
        """Trace-time feature extraction (for fused generator passes)."""
        return self.apply_fn(self.params, images)

    def __call__(self, images_uint8_range: np.ndarray) -> np.ndarray:
        x = jnp.asarray(images_uint8_range, jnp.float32)
        if self.mesh is not None:
            n = x.shape[0]
            d = int(self.mesh.devices.size)
            pad = (-n) % d
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            return np.asarray(self._fn(x))[:n]
        return np.asarray(self._fn(x))


def make_random_projection_detector(seed: int = 0, dim: int = 512,
                                    scales=(32, 16, 8)) -> Detector:
    """Offline fallback detector: multi-scale random-projection features.

    A randomly *initialised* InceptionV3 collapses inputs through its ReLU
    cascade (FID saturates near 0 regardless of the data), so the no-weights
    fallback instead projects multi-scale downsampled pixels through fixed
    Gaussian matrices — distances between image distributions survive, so
    relative FID/KID comparisons remain meaningful.  Absolute values are
    NOT comparable to published Inception-FID (see README).
    """
    keys = jax.random.split(jax.random.PRNGKey(seed), len(scales))
    per = dim // len(scales)
    mats = [
        jax.random.normal(k, (s * s * 3, per)) / np.sqrt(s * s * 3)
        for k, s in zip(keys, scales)
    ]

    def apply_fn(params, imgs):
        feats = []
        for mat, s in zip(params, scales):
            x = jax.image.resize(imgs, (imgs.shape[0], s, s, 3), "bilinear")
            x = x.reshape(x.shape[0], -1) / 127.5 - 1.0
            feats.append(x @ mat)
        return jnp.concatenate(feats, axis=1)

    return Detector(apply_fn, mats, name=f"randproj-{dim}-seed{seed}")


def _resolve_weights(weights_path: Optional[str]) -> Optional[str]:
    """Accept local paths or URLs for detector weights; URLs resolve via
    the md5 cache / GANTRACK_URL_MIRROR offline story (reference
    ``metric_utils.py:47-58`` fetches detector URLs with dnnlib.open_url)."""
    if weights_path:
        from ..utils.url import is_url, open_url

        if is_url(weights_path, allow_file_urls=True):
            return open_url(weights_path, return_filename=True, verbose=False)
    return weights_path


def make_inception_detector(weights_path: Optional[str] = None, seed: int = 0) -> Detector:
    from ..models import inception

    weights_path = _resolve_weights(weights_path)
    if weights_path and os.path.exists(weights_path):
        params, variant = inception.load_npz(weights_path)
        # "tfslim" = the TF-slim inception-2015-12-05 graph the reference's
        # FID uses (NVIDIA TorchScript port) — the only variant whose FID is
        # comparable to published numbers; see models/inception.py.
        model = inception.InceptionV3Features(variant=variant)
        return Detector(model.apply, params,
                        f"inception-{variant}:{os.path.basename(weights_path)}")
    return make_random_projection_detector(seed=seed)


def make_vgg_detector(weights_path: Optional[str] = None, seed: int = 0) -> Detector:
    from ..models import vgg

    model = vgg.VGG16()
    weights_path = _resolve_weights(weights_path)
    if weights_path and os.path.exists(weights_path):
        params = vgg.load_npz(weights_path)
        name = f"vgg16:{os.path.basename(weights_path)}"
    else:
        params = vgg.random_params(jax.random.PRNGKey(seed))
        name = f"vgg16:random-seed{seed}"
    return Detector(model.apply, params, name)


def to_detector_input(images: np.ndarray, mode_idx: Optional[int]) -> np.ndarray:
    """Channel-select + 1→3 repeat (reference ``metric_utils.py:240-258``).

    ``images``: float NHWC in 0..255 range.  Works on host (numpy) and
    traced (jnp) arrays alike.
    """
    rep = np.repeat if isinstance(images, np.ndarray) else jnp.repeat
    if mode_idx is not None:
        images = images[..., mode_idx : mode_idx + 1]
    c = images.shape[-1]
    if c == 1:
        images = rep(images, 3, axis=-1)
    elif c == 2:
        raise ValueError("select a modality (mode_idx) for multimodal data")
    return images


_warned_unshimmed: list = []  # once-per-process flag for the shim warning


def compute_feature_stats_for_dataset(
    opts: MetricOptions,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
) -> FeatureStats:
    """Features over real data, with caching (reference ``:201-269``)."""
    dataset = opts.dataset
    n = len(dataset)
    if max_items is not None:
        n = min(n, max_items)

    cache_file = None
    if opts.cache_dir is not None:
        cache_file = cache_path(
            opts.cache_dir, "features",
            dataset=getattr(dataset, "_path", dataset.name),
            detector=opts.detector.name, mode_idx=opts.mode_idx,
            capture_all=capture_all, capture_mean_cov=capture_mean_cov,
            max_items=max_items,
        )
        if os.path.isfile(cache_file):
            return FeatureStats.load(cache_file)

    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov, max_items=n)
    detector = opts.detector.sharded(opts.mesh)
    bs = opts.batch_size
    idx = 0
    while not stats.is_full():
        imgs = []
        for _ in range(min(bs, n - idx)):
            img, _label, _fname = dataset[idx % len(dataset)]
            imgs.append(img)
            idx += 1
        if not imgs:
            break
        batch = np.stack(imgs)
        bmax = float(batch.max())
        if bmax != 255 and bmax <= 1.001:
            # Reference per-batch uint8 shim, bit-for-bit in its design
            # regime (``metric_utils.py:240-247``): datasets stored in
            # [0,1] floats are rescaled and TRUNCATED to uint8 before
            # the detector.  Batches containing an exact 255 (uint8
            # exports, [0,255] data with clipped highlights — real claro
            # normalization pins per-volume maxima at exactly 255,
            # ``dataset_tool_mi.py:313-331``) pass through on both
            # sides.  Numbers are drop-in comparable in both regimes
            # (tests/test_fid_cross_framework.py).
            batch = np.clip(batch * 255, 0, 255).astype(np.uint8).astype(np.float32)
        elif bmax != 255 and bmax > 1.001 and not _warned_unshimmed:
            # DOCUMENTED DIVERGENCE: the reference would *255 and
            # saturate a [0,255]-float batch that happens to lack an
            # exact 255, destroying the metric; we pass it through
            # unchanged and warn once (PARITY.md, metric shim row).
            import warnings

            _warned_unshimmed.append(True)
            warnings.warn(
                f"metric batch max={bmax:.3f}: [0,255]-ranged floats "
                "without an exact 255 — the reference's *255→uint8 shim "
                "(metric_utils.py:240-247) would saturate such batches; "
                "passing through unchanged instead (warned once)",
                stacklevel=2)
        batch = to_detector_input(batch, opts.mode_idx)
        stats.append(detector(batch))
        if opts.progress:
            opts.progress(stats.num_items, n)

    if cache_file is not None:
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(
    opts: MetricOptions,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
) -> FeatureStats:
    """Features over generated data (reference ``:271-323``): sample z,
    run G_ema, map [-1,1] → 0..255 with the reference's
    ``(img·127.5+128).clamp(0,255)`` rule, channel-select, extract."""
    assert opts.generator is not None
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    mesh = opts.mesh if (opts.mesh is not None and opts.mesh.devices.size > 1) else None
    batch_size = opts.batch_size
    if mesh is not None:
        # The sharded jit needs the batch divisible by the mesh; round up
        # (FeatureStats clamps at max_items, so overshoot is harmless).
        ndev = int(mesh.devices.size)
        batch_size = -(-batch_size // ndev) * ndev

    def postprocess_and_extract(img):
        # Reference ``(img·127.5+128).clamp(0,255).to(torch.uint8)``
        # (``metric_utils.py:291``) — the uint8 cast TRUNCATES, so floor
        # here keeps generated-feature inputs bit-comparable
        # (tests/test_fid_cross_framework.py).
        img255 = jnp.floor(jnp.clip(img * 127.5 + 128, 0, 255))
        return opts.detector.device_features(to_detector_input(img255, opts.mode_idx))

    # One jit runs z-sampling → G → postprocess → detector (sharded across
    # the mesh when one is given); only a scalar step index goes up and the
    # [B, D] features come back.  The single-device case MUST also stay
    # fused: bouncing [B, H, W, C] images through host numpy costs ~70
    # ms/batch of tunnel traffic + 1-core postprocessing — measured 29
    # imgs/s vs 178+ fused at 256², and host-side z costs one extra
    # dispatch (~33 ms) per batch on the tunneled runtime.
    base_key = jax.random.PRNGKey(opts.seed)

    def batch_feats(step, c):
        kz = jax.random.fold_in(base_key, step)
        z = jax.random.normal(kz, (batch_size, opts.z_dim))
        if mesh is not None:
            # Pin the batch split so GSPMD shards the whole G→detector
            # pipeline along the data axis.
            z = jax.lax.with_sharding_constraint(
                z, NamedSharding(mesh, P(DATA_AXIS)))
        return postprocess_and_extract(opts.generator(z, c))

    if mesh is not None:
        shard = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        jit_kwargs = (dict(in_shardings=(rep, shard), out_shardings=rep)
                      if opts.c_dim > 0 else
                      dict(in_shardings=(rep,), out_shardings=rep))
    else:
        jit_kwargs = {}
    if opts.c_dim > 0:
        feats_fn = jax.jit(batch_feats, **jit_kwargs)
    else:
        feats_fn = jax.jit(lambda step: batch_feats(step, None), **jit_kwargs)

    label_rng = np.random.default_rng(opts.seed)
    step = 0
    while not stats.is_full():
        c = None
        if opts.c_dim > 0:
            if opts.dataset is not None and opts.dataset.has_labels:
                # Empirical label distribution (reference ``:285-287``).
                ids = label_rng.integers(0, len(opts.dataset), batch_size)
                c = jnp.asarray(np.stack([opts.dataset.get_label(int(i)) for i in ids]))
            else:
                c = jax.nn.one_hot(
                    jnp.asarray(label_rng.integers(0, opts.c_dim, batch_size)),
                    opts.c_dim,
                )
        step_arr = jnp.asarray(step, jnp.int32)
        feats = np.asarray(feats_fn(step_arr, c) if opts.c_dim > 0
                           else feats_fn(step_arr))
        stats.append(feats)
        step += 1
        if opts.progress and stats.max_items:
            opts.progress(stats.num_items, stats.max_items)
    return stats
