"""ADA augmentation pipeline — 18 differentiable augmentations gated by a
learned probability ``p``.

Capability parity with the reference ``training/augment_mi.py:126-453``
(pixel blitting, general geometric, color, image-space filtering,
corruptions; identical wavelet tables, probability gating, and transform
composition).  TPU-native changes:

* **Shape-static padding**: the reference computes per-batch reflect-pad
  margins from the random transforms (``augment_mi.py:288-306``), which
  is a data-dependent shape.  Here a *static* conservative margin is
  pre-computed host-side by Monte-Carlo over the configured transform
  distributions (quantile ≈ 1-1e-5) and clipped to the reference's own
  ``width-1`` bound — every step compiles once.
* All per-sample transforms compose as batched 3×3 / 4×4 matmuls in one
  fused XLA graph; the geometric warp is upsample→affine grid-sample→
  downsample exactly as the reference.
* The whole pipeline runs *inside* the jitted train step (gradients flow
  through it into R1, like the reference's grad-fixed ops).

Medical 1-channel images use the reference's collapsed scalar color
transform (``augment_mi.py:381-384``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops.grid_sample import grid_sample
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

# Wavelet low-pass decomposition filters (same table as the reference).
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025],
    "sym6": [
        0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
        -0.048311742585633, 0.4910559419267466, 0.787641141030194,
        0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
        0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
    ],
}


# ------------------------------------------------------- matrix helpers

def _tdt(*xs):
    """Transform dtype: float32 (the TPU production pin — geometric math in
    bf16 shifts sampling coordinates by whole pixels), widened to float64
    only when an operand is already float64 (the CPU x64 invariance pin,
    scripts/invariance_f64.py).  Hard-pinning f32 breaks the f64 pin in a
    subtle way: XLA rematerialises the f32 coordinate chain inside the
    warp's VJP with shape-dependent fusion/FMA ordering, so 1-dev and
    N-dev backward passes differ by f32 ulps — far above f64 tolerance."""
    for x in xs:
        if jnp.result_type(x) == jnp.float64:
            return jnp.float64
    return jnp.float32


def _eye3(n):
    return jnp.broadcast_to(jnp.eye(3), (n, 3, 3))


def translate2d(tx, ty):
    dt = _tdt(tx, ty)
    tx, ty = jnp.broadcast_arrays(jnp.asarray(tx, dt), jnp.asarray(ty, dt))
    n = tx.shape[0] if tx.ndim else 1
    m = _eye3(n)
    m = m.at[:, 0, 2].set(tx)
    m = m.at[:, 1, 2].set(ty)
    return m


def scale2d(sx, sy):
    dt = _tdt(sx, sy)
    sx, sy = jnp.broadcast_arrays(jnp.asarray(sx, dt), jnp.asarray(sy, dt))
    n = sx.shape[0] if sx.ndim else 1
    m = _eye3(n)
    m = m.at[:, 0, 0].set(sx)
    m = m.at[:, 1, 1].set(sy)
    return m


def rotate2d(theta):
    theta = jnp.asarray(theta, _tdt(theta))
    n = theta.shape[0] if theta.ndim else 1
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye3(n)
    m = m.at[:, 0, 0].set(c)
    m = m.at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s)
    m = m.at[:, 1, 1].set(c)
    return m


def translate2d_inv(tx, ty):
    return translate2d(-jnp.asarray(tx), -jnp.asarray(ty))


def scale2d_inv(sx, sy):
    return scale2d(1.0 / jnp.asarray(sx), 1.0 / jnp.asarray(sy))


def rotate2d_inv(theta):
    return rotate2d(-jnp.asarray(theta))


def _eye4(n):
    return jnp.broadcast_to(jnp.eye(4), (n, 4, 4))


def translate3d(tx, ty, tz):
    dt = _tdt(tx, ty, tz)
    tx, ty, tz = jnp.broadcast_arrays(
        jnp.asarray(tx, dt), jnp.asarray(ty, dt), jnp.asarray(tz, dt)
    )
    n = tx.shape[0]
    m = _eye4(n)
    m = m.at[:, 0, 3].set(tx)
    m = m.at[:, 1, 3].set(ty)
    m = m.at[:, 2, 3].set(tz)
    return m


def scale3d(sx, sy, sz):
    dt = _tdt(sx, sy, sz)
    sx, sy, sz = jnp.broadcast_arrays(
        jnp.asarray(sx, dt), jnp.asarray(sy, dt), jnp.asarray(sz, dt)
    )
    n = sx.shape[0]
    m = _eye4(n)
    m = m.at[:, 0, 0].set(sx)
    m = m.at[:, 1, 1].set(sy)
    m = m.at[:, 2, 2].set(sz)
    return m


def rotate3d(v, theta):
    """Rotation about unit axis v (len-3) by per-sample theta [N]."""
    theta = jnp.asarray(theta, _tdt(theta))
    n = theta.shape[0]
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    rows = [
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, jnp.zeros(n)],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, jnp.zeros(n)],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, jnp.zeros(n)],
        [jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), jnp.ones(n)],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=1)


# ---------------------------------------------------------------- config

@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers and magnitudes (reference defaults,
    ``augment_mi.py:127-133``)."""

    # Pixel blitting.
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # General geometric.
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # Color.
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # Image-space filtering.
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # Corruptions.
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5

    @property
    def has_geometric(self) -> bool:
        return any(v > 0 for v in (self.xflip, self.rotate90, self.xint,
                                   self.scale, self.rotate, self.aniso, self.xfrac))


def _filter_bank() -> np.ndarray:
    """4-band sym2 filter bank Hz_fbank (reference ``augment_mi.py:186-195``)."""
    hz_lo = np.asarray(WAVELETS["sym2"])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2])
        fbank[i, (fbank.shape[1] - hz_hi2.size) // 2 : (fbank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return fbank.astype(np.float32)


def _sample_transforms(cfg: AugmentConfig, height: int, width: int,
                       samples: int, seed: int) -> np.ndarray:
    """Monte-Carlo G_inv draws at p=1 (shared by the static margin and the
    Pallas-warp window bounds)."""
    rng = np.random.default_rng(seed)
    n = samples
    g = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()

    def mm(m):
        nonlocal g
        g = g @ m

    if cfg.xflip > 0:
        i = rng.integers(0, 2, n)
        mm(_np_scale2d_inv(1 - 2 * i, np.ones(n)))
    if cfg.rotate90 > 0:
        i = rng.integers(0, 4, n)
        mm(_np_rotate2d(np.pi / 2 * i))
    if cfg.xint > 0:
        t = (rng.random((n, 2)) * 2 - 1) * cfg.xint_max
        mm(_np_translate2d(-np.round(t[:, 0] * width), -np.round(t[:, 1] * height)))
    if cfg.scale > 0:
        s = np.exp2(np.clip(rng.standard_normal(n), -4.5, 4.5) * cfg.scale_std)
        s = np.concatenate([s, [2 ** (4.5 * cfg.scale_std), 2 ** (-4.5 * cfg.scale_std)] * (n // 2)])[:n]
        mm(_np_scale2d_inv(s, s))
    if cfg.rotate > 0:
        theta = (rng.random(n) * 2 - 1) * np.pi * cfg.rotate_max
        mm(_np_rotate2d(theta))
    if cfg.aniso > 0:
        s = np.exp2(np.clip(rng.standard_normal(n), -4.5, 4.5) * cfg.aniso_std)
        mm(_np_scale2d_inv(s, 1 / s))
    if cfg.rotate > 0:
        theta = (rng.random(n) * 2 - 1) * np.pi * cfg.rotate_max
        mm(_np_rotate2d(theta))
    if cfg.xfrac > 0:
        t = np.clip(rng.standard_normal((n, 2)), -4.5, 4.5) * cfg.xfrac_std
        mm(_np_translate2d(-t[:, 0] * width, -t[:, 1] * height))
    return g


def compute_static_margin(cfg: AugmentConfig, height: int, width: int,
                          samples: int = 4096, seed: int = 0) -> Tuple[int, int, int, int]:
    """Conservative static pad margins (mx0, mx1, my0, my1).

    Monte-Carlo over the transform distributions at p=1, taking the max
    corner excursion + wavelet halo, clipped to the reference's
    ``[0, size-1]`` bound (``augment_mi.py:297-300``).  Gaussian-tailed
    magnitudes are evaluated at ±4.5σ in addition to the sampled maxima.
    """
    if not cfg.has_geometric:
        return (0, 0, 0, 0)
    g = _sample_transforms(cfg, height, width, samples, seed)
    cx = (width - 1) / 2
    cy = (height - 1) / 2
    corners = np.asarray([[-cx, -cy, 1], [cx, -cy, 1], [cx, cy, 1], [-cx, cy, 1]]).T  # [3,4]
    cp = g @ corners  # [n, 3, 4]
    hz_pad = len(WAVELETS["sym6"]) // 4
    xy = cp[:, :2, :]  # [n, 2, 4]
    margin = np.stack([
        (-xy[:, 0]).max(), (-xy[:, 1]).max(), xy[:, 0].max(), xy[:, 1].max()
    ])  # [x0, y0, x1, y1]
    margin = margin + np.asarray([hz_pad * 2 - cx, hz_pad * 2 - cy] * 2)
    margin = np.clip(margin, 0, [width - 1, height - 1, width - 1, height - 1])
    mx0, my0, mx1, my1 = np.ceil(margin).astype(int)
    return int(mx0), int(mx1), int(my0), int(my1)


def _np_translate2d(tx, ty):
    n = np.shape(tx)[0]
    m = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()
    m[:, 0, 2] = tx
    m[:, 1, 2] = ty
    return m


def _np_scale2d_inv(sx, sy):
    n = np.shape(sx)[0]
    m = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()
    m[:, 0, 0] = 1 / sx
    m[:, 1, 1] = 1 / sy
    return m


def _np_rotate2d(theta):
    n = np.shape(theta)[0]
    m = np.broadcast_to(np.eye(3), (n, 3, 3)).copy()
    c, s = np.cos(theta), np.sin(theta)
    m[:, 0, 0] = c
    m[:, 0, 1] = -s
    m[:, 1, 0] = s
    m[:, 1, 1] = c
    return m


def _reflect_pad(x: jax.Array, t: int, b: int, l: int, r: int) -> jax.Array:
    """NHWC reflect padding via flipped-slice concats (TPU-friendly;
    identical to ``jnp.pad(mode='reflect')``)."""
    parts = []
    if t > 0:
        parts.append(jnp.flip(x[:, 1 : t + 1], axis=1))
    parts.append(x)
    if b > 0:
        parts.append(jnp.flip(x[:, -b - 1 : -1], axis=1))
    x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
    parts = []
    if l > 0:
        parts.append(jnp.flip(x[:, :, 1 : l + 1], axis=2))
    parts.append(x)
    if r > 0:
        parts.append(jnp.flip(x[:, :, -r - 1 : -1], axis=2))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else x


# -------------------------------------------------------------- pipeline

def compute_warp_window(cfg: AugmentConfig, height: int, width: int,
                        samples: int = 4096, seed: int = 0) -> Tuple[int, int]:
    """Static Pallas-warp window bounds from the transform distribution.

    The pixel-space source derivatives of the executed warp equal the
    composed ``G_inv``'s 2×2 block (the pad/upsample conjugations are by
    equal scalings on both sides), so the MC maxima bound them directly.
    """
    from ..ops.pallas.warp import window_bounds_for

    g = _sample_transforms(cfg, height, width, samples, seed)
    max_scale = float(np.max(np.abs(g[:, [0, 1], [0, 1]])))
    max_shear = float(np.max(np.abs(g[:, [0, 1], [1, 0]])))
    return window_bounds_for(max_scale, max_shear)


def warp_window_clip_probability(cfg: AugmentConfig, height: int, width: int,
                                 window: Tuple[int, int],
                                 samples: int = 100000, seed: int = 1) -> float:
    """Estimated probability that a transform draw exceeds the static
    warp window (and would silently lose its off-window taps).

    Runtime guard for the window-bounds contract: construction-time
    windows are Monte-Carlo maxima (``compute_warp_window``), so this is
    ~0 for the config they were computed from — call it when *reusing* a
    pipe/window with a different (larger-magnitude) config.
    """
    from ..ops.pallas.warp import TC, TR

    g = _sample_transforms(cfg, height, width, samples, seed)
    a = np.abs(g[:, [0, 1], [0, 1]]).max(axis=1)   # per-sample scale
    b = np.abs(g[:, [0, 1], [1, 0]]).max(axis=1)   # per-sample shear
    wr_need = np.ceil(a * TR + b * TC) + 4 + 8
    wc_need = np.ceil(a * TC + b * TR) + 4 + 128
    wr, wc = window
    return float(np.mean((wr_need > wr) | (wc_need > wc)))


class AugmentPipe:
    """Callable ``(images NHWC, p, rng) -> images`` for use inside the
    jitted train step.  Construct once per resolution.

    ``impl``: 'auto' (Pallas warp kernel on TPU, gather-based grid_sample
    elsewhere), 'pallas', 'gather', or 'pallas-interpret' (tests).
    """

    def __init__(self, cfg: AugmentConfig, height: int, width: int, num_channels: int,
                 impl: str = "auto", compute_dtype=jnp.bfloat16):
        assert num_channels in (1, 2, 3), "reference supports L/RGB; 2ch = multimodal pairs"
        self.cfg = cfg
        self.height = height
        self.width = width
        self.num_channels = num_channels
        # Image-path dtype. bf16 halves the HBM traffic of the reflect-pad/
        # FIR/warp chain and doubles the warp kernel's MXU rate; transform
        # *matrices* and sampling coordinates stay f32 regardless (below).
        # The D input is cast to bf16 by its first fp16-res block anyway
        # (reference trains D in fp16 at these resolutions), so augmenting
        # in bf16 matches the reference's effective precision surface.
        self.compute_dtype = compute_dtype
        self.hz_geom = setup_filter(WAVELETS["sym6"])
        import numpy as _np

        self._hz_geom_taps = tuple(_np.asarray(self.hz_geom, _np.float32).tolist())
        self.hz_fbank = jnp.asarray(_filter_bank())
        self.margin = compute_static_margin(cfg, height, width)
        if impl == "auto":
            impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "gather"
        self.impl = impl
        self.warp_window = (
            compute_warp_window(cfg, height, width) if cfg.has_geometric else None
        )

    # The implementation follows the reference section by section.
    def __call__(self, images: jax.Array, p: jax.Array, rng: jax.Array,
                 debug_percentile: Optional[float] = None,
                 sample_idx: Optional[jax.Array] = None) -> jax.Array:
        # The 3×3 transform chains and the sampling-grid product must be
        # exact f32: TPU default (bf16-input) matmuls shift sampling
        # coordinates by whole pixels.  All heavy image work inside
        # already pins its own precision.
        with jax.default_matmul_precision("highest"):
            in_dtype = images.dtype
            out = self._apply(images.astype(self.compute_dtype), p, rng,
                              debug_percentile, sample_idx)
            return out.astype(in_dtype)

    def _apply(self, images: jax.Array, p: jax.Array, rng: jax.Array,
               debug_percentile: Optional[float] = None,
               sample_idx: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.cfg
        n, height, width, channels = images.shape
        assert (height, width, channels) == (self.height, self.width, self.num_channels)
        p = jnp.asarray(p, jnp.float32)
        keys = list(jax.random.split(rng, 32))

        def nk():
            return keys.pop()

        # Batch-shaped draws.  Augmentations are per-sample independent
        # (reference ``augment_mi.py:148`` semantics: every gate/transform
        # draw is an independent per-row random), so with ``sample_idx``
        # given — the GLOBAL index of each local row — every draw is keyed
        # by (phase key, global sample index) instead of (local key, lane).
        # That makes the pipe's randomness mesh-size invariant: the numeric
        # 1-dev == N-dev check (tests/test_train_step.py) runs the full
        # production augment path.  ``sample_idx=None`` (production) keeps
        # the plain batched draws — identical numerics to before.
        if sample_idx is None:
            def draw_u(key, tail=()):
                return jax.random.uniform(key, (n,) + tail)

            def draw_n(key, tail=()):
                return jax.random.normal(key, (n,) + tail)
        else:
            def draw_u(key, tail=()):
                return jax.vmap(lambda i: jax.random.uniform(
                    jax.random.fold_in(key, i), tail))(sample_idx)

            def draw_n(key, tail=()):
                return jax.vmap(lambda i: jax.random.normal(
                    jax.random.fold_in(key, i), tail))(sample_idx)

        def gate(key, mult, value, identity):
            """per-sample: value where rand < mult*p else identity."""
            u = draw_u(key, (1,) * (value.ndim - 1))
            return jnp.where(u < mult * p, value, identity)

        dp = None
        if debug_percentile is not None:
            dp = jnp.asarray(debug_percentile, jnp.float32)
        erfinv = jax.scipy.special.erfinv

        # ------------------------------------------------ pixel blitting
        G_inv = _eye3(n)
        if cfg.xflip > 0:
            i = jnp.floor(draw_u(nk()) * 2)
            i = gate(nk(), cfg.xflip, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, jnp.floor(dp * 2))
            G_inv = G_inv @ scale2d_inv(1 - 2 * i, jnp.ones_like(i))
        if cfg.rotate90 > 0:
            i = jnp.floor(draw_u(nk()) * 4)
            i = gate(nk(), cfg.rotate90, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, jnp.floor(dp * 4))
            G_inv = G_inv @ rotate2d_inv(-np.pi / 2 * i)
        if cfg.xint > 0:
            t = (draw_u(nk(), (2,)) * 2 - 1) * cfg.xint_max
            t = gate(nk(), cfg.xint, t, jnp.zeros_like(t))
            if dp is not None:
                t = jnp.full_like(t, (dp * 2 - 1) * cfg.xint_max)
            G_inv = G_inv @ translate2d_inv(jnp.round(t[:, 0] * width), jnp.round(t[:, 1] * height))

        # --------------------------------------------- general geometric
        if cfg.scale > 0:
            s = jnp.exp2(draw_n(nk()) * cfg.scale_std)
            s = gate(nk(), cfg.scale, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1) * cfg.scale_std))
            G_inv = G_inv @ scale2d_inv(s, s)
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))  # P(pre OR post) = p
        if cfg.rotate > 0:
            theta = (draw_u(nk()) * 2 - 1) * np.pi * cfg.rotate_max
            u = draw_u(nk())
            theta = jnp.where(u < p_rot, theta, jnp.zeros_like(theta))
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.rotate_max)
            G_inv = G_inv @ rotate2d_inv(-theta)
        if cfg.aniso > 0:
            s = jnp.exp2(draw_n(nk()) * cfg.aniso_std)
            s = gate(nk(), cfg.aniso, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1) * cfg.aniso_std))
            G_inv = G_inv @ scale2d_inv(s, 1 / s)
        if cfg.rotate > 0:
            theta = (draw_u(nk()) * 2 - 1) * np.pi * cfg.rotate_max
            u = draw_u(nk())
            theta = jnp.where(u < p_rot, theta, jnp.zeros_like(theta))
            if dp is not None:
                theta = jnp.zeros_like(theta)
            G_inv = G_inv @ rotate2d_inv(-theta)
        if cfg.xfrac > 0:
            t = draw_n(nk(), (2,)) * cfg.xfrac_std
            t = gate(nk(), cfg.xfrac, t, jnp.zeros_like(t))
            if dp is not None:
                t = jnp.full_like(t, erfinv(dp * 2 - 1) * cfg.xfrac_std)
            G_inv = G_inv @ translate2d_inv(t[:, 0] * width, t[:, 1] * height)

        # ------------------------------------------- execute geometric
        if cfg.has_geometric:
            hz_pad = self.hz_geom.shape[0] // 4
            mx0, mx1, my0, my1 = self.margin
            # Static reflect pad (see module docstring) + origin shift.
            # Implemented as flipped-slice concats: jnp.pad(mode='reflect')
            # lowers through gathers on TPU.
            images = _reflect_pad(images, my0, my1, mx0, mx1)
            G_inv = translate2d((mx0 - mx1) / 2, (my0 - my1) / 2) @ G_inv

            # Upsample 2x and adjust transform to the finer grid.  The
            # pallas path *fuses* the FIR upsample into the warp kernel
            # (ops/pallas/upwarp.py) — the 2x canvas never exists; the
            # transform math is identical either way.
            fused = self.impl.startswith("pallas")
            if not fused:
                images = upsample2d(images, self.hz_geom, up=2)
            G_inv = scale2d(2.0, 2.0) @ G_inv @ scale2d_inv(2.0, 2.0)
            G_inv = translate2d(-0.5, -0.5) @ G_inv @ translate2d_inv(-0.5, -0.5)

            # Affine grid-sample at the padded/upsampled resolution.
            out_h = (height + hz_pad * 2) * 2
            out_w = (width + hz_pad * 2) * 2
            in_h = 2 * images.shape[1] if fused else images.shape[1]
            in_w = 2 * images.shape[2] if fused else images.shape[2]
            G_inv = scale2d(2 / in_w, 2 / in_h) @ G_inv @ scale2d_inv(2 / out_w, 2 / out_h)
            if fused:
                from ..ops.pallas.upwarp import up_affine_warp

                images = up_affine_warp(
                    images, G_inv[:, :2, :], self._hz_geom_taps,
                    out_h, out_w, window=self.warp_window,
                    interpret=(self.impl == "pallas-interpret"),
                )
            else:
                # grid = G_inv @ normalised output coords (align_corners=False).
                cdt = _tdt(G_inv)
                ys = (jnp.arange(out_h, dtype=cdt) * 2 + 1) / out_h - 1
                xs = (jnp.arange(out_w, dtype=cdt) * 2 + 1) / out_w - 1
                gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
                coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [H,W,3]
                grid = jnp.einsum("nij,hwj->nhwi", G_inv[:, :2, :], coords)
                images = grid_sample(images, grid)

            # Downsample and crop back to [height, width].  `hz_geom` is a
            # concrete separable filter, so this lowers to banded matmuls
            # (MXU) rather than a depthwise conv — the conv form's
            # batch-fold backward cost ~11 ms/step in relayout transposes
            # at 256² C=1 (measured, round-3 xplane attribution).
            images = downsample2d(images, self.hz_geom, down=2, padding=-hz_pad * 2, flip_filter=True)

        # ------------------------------------------------------- color
        I4 = _eye4(n)
        C = I4
        v = np.asarray([1, 1, 1, 0]) / np.sqrt(3)
        if cfg.brightness > 0:
            b = draw_n(nk()) * cfg.brightness_std
            b = gate(nk(), cfg.brightness, b, jnp.zeros_like(b))
            if dp is not None:
                b = jnp.full_like(b, erfinv(dp * 2 - 1) * cfg.brightness_std)
            C = translate3d(b, b, b) @ C
        if cfg.contrast > 0:
            c = jnp.exp2(draw_n(nk()) * cfg.contrast_std)
            c = gate(nk(), cfg.contrast, c, jnp.ones_like(c))
            if dp is not None:
                c = jnp.full_like(c, jnp.exp2(erfinv(dp * 2 - 1) * cfg.contrast_std))
            C = scale3d(c, c, c) @ C
        vv = jnp.asarray(np.outer(v, v), jnp.float32)
        if cfg.lumaflip > 0:
            i = jnp.floor(draw_u(nk(), (1, 1)) * 2)
            i = gate(nk(), cfg.lumaflip, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, jnp.floor(dp * 2))
            C = (jnp.eye(4) - 2 * vv * i) @ C  # Householder reflection
        if cfg.hue > 0 and channels > 1:
            theta = (draw_u(nk()) * 2 - 1) * np.pi * cfg.hue_max
            theta = gate(nk(), cfg.hue, theta, jnp.zeros_like(theta))
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.hue_max)
            C = rotate3d(v, theta) @ C
        if cfg.saturation > 0 and channels > 1:
            s = jnp.exp2(draw_n(nk(), (1, 1)) * cfg.saturation_std)
            s = gate(nk(), cfg.saturation, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1) * cfg.saturation_std))
            C = (vv + (jnp.eye(4) - vv) * s) @ C

        color_on = any(
            m > 0 for m in (cfg.brightness, cfg.contrast, cfg.lumaflip, cfg.hue, cfg.saturation)
        )
        if color_on:
            flat = images.reshape(n, height * width, channels)  # [N, HW, C]
            if channels == 3:
                # out = C[:3,:3] @ rgb + C[:3,3]
                flat = jnp.einsum("nij,npj->npi", C[:, :3, :3], flat) + C[:, None, :3, 3]
            elif channels == 1:
                Cm = jnp.mean(C[:, :3, :], axis=1, keepdims=True)  # [N,1,4]
                flat = flat * jnp.sum(Cm[:, :, :3], axis=2)[:, :, None] + Cm[:, :, 3][:, :, None]
            else:
                # 2-channel multimodal: apply the collapsed luma transform
                # per channel (each channel is an independent grayscale mode).
                Cm = jnp.mean(C[:, :3, :], axis=1, keepdims=True)
                flat = flat * jnp.sum(Cm[:, :, :3], axis=2)[:, :, None] + Cm[:, :, 3][:, :, None]
            images = flat.reshape(n, height, width, channels)

        # --------------------------------------- image-space filtering
        if cfg.imgfilter > 0:
            num_bands = self.hz_fbank.shape[0]
            assert len(cfg.imgfilter_bands) == num_bands
            expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)
            g = jnp.ones((n, num_bands))
            for i, band_strength in enumerate(cfg.imgfilter_bands):
                t_i = jnp.exp2(draw_n(nk()) * cfg.imgfilter_std)
                u = draw_u(nk())
                t_i = jnp.where(u < cfg.imgfilter * p * band_strength, t_i, jnp.ones_like(t_i))
                if dp is not None:
                    t_i = (
                        jnp.full_like(t_i, jnp.exp2(erfinv(dp * 2 - 1) * cfg.imgfilter_std))
                        if band_strength > 0 else jnp.ones_like(t_i)
                    )
                t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
                g = g * t

            hz_prime = g @ self.hz_fbank  # [N, taps]
            taps = hz_prime.shape[1]
            pad = taps // 2
            # Per-sample separable depthwise conv: fold batch into channels.
            x = jnp.transpose(images, (1, 2, 0, 3)).reshape(1, height, width, n * channels)
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
            w_band = jnp.repeat(hz_prime, channels, axis=0)  # [N*C, taps] sample-major
            rhs_v = jnp.transpose(w_band)[:, None, None, :]  # [taps,1,1,N*C]
            x = jax.lax.conv_general_dilated(
                x, rhs_v, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n * channels,
            )
            rhs_h = jnp.transpose(w_band)[None, :, None, :]  # [1,taps,1,N*C]
            x = jax.lax.conv_general_dilated(
                x, rhs_h, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=n * channels,
            )
            images = jnp.transpose(x.reshape(height, width, n, channels), (2, 0, 1, 3))

        # --------------------------------------------------- corruptions
        if cfg.noise > 0:
            sigma = jnp.abs(draw_n(nk(), (1, 1, 1))) * cfg.noise_std
            sigma = gate(nk(), cfg.noise, sigma, jnp.zeros_like(sigma))
            if dp is not None:
                sigma = jnp.full_like(sigma, erfinv(dp) * cfg.noise_std)
            images = images + draw_n(nk(), images.shape[1:]) * sigma
        if cfg.cutout > 0:
            size = jnp.full((n, 2, 1, 1), cfg.cutout_size)
            u = draw_u(nk(), (1, 1, 1))
            size = jnp.where(u < cfg.cutout * p, size, jnp.zeros_like(size))
            center = draw_u(nk(), (2, 1, 1))
            if dp is not None:
                size = jnp.full_like(size, cfg.cutout_size)
                center = jnp.full_like(center, dp)
            coord_x = jnp.arange(width).reshape(1, 1, -1)
            coord_y = jnp.arange(height).reshape(1, -1, 1)
            mask_x = jnp.abs((coord_x + 0.5) / width - center[:, 0]) >= size[:, 0] / 2
            mask_y = jnp.abs((coord_y + 0.5) / height - center[:, 1]) >= size[:, 1] / 2
            mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
            images = images * mask[..., None]

        return images


def medical_augment_config(**overrides) -> AugmentConfig:
    """The medical ('bgc-mi') tuning used by Gan-track
    (``train_mi_multimodal.py:170-177,308-322``): conservative blit +
    geometric magnitudes for CT/MR slices."""
    base = dict(
        xflip=1.0, xint=1.0, xint_max=0.05,
        scale=1.0, rotate=1.0, rotate_max=3.0 / 360.0,
        aniso=1.0, xfrac=1.0,
        scale_std=0.05, aniso_std=0.05, xfrac_std=0.05,
    )
    base.update(overrides)
    return AugmentConfig(**base)
