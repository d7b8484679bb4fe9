"""gantrack_tpu — a TPU-native medical-image GAN framework.

Re-designed from scratch in JAX/XLA/Pallas with the capabilities of
ltronchin/Gan-track (StyleGAN2-ADA / StyleGAN3 training on CT/MR slices,
CycleGAN/pix2pix, volume preprocessing, FID/KID/PR/IS metrics, projection
and generation tools).  See SURVEY.md for the capability blueprint.

Layout conventions
------------------
* Images are **NHWC** (batch, height, width, channels) — channels ride the
  TPU lane dimension.  The reference uses NCHW; every public API here is
  NHWC and converters live in :mod:`gantrack_tpu.utils.image`.
* Convolution weights are **HWIO**.
* All randomness flows through explicit ``jax.random`` keys.
* Parameters live in plain pytrees managed by Flax modules; train state is
  a single dataclass checkpointed with orbax.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache() -> None:
    """Point JAX at an on-disk executable cache (XLA compiles of the full
    train step take ~15 min through the remote TPU compiler; a warm cache
    turns process startup into seconds).  Opt out / relocate with
    ``GANTRACK_JAX_CACHE=off`` / ``=<dir>``."""
    import os

    loc = os.environ.get("GANTRACK_JAX_CACHE", "")
    if loc.lower() in ("off", "0", "none"):
        return
    # CPU programs compile in seconds and XLA:CPU AOT reloads are pinned
    # to exact machine features (cross-host cache hits warn/SIGILL) — the
    # cache only pays on the remote TPU compiler, so gate it to TPU runs.
    if not loc and "tpu" not in os.environ.get("JAX_PLATFORMS", "tpu") \
            and "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            loc or os.path.expanduser("~/.cache/gantrack_jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _apply_platform_override() -> None:
    """``GANTRACK_PLATFORM=cpu|axon|tpu`` pins the JAX platform for every
    framework CLI.  Needed because ambient runtimes may pin the platform
    *programmatically* at interpreter start (the axon sitecustomize calls
    its register() before user code, overriding ``JAX_PLATFORMS``), which
    otherwise makes a CPU-only drive impossible while another process
    holds the single TPU chip."""
    import os

    plat = os.environ.get("GANTRACK_PLATFORM", "")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - best-effort, CLI errors later
        pass


_enable_persistent_compilation_cache()
_apply_platform_override()
