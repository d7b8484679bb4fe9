"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding logic is exercised on virtual CPU devices (the real
environment has a single TPU chip); numerics tests cross-check against
the reference's pure-PyTorch ``impl='ref'`` paths when /root/reference
is present (skipped otherwise).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env pins the TPU platform
# On hosts with fewer cores than virtual devices, async dispatch deadlocks
# XLA:CPU cross-device collectives (each device's blocking rendezvous
# occupies the lone pool thread).  Synchronous dispatch serialises safely.
os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (must come after the env setup above)

# The ambient axon plugin may have pinned the platform before this module
# ran (sitecustomize registers it at interpreter start) — force CPU via
# config, not just env.
jax.config.update("jax_platforms", "cpu")

# Exact float32 matmuls/convs for numerics tests (framework default is the
# fast bf16-input TPU path).
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_SG3 = "/root/reference/src/models/stylegan3"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_SG3)


def import_reference_module(name: str):
    """Import a module from the reference stylegan3 tree (test oracle only)."""
    if REFERENCE_SG3 not in sys.path:
        sys.path.insert(0, REFERENCE_SG3)
    import types

    if "pkg_resources" not in sys.modules:
        # The reference imports pkg_resources (absent here) just for
        # parse_version; provide a minimal stand-in.
        from packaging.version import parse as _parse_version

        stub = types.ModuleType("pkg_resources")
        stub.parse_version = _parse_version
        sys.modules["pkg_resources"] = stub
    for mod in ("openpyxl", "requests"):
        # Pulled in transitively by the reference's util_general; not
        # exercised by the oracle paths we call.
        if mod not in sys.modules:
            try:
                import importlib as _il

                _il.import_module(mod)
            except ImportError:
                sys.modules[mod] = types.ModuleType(mod)
    import importlib

    return importlib.import_module(name)
