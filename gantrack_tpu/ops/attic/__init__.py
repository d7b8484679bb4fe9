"""Parked kernels: complete, tested, benchmarked — and measurably NOT
faster than the in-step XLA formulations at the hot shapes, so nothing
imports them from the production paths.

* ``conv3x3``  — Pallas implicit-GEMM 3×3 conv (width-fold).  Chained
  microbench ~23 TF/s vs XLA's ~32 TF/s in-step (round 2); kept for
  shape regimes where a fused epilogue could flip the verdict.
* ``space_to_depth`` — s2d conv lowering; measured neutral-to-slower
  (round 1).
* ``fir`` — Pallas NHWC depthwise FIR stencil (same/down2/up2, closed
  VJP).  Round-3 on-chip A/B: up2 moved 68 GB/s vs XLA's 264 GB/s, and
  the same/down2 halo windows hit a Mosaic Element-low-padding limit.
  XLA's depthwise conv stays the production lowering.

Tests live in ``tests/test_conv3x3.py`` / ``tests/test_space_to_depth.py``
/ ``tests/test_pallas_fir.py`` (interpret mode) and keep the kernels
correct should a future shape regime or Mosaic release favor them.
"""

from . import conv3x3, fir, space_to_depth  # noqa: F401
