"""Core numerics library: resampling, activations, modulated convolution.

TPU-native re-implementations of the reference's CUDA op layer
(``torch_utils/ops/``).  ``fma`` and the conv/grid-sample "gradfix"
wrappers of the reference are intentionally absent: JAX autodiff
provides arbitrary-order gradients and correct broadcast adjoints
natively (see SURVEY.md §2.2).
"""

from .bias_act import activation_funcs, bias_act
from .conv2d_resample import conv2d_resample
from .filtered_lrelu import filtered_lrelu
from .grid_sample import affine_grid, grid_sample
from .modulated_conv2d import modulated_conv2d
from .upfirdn2d import downsample2d, filter2d, setup_filter, upfirdn2d, upsample2d

__all__ = [
    "activation_funcs",
    "bias_act",
    "conv2d_resample",
    "filtered_lrelu",
    "grid_sample",
    "affine_grid",
    "modulated_conv2d",
    "setup_filter",
    "upfirdn2d",
    "filter2d",
    "upsample2d",
    "downsample2d",
]
