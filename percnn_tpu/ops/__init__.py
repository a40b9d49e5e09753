"""Finite-difference stencil operators and conv primitives (TPU-first).

Replaces the reference's frozen ``nn.Conv{1,2,3}d`` derivative wrappers
(reference: train_2drd.py:193-238, train_3drd.py:217-261) with roll-based
periodic stencil applications that XLA fuses into a handful of vector ops,
plus torch-semantics learnable conv / conv-transpose wrappers used by the
Pi-block and the ISG upsampler.
"""

from percnn_tpu.ops.stencils import (
    laplacian,
    grad_axis,
    time_derivative_fwd,
    periodic_pad,
    LAP_CROSS_1D,
    FD1_CENTRAL_1D,
)
from percnn_tpu.ops.convs import (
    conv_nd_periodic,
    pointwise_conv,
    conv_transpose_torch,
)
from percnn_tpu.ops.interp import resize_align_corners
