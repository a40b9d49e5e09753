"""Fused Pallas (Mosaic) TPU kernels for the rollout hot loop.

The reference's hot loop is ~15 small cuDNN/elementwise kernel launches per
time step (SURVEY §3.1: 2 frozen Laplacian convs + 8 Pi convs + products +
Euler axpy).  Here the whole T-step rollout runs as ONE Pallas kernel:
state lives in VMEM scratch across a sequential grid over time steps, each
step is pure VPU arithmetic on the padded field, and frames stream to HBM
through the output pipeline.  No per-step launches, no HBM round-trips for
the state.
"""

from percnn_tpu.ops.pallas.cell2d import (
    fused_rollout_2d,
    pack_pi_params_2d,
    pad_state_2d,
    unpad_frames_2d,
)
