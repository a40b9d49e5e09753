"""percnn_tpu — a TPU-native JAX framework for physics-encoded recurrent
convolutional networks (PeRCNN-class capabilities).

Re-implements, as a single idiomatic TPU library, everything the PyTorch
reference (isds-neu/PeRCNN) provides as 16 standalone scripts:

- frozen finite-difference stencil operators (4th-order Laplacian 2D/3D,
  first derivatives, forward-time difference) — `percnn_tpu.ops`
- the learnable Pi-block nonlinearity (parallel conv branches combined by
  elementwise product) and recurrent forward-Euler cells — `percnn_tpu.core.cell`
- `lax.scan` rollouts with gradient-checkpointed BPTT — `percnn_tpu.core.rollout`
- the initial-state-generator upsampler (ISG) — `percnn_tpu.core.isg`
- composite losses (data / IC / physics residual) — `percnn_tpu.core.losses`
- optax training loops with StepLR-equivalent schedules, NaN watchdog and
  atomic checkpoint/resume — `percnn_tpu.core.train`
- PDE residual definitions (lambda-omega, Gray-Scott 2D/3D, Burgers) —
  `percnn_tpu.pde`
- finite-difference ground-truth generators + noise/downsampling —
  `percnn_tpu.data`
- the three-stage PDE-discovery pipeline (library builder, STRidge sparse
  regression, Pareto analysis, symbolic extraction) — `percnn_tpu.discovery`
- fused Pallas TPU kernels for the rollout hot loop — `percnn_tpu.ops.pallas`
- mesh-parallel execution (data parallel + spatial domain decomposition with
  halo exchange over ICI) — `percnn_tpu.parallel`

The reference is pure Python/PyTorch (no native code); its performance surface
is cuDNN convs. Here the equivalent native surface is hand-written Pallas
(Mosaic) TPU kernels.
"""

__version__ = "0.1.0"
