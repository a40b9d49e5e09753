"""Mesh parallelism: the reference is strictly single-GPU (SURVEY §2: every
script pins one device via CUDA_VISIBLE_DEVICES; no torch.distributed
anywhere), so this package is new TPU-first capability:

- data parallel (DP): batches of independent rollouts (ensemble ICs / noise
  seeds) sharded over a mesh axis;
- spatial/tensor parallel (domain decomposition): grid axes sharded over the
  mesh; the 5-point stencils exchange a 2-cell halo per step over ICI via
  `lax.ppermute` inside `shard_map` — the device ring's wrap-around edge IS
  the periodic boundary condition;
- GSPMD auto path: jit + NamedSharding on the existing jnp model; XLA
  inserts the halo collectives for roll/slice automatically.  Used for full
  training steps (losses + BPTT) where manual decomposition of every op
  would be busywork.

No attention, no MoE exists anywhere in the reference, so EP / ring-attention
/ Ulysses-style sequence parallelism have no counterpart here; the time
recurrence is sequential by physics and is parallelised in memory (remat)
rather than across devices.
"""

from percnn_tpu.parallel.mesh import make_mesh, factor_devices
from percnn_tpu.parallel.halo import halo_exchange
from percnn_tpu.parallel.sharded import (
    sharded_rollout_nd,
    make_train_step_spmd,
    shard_array,
    replicate,
)
