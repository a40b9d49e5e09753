"""Domain-decomposed rollout over a device mesh (runs on 8 virtual CPU
devices if no pod is attached).

XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
    python examples/multichip_sharding.py
"""

import jax
import jax.numpy as jnp

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
from percnn_tpu.parallel import make_mesh, sharded_rollout_nd

cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                   diffusion="sigmoid", mu_up=3.99e-5)
params = init_pi_cell(jax.random.PRNGKey(0), cfg)
h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (256, 256, 2), jnp.float32)

mesh = make_mesh(("x", "y"))  # factors all visible devices automatically
frames = sharded_rollout_nd(params, h0, cfg, 100, mesh)
print("devices:", len(jax.devices()), "mesh:", dict(mesh.shape))
print("frames:", frames.shape, "sharding:", frames.sharding)
