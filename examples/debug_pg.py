"""Referee the fused-pg parameter gradients on the REAL TPU against f64
CPU ground truth (run after/without other TPU load).

Round-2 context: with accumulators in a revisited output block the pg
gradients deviated ~3e-3 (max-rel per leaf) from TPU autodiff while being
exact in interpret mode; accumulators were moved to VMEM scratch.  This
script quantifies, per leaf, |g - g64| for (pg, hybrid, autodiff) so the
pg path can be promoted to the auto default once it is within autodiff's
own f32 noise.
"""

import jax

# the CPU referee below must run in true f64 (without this, jnp.asarray(x,
# float64) silently truncates to f32 and the comparison is meaningless)
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import jax.tree_util as tu

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
from percnn_tpu.core.rollout import rollout
from percnn_tpu.ops.pallas.backward2d import (
    fused_rollout_tp_2d, fused_rollout_tp_2d_pg,
)

cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                   diffusion="sigmoid", mu_up=3.99e-5)
params = init_pi_cell(jax.random.PRNGKey(0), cfg)
h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (100, 100, 2), jnp.float32)
T = 12
tgt = jax.random.normal(jax.random.PRNGKey(2), (T + 1, 100, 100, 2), jnp.float32)


def mkloss(roll):
    return lambda p, h: jnp.mean((roll(p, h, cfg, T) - tgt) ** 2)


def loss_scan(p, h):
    fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, T, remat=False)
    return jnp.mean((fr - tgt) ** 2)


g_pg = jax.jit(jax.grad(mkloss(fused_rollout_tp_2d_pg)))(params, h0)
g_hy = jax.jit(jax.grad(mkloss(fused_rollout_tp_2d)))(params, h0)
g_ad = jax.jit(jax.grad(loss_scan))(params, h0)

# f64 referee on CPU
cpu = jax.devices("cpu")[0]
params_np = tu.tree_map(np.asarray, params)
h0_np, tgt_np = np.asarray(h0), np.asarray(tgt)
with jax.default_device(cpu):
    p64 = tu.tree_map(lambda x: jnp.asarray(x, jnp.float64), params_np)
    h64 = jnp.asarray(h0_np, jnp.float64)
    t64 = jnp.asarray(tgt_np, jnp.float64)

    def loss64(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, T, remat=False)
        return jnp.mean((fr - t64) ** 2)

    g64 = jax.grad(loss64)(p64, h64)
    g64_np = tu.tree_map(np.asarray, g64)

flat64 = tu.tree_flatten_with_path(g64_np)[0]
for name, g in (("pg", g_pg), ("hybrid", g_hy), ("autodiff_f32", g_ad)):
    flat = tu.tree_flatten_with_path(tu.tree_map(np.asarray, g))[0]
    rows = []
    for (p, a), (_, b) in zip(flat, flat64):
        err = float(np.max(np.abs(a.astype(np.float64) - b))
                    / (np.max(np.abs(b)) + 1e-30))
        rows.append((err, tu.keystr(p)))
    rows.sort(reverse=True)
    print(f"{name:>13}: worst {rows[0][0]:.2e} @ {rows[0][1]};"
          f" median {rows[len(rows)//2][0]:.2e}")
