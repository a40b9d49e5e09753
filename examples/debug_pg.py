"""Referee the fused-pg parameter gradients on the REAL TPU against f64
CPU ground truth (run on a FREE chip, no other TPU clients).

Round-2 context: with accumulators in a revisited output block the pg
gradients deviated ~3e-3 (max-rel per leaf) from TPU autodiff while being
exact in interpret mode; accumulators were moved to VMEM scratch.  This
script quantifies, per path, worst-leaf |g - g64|/max|g64| so the pg path
can be promoted to the auto default once it is within autodiff's own f32
noise.

Structure: the main process runs f32 (x64 would leak i64 scalars into the
Pallas kernels, which Mosaic rejects) and dumps every gradient to npz;
it then re-execs itself with PG_REFEREE=1, where jax_enable_x64 is ON and
only the CPU f64 reference runs.
"""

import os
import subprocess
import sys

import jax

REFEREE = os.environ.get("PG_REFEREE") == "1"
if REFEREE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import jax.tree_util as tu

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
from percnn_tpu.core.rollout import rollout

CFG = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                   diffusion="sigmoid", mu_up=3.99e-5)
T = 12
DUMP = "/tmp/debug_pg_grads.npz"


def flat_np(tree, prefix):
    return {f"{prefix}:{tu.keystr(p)}": np.asarray(v)
            for p, v in tu.tree_flatten_with_path(tree)[0]}


def make_inputs(dtype):
    params = tu.tree_map(lambda x: jnp.asarray(np.asarray(x), dtype),
                         init_pi_cell(jax.random.PRNGKey(0), CFG, jnp.float32))
    h0 = jnp.asarray(np.asarray(
        0.3 * jax.random.normal(jax.random.PRNGKey(1), (100, 100, 2),
                                jnp.float32)), dtype)
    tgt = jnp.asarray(np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (T + 1, 100, 100, 2),
                          jnp.float32)), dtype)
    return params, h0, tgt


def loss_scan(p, h, tgt):
    fr = rollout(lambda x: pi_cell_step(p, x, CFG), h, T, remat=False)
    return jnp.mean((fr - tgt) ** 2)


if not REFEREE:
    from percnn_tpu.ops.pallas.backward2d import (
        fused_rollout_tp_2d, fused_rollout_tp_2d_pg,
    )

    params, h0, tgt = make_inputs(jnp.float32)

    def mkloss(roll):
        return lambda p, h: jnp.mean((roll(p, h, CFG, T) - tgt) ** 2)

    out = {}
    out.update(flat_np(jax.jit(jax.grad(mkloss(fused_rollout_tp_2d_pg)))(params, h0), "pg"))
    out.update(flat_np(jax.jit(jax.grad(mkloss(fused_rollout_tp_2d)))(params, h0), "hybrid"))
    out.update(flat_np(jax.jit(jax.grad(
        lambda p, h: loss_scan(p, h, tgt)))(params, h0), "autodiff_f32"))
    np.savez(DUMP, **out)
    print(f"TPU grads dumped ({len(out)} leaves) -> {DUMP}")
    env = dict(os.environ, PG_REFEREE="1")
    sys.exit(subprocess.call([sys.executable, __file__], env=env))

# ---- referee: f64 CPU ----
params, h0, tgt = make_inputs(jnp.float64)
g64 = jax.grad(lambda p, h: loss_scan(p, h, tgt))(params, h0)
ref = flat_np(g64, "f64")
assert next(iter(ref.values())).dtype == np.float64

dump = np.load(DUMP)
names = sorted({k.split(":", 1)[0] for k in dump.files})
for name in names:
    rows = []
    for k in dump.files:
        pre, path = k.split(":", 1)
        if pre != name:
            continue
        b = ref[f"f64:{path}"]
        err = (np.max(np.abs(dump[k].astype(np.float64) - b))
               / (np.max(np.abs(b)) + 1e-30))
        rows.append((err, path))
    rows.sort(reverse=True)
    print(f"{name:>13}: worst {rows[0][0]:.2e} @ {rows[0][1]}; "
          f"median {rows[len(rows) // 2][0]:.2e}")
