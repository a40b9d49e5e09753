"""Clean-machine timing of the expanded-cubic 3D kernel (round 5).

Times fused_rollout_3d on the 48^3 x T=300 reference workload
(train_3drd.py:497) for expanded vs literal step and unroll 1/2/4,
final-only (bench.py methodology: in-jit fori_loop repetition, tunnel RTT
subtracted).  Appends rows to runs/round5/bench3d_probe.jsonl.

Run when the TPU and host are otherwise idle:
  PYTHONPATH=/root/.axon_site:/root/repo python examples/bench3d_expanded.py
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell  # noqa: E402
from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d  # noqa: E402

LOG = "runs/round5/bench3d_probe.jsonl"
D, T, REPS = 48, 300, 10
CFG = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.0,
                   diffusion="sigmoid", mu_up=0.01, init_scale=0.02)


def latency():
    f = jax.jit(lambda y: y + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _ = np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    params = init_pi_cell(jax.random.PRNGKey(0), CFG)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (D, D, D, 2),
                                 jnp.float32)
    lat = latency()
    for expanded in (False, True):
        for unroll in (1, 2, 4):
            if T % unroll:
                continue

            @jax.jit
            def many(h, expanded=expanded, unroll=unroll):
                def body(i, x):
                    return fused_rollout_3d(params, x, CFG, T,
                                            final_only=True, unroll=unroll,
                                            expanded=expanded)
                return lax.fori_loop(0, REPS, body, h)

            _ = np.asarray(many(h0)).ravel()[:1]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(many(h0)).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            per_rollout = (best - lat) / REPS
            row = {"variant": f"{'expanded' if expanded else 'literal'}"
                              f"_unroll{unroll}_final",
                   "us_per_step": per_rollout / T * 1e6,
                   "g_cell_updates_per_s": D ** 3 * T / per_rollout / 1e9}
            with open(LOG, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
