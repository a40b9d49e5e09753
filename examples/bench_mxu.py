"""Measure the k=5 MXU kernels on TPU (in-jit chained reps, RTT-subtracted).

Run AFTER the TPU is free:  nohup python examples/bench_mxu.py > log &
Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell  # noqa: E402
from percnn_tpu.ops.pallas import backward2d as B  # noqa: E402
import percnn_tpu.ops.pallas.cell2d as C2  # noqa: E402

H = W = 100
T = 200

cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025, dx=0.01,
                   diffusion="sigmoid", mu_up=0.01, init_scale=0.5,
                   init="fanin")
params = init_pi_cell(jax.random.PRNGKey(0), cfg)
h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)


def rtt():
    f = jax.jit(lambda v: v + 1)
    x = jnp.zeros(())
    np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


LAT = rtt()
print(json.dumps({"rtt_ms": LAT * 1e3}), flush=True)


def measure(name, fn, reps):
    @jax.jit
    def many(p, h):
        def body(i, s):
            out = fn(p, h + s * 0)
            return s + jax.tree_util.tree_leaves(out)[0].reshape(-1)[0] * 1e-9
        return lax.fori_loop(0, reps, body, jnp.zeros(()))

    print(f"[{time.strftime('%H:%M:%S')}] compiling {name}...", flush=True)
    np.asarray(many(params, h0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many(params, h0))
        best = min(best, time.perf_counter() - t0)
    ms = (best - LAT) / reps * 1e3
    print(json.dumps({"piece": name, "ms_per_iter": ms,
                      "us_per_step": ms / T * 1e3}), flush=True)
    return ms


def loss(p, h):
    return jnp.mean(B.fused_rollout_tp_2d(p, h, cfg, T)[1:] ** 2)


pieces = set(sys.argv[1:]) or {"fwd_mxu", "grad_mxu"}

if "fwd_mxu" in pieces:
    measure("fwd_mxu",
            lambda p, h: B.fused_rollout_tp_2d(p, h, cfg, T)[-1], reps=10)
if "grad_mxu" in pieces:
    measure("grad_mxu", lambda p, h: jax.grad(loss)(p, h), reps=8)
if "fwd_vpu" in pieces:
    C2.MXU_FWD_ENABLED = False
    measure("fwd_vpu",
            lambda p, h: B.fused_rollout_tp_2d(p, h, cfg, T)[-1], reps=10)
    C2.MXU_FWD_ENABLED = True
if "grad_ys" in pieces:
    B.MXU_BWD_ENABLED = False
    measure("grad_ys", lambda p, h: jax.grad(loss)(p, h), reps=4)
    B.MXU_BWD_ENABLED = True
print("all done", flush=True)
