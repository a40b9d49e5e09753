"""Driver benchmark: headline GS2D rollout throughput + the other hot
paths (3D rollout, k=5 rollout, k=1/k=5 training gradients).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The headline metric keeps the round-1/2 schema; "extras" carries the
secondary paths so kernel regressions there are machine-visible
(VERDICT r2 "widen the driver bench").

Baseline: the reference rolls out on one V100 with ~15 small kernel
launches per step (2 frozen 5x5 cuDNN convs + 8 pointwise convs + products
+ axpy, SURVEY §3.1); at a measured-typical ~5-10us launch+execute floor
per tiny kernel that is >=100us/step => <=1e8 cell-updates/s.  We use
1e8 as the (generous) V100 baseline constant; the reference publishes no
throughput numbers (BASELINE.md).

Methodology: the tunneled single-chip dev TPU has ~30ms RPC latency, so
every measurement repeats its workload inside ONE jit (state chained so
nothing folds away) and the separately-measured latency is subtracted.
Host-side per-call timing over-reports gradients 2-3x on this backend.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:
    # sitecustomize pre-imports jax on the axon TPU; env vars are too late
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

BASELINE_V100_CELL_UPDATES_PER_S = 1.0e8
H = W = 100
T = 401       # GS2D headline: train_2drd.py:597,620 rollout length
T3D = 300     # GS3D reference rollout (train_3drd.py)
D3 = 48
T5 = 200      # Burgers/LO Stage-1 training rollout


def _latency():
    triv = jax.jit(lambda x: x + 1)
    _ = np.asarray(triv(jnp.zeros(8)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(triv(jnp.zeros(8)))
        best = min(best, time.perf_counter() - t0)
    return best


def _timeit(many_fn, args, reps, lat, outer=5):
    """many_fn repeats its workload `reps` times inside one jit and returns
    a scalar-ish array; returns seconds per repetition."""
    _ = np.asarray(many_fn(*args)).ravel()[0:1]  # compile + warm
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        _ = np.asarray(many_fn(*args)).ravel()[0:1]
        best = min(best, time.perf_counter() - t0)
    return (best - lat) / reps


def headline(lat, on_tpu):
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
    from percnn_tpu.ops.pallas.cell2d import (
        _fused_rollout_padded, pack_pi_params_2d, pad_state_2d,
    )

    cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                       diffusion="sigmoid", mu_up=3.99e-5, init_scale=0.02)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)
    # reps sized so in-jit compute (~100-200ms) dwarfs the ~30ms tunnel RTT
    # being subtracted: at reps=50 the RTT term was ~2/3 of the measured
    # call and its jitter dominated the session-to-session variance
    # (driver history 8.2-14.4 G on identical code).
    reps = 400 if on_tpu else 2

    if on_tpu:
        packed = pack_pi_params_2d(params, cfg)
        state0 = pad_state_2d(h0)

        @jax.jit
        def many(packed, state0):
            def body(i, s):
                frames = _fused_rollout_padded(
                    packed, s, cfg=cfg, n_steps=T, H=H, W=W, interpret=False)
                return frames[-1]
            return lax.fori_loop(0, reps, body, state0)

        args = (packed, state0)
    else:
        # CPU fallback: the XLA scan path (interpreted Pallas would take
        # minutes per rollout); numbers are then CPU-scan numbers.
        from percnn_tpu.core.cell import pi_cell_step
        from percnn_tpu.core.rollout import rollout_final

        @jax.jit
        def many(h):
            def body(i, x):
                return rollout_final(lambda y: pi_cell_step(params, y, cfg),
                                     x, T)
            return lax.fori_loop(0, reps, body, h)

        args = (h0,)

    per_rollout = _timeit(many, args, reps, lat)
    return H * W * T / per_rollout


def gs3d_rollout(lat):
    """48^3 k=1 fused 3D rollout (train_3drd.py workload)."""
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
    from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.0,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.02)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (D3, D3, D3, 2),
                                 jnp.float32)
    reps = 60

    @jax.jit
    def many(h):
        def body(i, x):
            # final_only + unroll=2: no per-step HBM frame writes, two cell
            # steps per grid iteration (round-5 probe: 7.84 G vs 5.4 G with
            # frame writes, runs/round5/bench3d_probe.jsonl) — matches the
            # 2D bench's final-state kernel methodology.
            return fused_rollout_3d(params, x, cfg, T3D, final_only=True,
                                    unroll=2)
        return lax.fori_loop(0, reps, body, h)

    per_rollout = _timeit(many, (h0,), reps, lat, outer=8)
    return D3 ** 3 * T3D / per_rollout


def _k5_setup():
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell

    cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.5,
                       init="fanin")
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)
    return cfg, params, h0


def k5_rollout_us_per_step(lat):
    """5x5-Pi C=16 fused forward (Burgers/LO Stage-1 cell)."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

    cfg, params, h0 = _k5_setup()
    reps = 100

    @jax.jit
    def many(p, h):
        def body(i, x):
            return fused_rollout_tp_2d(p, x, cfg, T5)[-1]
        return lax.fori_loop(0, reps, body, h)

    per_rollout = _timeit(many, (params, h0), reps, lat)
    return per_rollout / T5 * 1e6


def _grad_ms_per_iter(roll, params, h0, n_steps, lat, reps=8):
    """Training-shaped gradient: d/dparams of a scalar of the full frame
    stream, `reps` evaluations chained inside one jit."""
    def loss(p, h):
        frames = roll(p, h, n_steps)
        return jnp.mean(frames[1:] ** 2)

    @jax.jit
    def many(p, h):
        def body(i, s):
            g = jax.grad(loss)(p, h + s * 0)
            return s + jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
        return lax.fori_loop(0, reps, body, jnp.zeros(()))

    return _timeit(many, (params, h0), reps, lat) * 1e3


def k1_grad_ms(lat):
    """GS2D training gradient through the fully-fused pg BPTT, T=800
    (train_2drd.py's full-curriculum rollout length)."""
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d_pg

    cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                       diffusion="sigmoid", mu_up=3.99e-5, init_scale=0.02)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)
    return _grad_ms_per_iter(
        lambda p, h, n: fused_rollout_tp_2d_pg(p, h, cfg, n),
        params, h0, 800, lat, reps=16)


def k5_grad_ms(lat):
    """Burgers/LO Stage-1 training gradient (k=5 fused fwd + bwd), T=200."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

    cfg, params, h0 = _k5_setup()
    return _grad_ms_per_iter(
        lambda p, h, n: fused_rollout_tp_2d(p, h, cfg, n),
        params, h0, T5, lat, reps=16)


def main() -> None:
    on_tpu = jax.default_backend() != "cpu"
    lat = _latency()
    value = headline(lat, on_tpu)

    extras = {}
    if on_tpu:
        for name, fn, unit in (
            ("gs3d_rollout", gs3d_rollout, "cell-updates/s"),
            ("k5_rollout", k5_rollout_us_per_step, "us/step"),
            ("k1_grad_T800", k1_grad_ms, "ms/iter"),
            ("k5_grad_T200", k5_grad_ms, "ms/iter"),
        ):
            try:
                extras[name] = {"value": fn(lat), "unit": unit}
            except Exception as e:  # a broken path must not hide the rest
                extras[name] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "gs2d_rollout_cell_updates_per_sec_per_chip",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / BASELINE_V100_CELL_UPDATES_PER_S,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
