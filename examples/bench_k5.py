"""Measured throughput for the 5x5-Pi (Burgers/LO Stage-1) workloads and the
member-batched ensemble path — the k=1 headline lives in bench.py.

Burgers Stage-1 is the heaviest per-step compute in the reference zoo
(Pi C=16, k=5: 3 branches x 25 taps x 2 in-ch x 16 hidden x 2 eqs
~= 4.8k plane FMAs/step, rcnn_Burgers...py:108-129,161-173).

Prints one JSON line per measurement.  Methodology matches bench.py:
repeat the workload inside one jit, subtract tunnel RTT.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

H = W = 100
T = 200          # Burgers Stage-1 training rollout
REPS = 20


def rtt():
    x = jnp.zeros(())
    f = jax.jit(lambda v: v + 1)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        f(x).block_until_ready()
    return (time.perf_counter() - t0) / n


def timed(fn, *args, reps_outer=3):
    jax.tree_util.tree_leaves(fn(*args))[0].block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps_outer):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def timed_grad_injit(loss, params, h0, reps=8, rtt=0.0):
    """Robust grad timing: `reps` grad evaluations chained INSIDE one jit
    (a scalar of each grad feeds the next input so nothing folds away),
    fetched with np.asarray — block_until_ready alone under-measures on
    the tunneled backend."""
    import numpy as _np

    @jax.jit
    def many(p, h):
        def body(i, s):
            g = jax.grad(loss)(p, h + s * 0)
            return s + jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
        return lax.fori_loop(0, reps, body, jnp.zeros(()))

    _np.asarray(many(params, h0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _np.asarray(many(params, h0))
        best = min(best, time.perf_counter() - t0)
    return (best - rtt) / reps


def main():
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
    from percnn_tpu.core.rollout import rollout_tp
    from percnn_tpu.ops.pallas.cell2d import (
        _fused_rollout_padded, pack_pi_params_2d, pad_state_2d,
    )
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

    on_tpu = jax.default_backend() == "tpu"
    reps = REPS if on_tpu else 1
    lat = rtt() if on_tpu else 0.0
    cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.5,
                       init="fanin")
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)
    cells = H * W * reps * T

    # ---- fused Pallas k=5 rollout (frame-streaming) ----
    packed = pack_pi_params_2d(params, cfg)
    state0 = pad_state_2d(h0)

    @jax.jit
    def many_fused(packed, s):
        def body(i, s):
            frames = _fused_rollout_padded(packed, s, cfg=cfg, n_steps=T,
                                           H=H, W=W, interpret=not on_tpu)
            return frames[-1]
        return lax.fori_loop(0, reps, body, state0)

    dt_fused = timed(many_fused, packed, state0) - lat
    print(json.dumps({"metric": "burgers_k5_fused_rollout",
                      "value": cells / dt_fused / 1e9, "unit": "Gcell-updates/s",
                      "us_per_step": dt_fused / (reps * T) * 1e6}))

    # ---- XLA scan path ----
    @jax.jit
    def many_scan(params, h0):
        def body(i, h):
            def step(h, _):
                return pi_cell_step(params, h, cfg), None
            h, _ = lax.scan(step, h, None, length=T)
            return h
        return lax.fori_loop(0, reps, body, h0)

    dt_scan = timed(many_scan, params, h0) - lat
    print(json.dumps({"metric": "burgers_k5_xla_scan",
                      "value": cells / dt_scan / 1e9, "unit": "Gcell-updates/s",
                      "us_per_step": dt_scan / (reps * T) * 1e6}))

    # ---- training grad: fused fwd+bwd vs two-phase ----

    def loss_fused(params, h0):
        frames = fused_rollout_tp_2d(params, h0, cfg, T)
        return jnp.mean(frames[-1] ** 2)

    def loss_tp(params, h0):
        step = lambda p, h: pi_cell_step(p, h, cfg)
        frames = rollout_tp(step, params, h0, T)
        return jnp.mean(frames[-1] ** 2)

    for name, loss in (("fused", loss_fused), ("two_phase", loss_tp)):
        try:
            dt = timed_grad_injit(loss, params, h0, reps=4 if on_tpu else 1,
                                  rtt=lat)
            print(json.dumps({"metric": f"burgers_k5_train_grad_{name}",
                              "value": dt * 1e3, "unit": "ms/iter(T=200)"}))
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": f"burgers_k5_train_grad_{name}",
                              "error": repr(e)[:200]}))

    # ---- GS2D k=1 training grad: hybrid fused vs fully-fused pg ----
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d_pg

    cfg1_t = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                          diffusion="sigmoid", mu_up=3.99e-5)
    params1 = init_pi_cell(jax.random.PRNGKey(5), cfg1_t)
    h01 = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (H, W, 2), jnp.float32)
    T1 = 800

    def loss_f1(p, h):
        return jnp.mean(fused_rollout_tp_2d(p, h, cfg1_t, T1)[-1] ** 2)

    def loss_pg1(p, h):
        return jnp.mean(fused_rollout_tp_2d_pg(p, h, cfg1_t, T1)[-1] ** 2)

    for name, loss in (("fused_hybrid", loss_f1), ("fused_pg", loss_pg1)):
        try:
            dt = timed_grad_injit(loss, params1, h01, reps=8 if on_tpu else 1,
                                  rtt=lat)
            print(json.dumps({"metric": f"gs2d_T800_grad_{name}",
                              "value": dt * 1e3, "unit": "ms/iter"}))
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": f"gs2d_T800_grad_{name}",
                              "error": repr(e)[:200]}))

    # ---- ensemble: member-batched fused vs vmapped two-phase (GS2D cfg) ----
    from percnn_tpu.ops.pallas.batched2d import (
        fused_rollout_tp_2d_batched, fused_rollout_tp_2d_batched_pg,
    )

    cfg1 = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                        diffusion="sigmoid", mu_up=3.99e-5)
    M, Te = 4, 800
    params_m = jax.vmap(lambda k: init_pi_cell(k, cfg1))(
        jax.random.split(jax.random.PRNGKey(2), M))
    h0_m = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (M, H, W, 2), jnp.float32)

    def loss_b(params_m, h0_m):
        frames = fused_rollout_tp_2d_batched(params_m, h0_m, cfg1, Te)
        return jnp.mean(frames[:, -1] ** 2)

    def loss_v(params_m, h0_m):
        step = lambda p, h: pi_cell_step(p, h, cfg1)
        f = jax.vmap(lambda p, h: rollout_tp(step, p, h, Te))(params_m, h0_m)
        return jnp.mean(f[:, -1] ** 2)

    def loss_bpg(params_m, h0_m):
        frames = fused_rollout_tp_2d_batched_pg(params_m, h0_m, cfg1, Te)
        return jnp.mean(frames[:, -1] ** 2)

    def loss_loop_pg(params_m, h0_m):
        tot = 0.0
        for m in range(M):
            p_m = jax.tree_util.tree_map(lambda x: x[m], params_m)
            tot = tot + jnp.mean(
                fused_rollout_tp_2d_pg(p_m, h0_m[m], cfg1, Te)[-1] ** 2)
        return tot / M

    for name, loss in (("batched_fused", loss_b), ("vmap_two_phase", loss_v),
                       ("batched_pg", loss_bpg), ("member_loop_pg", loss_loop_pg)):
        try:
            dt = timed_grad_injit(loss, params_m, h0_m,
                                  reps=4 if on_tpu else 1, rtt=lat)
            print(json.dumps({"metric": f"gs2d_ens4_T800_grad_{name}",
                              "value": dt * 1e3, "unit": "ms/iter"}))
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": f"gs2d_ens4_T800_grad_{name}",
                              "error": repr(e)[:200]}))


if __name__ == "__main__":
    main()
