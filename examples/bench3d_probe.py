"""3D fused-kernel throughput probe (round-5, VERDICT item 4).

RESULTS.md round 1 claimed 16.8 G cell-updates/s for the fused 3D rollout;
the driver bench has measured ~5 G in rounds 3-4.  This probe measures
variants of the 48^3 Gray-Scott rollout kernel to locate the gap:

  v0_baseline   : current fused_rollout_3d (flat [D, H*W], all frames out)
  v1_final      : same kernel, final state only (no per-step HBM writes)
  v2_unroll2    : final-only, 2 steps per grid iteration
  v3_sublane    : [D*H, W] layout — depth/height shifts become sublane
                  rolls (depth wraps exactly at D*H), width sums become one
                  MXU matmul with a banded circulant [W, W]; final only
  v4_sublane_fr : v3 layout, all frames out (API-parity variant)

Each variant is checked against the jnp reference path (T=4, f32) before
timing.  Timing matches bench.py: in-jit fori_loop repetition, tunnel RTT
subtracted.

Run: PYTHONPATH=/root/repo python examples/bench3d_probe.py
Writes runs/round5/bench3d_probe.jsonl.
"""

import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
from percnn_tpu.ops.pallas.cell2d import pack_pi_params_2d
from percnn_tpu.ops.pallas.cell3d import (_lap3d_flat, _pi_poly, _roll,
                                          fused_rollout_3d)

OUT = "runs/round5"
os.makedirs(OUT, exist_ok=True)
LOG = os.path.join(OUT, "bench3d_probe.jsonl")

D = 48
T = 300
REPS = 10

CFG = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.0,
                   diffusion="sigmoid", mu_up=0.01, init_scale=0.02)


def record(row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


# ---------------------------------------------------------------- timing
def _latency():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda y: y + 1.0)
    _ = np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(many_fn, args, reps, lat, outer=3):
    _ = np.asarray(many_fn(*args)).ravel()[0:1]
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        _ = np.asarray(many_fn(*args)).ravel()[0:1]
        best = min(best, time.perf_counter() - t0)
    return (best - lat) / reps


# ------------------------------------------------------- shared kernel math
def _step_flat(u, v, p_ref, inv_dx2, C):
    block = 3 * (3 * C) + C + 1
    lap_u = _lap3d_flat(u, D, D, D, inv_dx2)
    lap_v = _lap3d_flat(v, D, D, D, inv_dx2)
    un = u + CFG.dt * (p_ref[0] * lap_u + _pi_poly(u, v, p_ref, 2, C))
    vn = v + CFG.dt * (p_ref[1] * lap_v + _pi_poly(u, v, p_ref, 2 + block, C))
    return un, vn


# ------------------------------------------------------------- v1: final
def _final_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *, n_steps):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    un, vn = _step_flat(su_ref[:, :], sv_ref[:, :], p_ref,
                        1.0 / (CFG.dx * CFG.dx), CFG.hidden)
    su_ref[:, :] = un
    sv_ref[:, :] = vn

    @pl.when(t == n_steps - 1)
    def _():
        out_ref[0, :, :] = un
        out_ref[1, :, :] = vn


@functools.partial(jax.jit, static_argnames=("n_steps",))
def final_flat(packed, state0, n_steps):
    return pl.pallas_call(
        functools.partial(_final_kernel, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, D, D * D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, D, D * D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, D, D * D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, D * D), jnp.float32),
                        pltpu.VMEM((D, D * D), jnp.float32)],
    )(packed, state0)


# ---------------------------------------------------------- v2: unroll 2
def _unroll2_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *, n_pairs):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    inv_dx2 = 1.0 / (CFG.dx * CFG.dx)
    u, v = su_ref[:, :], sv_ref[:, :]
    u, v = _step_flat(u, v, p_ref, inv_dx2, CFG.hidden)
    u, v = _step_flat(u, v, p_ref, inv_dx2, CFG.hidden)
    su_ref[:, :] = u
    sv_ref[:, :] = v

    @pl.when(t == n_pairs - 1)
    def _():
        out_ref[0, :, :] = u
        out_ref[1, :, :] = v


@functools.partial(jax.jit, static_argnames=("n_pairs",))
def unroll2_flat(packed, state0, n_pairs):
    return pl.pallas_call(
        functools.partial(_unroll2_kernel, n_pairs=n_pairs),
        grid=(n_pairs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((2, D, D * D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, D, D * D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, D, D * D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, D * D), jnp.float32),
                        pltpu.VMEM((D, D * D), jnp.float32)],
    )(packed, state0)


# ------------------------------------------------- v3: sublane [D*H, W]
# layout: x[d*H + h, w].  depth shift s -> sublane roll by s*H (wraps at
# D*H == exact periodic depth wrap).  height shift s -> sublane roll by s
# with a two-roll blend at block boundaries.  width sums -> one MXU matmul
# with a banded circulant M[W, W].
def _shift_h_sub(x, s):
    """height shift on [D*H, W]: out[d*H+h] = x[d*H + (h+s) mod H]."""
    n = x.shape[0]
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    h_idx = row % D
    a = _roll(x, s, 0)
    if s > 0:
        b = _roll(x, s - D, 0)
        return jnp.where(h_idx < D - s, a, b)
    b = _roll(x, s + D, 0)
    return jnp.where(h_idx >= -s, a, b)


def _width_circulant():
    m = np.zeros((D, D), np.float32)
    for i in range(D):
        m[(i + 1) % D, i] += 4.0 / 3.0
        m[(i - 1) % D, i] += 4.0 / 3.0
        m[(i + 2) % D, i] += -1.0 / 12.0
        m[(i - 2) % D, i] += -1.0 / 12.0
    # x @ m gives out[r, i] = sum_j x[r, j] m[j, i]; we want
    # out[r, i] = 4/3(x[r,i+1]+x[r,i-1]) - 1/12(x[r,i+2]+x[r,i-2])
    return jnp.asarray(m)


def _lap3d_sub(x, mw, inv_dx2):
    dpt = ((4.0 / 3.0) * (_roll(x, D, 0) + _roll(x, -D, 0))
           - (1.0 / 12.0) * (_roll(x, 2 * D, 0) + _roll(x, -2 * D, 0)))
    hgt = ((4.0 / 3.0) * (_shift_h_sub(x, 1) + _shift_h_sub(x, -1))
           - (1.0 / 12.0) * (_shift_h_sub(x, 2) + _shift_h_sub(x, -2)))
    wdt = jnp.dot(x, mw, preferred_element_type=jnp.float32)
    return (dpt + hgt + wdt + 3.0 * (-5.0 / 2.0) * x) * inv_dx2


def _step_sub(u, v, p_ref, mw, inv_dx2, C):
    block = 3 * (3 * C) + C + 1
    lap_u = _lap3d_sub(u, mw, inv_dx2)
    lap_v = _lap3d_sub(v, mw, inv_dx2)
    un = u + CFG.dt * (p_ref[0] * lap_u + _pi_poly(u, v, p_ref, 2, C))
    vn = v + CFG.dt * (p_ref[1] * lap_v + _pi_poly(u, v, p_ref, 2 + block, C))
    return un, vn


def _sub_kernel(p_ref, mw_ref, init_ref, out_ref, su_ref, sv_ref, *,
                n_steps, unroll, frames):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    inv_dx2 = 1.0 / (CFG.dx * CFG.dx)
    u, v = su_ref[:, :], sv_ref[:, :]
    mw = mw_ref[:, :]
    for _ in range(unroll):
        u, v = _step_sub(u, v, p_ref, mw, inv_dx2, CFG.hidden)
    su_ref[:, :] = u
    sv_ref[:, :] = v
    if frames:
        out_ref[0, 0, :, :] = u
        out_ref[0, 1, :, :] = v
    else:
        @pl.when(t == n_steps - 1)
        def _():
            out_ref[0, :, :] = u
            out_ref[1, :, :] = v


@functools.partial(jax.jit, static_argnames=("n_steps", "unroll", "frames"))
def sub_rollout(packed, mw, state0, n_steps, unroll=1, frames=False):
    n_iter = n_steps // unroll
    if frames:
        out_spec = pl.BlockSpec((1, 2, D * D, D), lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_iter, 2, D * D, D), jnp.float32)
    else:
        out_spec = pl.BlockSpec((2, D * D, D), lambda t: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, D * D, D), jnp.float32)
    return pl.pallas_call(
        functools.partial(_sub_kernel, n_steps=n_iter, unroll=unroll,
                          frames=frames),
        grid=(n_iter,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((D, D), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, D * D, D), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((D * D, D), jnp.float32),
                        pltpu.VMEM((D * D, D), jnp.float32)],
    )(packed, mw, state0)


def to_sub(h0):
    # [D, H, W, 2] -> [2, D*H, W]
    return jnp.moveaxis(h0, -1, 0).reshape(2, D * D, D)


def from_sub(s):
    # [2, D*H, W] -> [D, H, W, 2]
    return jnp.moveaxis(s.reshape(2, D, D, D), 0, -1)


# ------------------------------------------------------------------ main
def main():
    assert jax.default_backend() == "tpu", jax.devices()
    lat = _latency()
    record({"variant": "latency", "seconds": lat})

    params = init_pi_cell(jax.random.PRNGKey(0), CFG)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (D, D, D, 2),
                                 jnp.float32)
    packed = pack_pi_params_2d(params, CFG)
    state0 = jnp.moveaxis(h0, -1, 0).reshape(2, D, D * D)
    mw = _width_circulant()
    s0_sub = to_sub(h0)

    # correctness: jnp reference path, 4 steps
    def ref_step(h):
        return pi_cell_step(params, h[None], CFG)[0]

    href = h0
    for _ in range(4):
        href = ref_step(href)
    href = np.asarray(href)

    checks = {
        "v0_baseline": np.asarray(fused_rollout_3d(params, h0, CFG, 4)[-1]),
        "v1_final": np.asarray(
            final_flat(packed, state0, 4)).reshape(2, D, D, D).transpose(1, 2, 3, 0),
        "v2_unroll2": np.asarray(
            unroll2_flat(packed, state0, 2)).reshape(2, D, D, D).transpose(1, 2, 3, 0),
        "v3_sublane": np.asarray(from_sub(sub_rollout(packed, mw, s0_sub, 4))),
        "v3_sublane_u2": np.asarray(
            from_sub(sub_rollout(packed, mw, s0_sub, 4, unroll=2))),
        "v4_sublane_fr": np.asarray(
            from_sub(sub_rollout(packed, mw, s0_sub, 4, frames=True)[-1])),
    }
    for name, got in checks.items():
        err = float(np.max(np.abs(got - href)))
        record({"variant": name, "check_maxerr": err})
        assert err < 1e-4, (name, err)

    cells = D ** 3 * T

    def bench(name, step_state, init_state):
        # the rollout output is the next fori_loop carry, so XLA cannot
        # hoist the loop-invariant computation (bench.py methodology)
        @jax.jit
        def many(s):
            return lax.fori_loop(0, REPS, lambda i, x: step_state(x),
                                 s)

        per = timeit(many, (init_state,), REPS, lat)
        record({"variant": name, "seconds_per_rollout": per,
                "gcups": cells / per / 1e9})

    bench("v0_baseline", lambda h: fused_rollout_3d(params, h, CFG, T)[-1],
          h0)
    bench("v1_final", lambda s: final_flat(packed, s, T), state0)
    bench("v2_unroll2", lambda s: unroll2_flat(packed, s, T // 2), state0)
    bench("v3_sublane", lambda s: sub_rollout(packed, mw, s, T), s0_sub)
    bench("v3_sublane_u2", lambda s: sub_rollout(packed, mw, s, T, unroll=2),
          s0_sub)
    bench("v4_sublane_fr",
          lambda s: sub_rollout(packed, mw, s, T, frames=True)[-1], s0_sub)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
