"""Fused 3D Pi-cell rollout kernel (Gray-Scott 3D hot loop).

Layout trick: a [D, H, W] periodic field is stored flat as [D, H*W].  For
48^3 (the reference 3D grid, train_3drd.py:497) that is [48, 2304] —
natively tile-aligned (48 = 6x8 sublanes, 2304 = 18x128 lanes), no padding,
no halo:

- depth shifts  : roll along the sublane axis (wraps at D = periodic BC);
- height shifts : roll along the flat axis by s*W — the flat axis wraps at
  H*W, which IS the height wrap within the same depth row;
- width shifts  : roll by s, except lanes crossing a row boundary need the
  companion roll by s -+ W — two rolls blended by a static lane mask.

The whole T-step rollout is one pallas_call (sequential grid over t, state
in VMEM scratch), mirroring cell2d.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig
from percnn_tpu.ops.pallas.cell2d import pack_pi_params_2d

pack_pi_params_3d = pack_pi_params_2d  # packing is dimension-agnostic


def _roll(x, shift: int, axis: int):
    """out[i] = x[(i + shift) mod n] along `axis` (jnp.roll with -shift;
    pltpu.roll only accepts non-negative shifts)."""
    return pltpu.roll(x, (-shift) % x.shape[axis], axis)


def _shift_w(x, s: int, W: int):
    """Width shift on the flat [D, H*W] layout: out[.., h, w] = x[.., h,
    (w+s) mod W]."""
    if s == 0:
        return x
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    w_idx = lane % W
    a = _roll(x, s, 1)
    if s > 0:
        b = _roll(x, s - W, 1)
        return jnp.where(w_idx < W - s, a, b)
    b = _roll(x, s + W, 1)
    return jnp.where(w_idx >= -s, a, b)


def _lap3d_flat(x, D: int, H: int, W: int, inv_dx2: float):
    """4th-order 13-point Laplacian on the flat layout."""
    def ax_sum(s1a, s1b, s2a, s2b):
        return (4.0 / 3.0) * (s1a + s1b) - (1.0 / 12.0) * (s2a + s2b)

    d = ax_sum(_roll(x, 1, 0), _roll(x, -1, 0), _roll(x, 2, 0), _roll(x, -2, 0))
    h = ax_sum(_roll(x, W, 1), _roll(x, -W, 1), _roll(x, 2 * W, 1), _roll(x, -2 * W, 1))
    w = ax_sum(_shift_w(x, 1, W), _shift_w(x, -1, W),
               _shift_w(x, 2, W), _shift_w(x, -2, W))
    return (d + h + w + 3.0 * (-5.0 / 2.0) * x) * inv_dx2


def _pi_poly(u, v, p, base: int, C: int):
    acc = None
    stride = 3 * C
    for c in range(C):
        prod = None
        for i in range(3):
            off = base + i * stride
            y = p[off + c] * u + p[off + C + c] * v + p[off + 2 * C + c]
            prod = y if prod is None else prod * y
        term = p[base + 3 * stride + c] * prod
        acc = term if acc is None else acc + term
    return acc + p[base + 3 * stride + C]


def _step_flat(u, v, p_ref, *, cfg: PiCellConfig, D: int, H: int, W: int):
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    C = cfg.hidden
    block = 3 * (3 * C) + C + 1
    lap_u = _lap3d_flat(u, D, H, W, inv_dx2)
    lap_v = _lap3d_flat(v, D, H, W, inv_dx2)
    pi_u = _pi_poly(u, v, p_ref, 2, C)
    pi_v = _pi_poly(u, v, p_ref, 2 + block, C)
    un = u + cfg.dt * (p_ref[0] * lap_u + pi_u)
    vn = v + cfg.dt * (p_ref[1] * lap_v + pi_v)
    return un, vn


def _rollout3d_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *,
                      cfg: PiCellConfig, D: int, H: int, W: int,
                      unroll: int, final_only: bool, n_iters: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    u = su_ref[:, :]
    v = sv_ref[:, :]
    for k in range(unroll):
        u, v = _step_flat(u, v, p_ref, cfg=cfg, D=D, H=H, W=W)
        if not final_only:
            out_ref[k, 0, :, :] = u
            out_ref[k, 1, :, :] = v
    su_ref[:, :] = u
    sv_ref[:, :] = v
    if final_only:
        @pl.when(t == n_iters - 1)
        def _():
            out_ref[0, :, :] = u
            out_ref[1, :, :] = v


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_steps", "D", "H", "W", "interpret", "unroll", "final_only"))
def _fused_rollout3d_flat(packed, state0, *, cfg, n_steps, D, H, W,
                          interpret, unroll=1, final_only=False):
    n_iters = n_steps // unroll
    kernel = functools.partial(_rollout3d_kernel, cfg=cfg, D=D, H=H, W=W,
                               unroll=unroll, final_only=final_only,
                               n_iters=n_iters)
    if final_only:
        out_specs = pl.BlockSpec((2, D, H * W), lambda t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, D, H * W), jnp.float32)
    else:
        # block of `unroll` consecutive frames per grid iteration
        out_specs = pl.BlockSpec((unroll, 2, D, H * W),
                                 lambda t: (t, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_steps, 2, D, H * W), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n_iters,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, D, H * W), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((D, H * W), jnp.float32),
            pltpu.VMEM((D, H * W), jnp.float32),
        ],
        interpret=interpret,
    )(packed, state0)


def fused_rollout_3d(
    params: dict,
    h0: jnp.ndarray,
    cfg: PiCellConfig,
    n_steps: int,
    *,
    interpret: bool | None = None,
    unroll: int = 1,
    final_only: bool = False,
) -> jnp.ndarray:
    """[D, H, W, 2] -> [n_steps+1, D, H, W, 2] fused rollout (frame 0 = h0).

    Requires D % 8 == 0 and (H*W) % 128 == 0 (true for the 48^3 reference
    grid); other sizes use the jnp path.

    ``final_only=True`` returns just the final state [D, H, W, 2] without
    per-step HBM frame writes (~25% of the step cost at 48^3, round-5 probe
    runs/round5/bench3d_probe.jsonl); ``unroll`` fuses that many cell steps
    per grid iteration (amortises the grid/revisit overhead; 2 is the
    measured sweet spot).  n_steps must be divisible by unroll.
    """
    if cfg.kernel_size != 1 or cfg.n_branches != 3:
        raise NotImplementedError(
            "fused kernel supports kernel_size=1, n_branches=3 Pi cells")
    D, H, W = h0.shape[0], h0.shape[1], h0.shape[2]
    if D % 8 != 0 or (H * W) % 128 != 0:
        raise ValueError(f"grid {D}x{H}x{W} not tile-aligned for the fused 3D kernel")
    if n_steps % unroll != 0:
        raise ValueError(f"n_steps={n_steps} not divisible by unroll={unroll}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    packed = pack_pi_params_2d(params, cfg)
    state0 = jnp.moveaxis(h0.astype(jnp.float32), -1, 0).reshape(2, D, H * W)
    out = _fused_rollout3d_flat(
        packed, state0, cfg=cfg, n_steps=n_steps, D=D, H=H, W=W,
        interpret=interpret, unroll=unroll, final_only=final_only,
    )
    if final_only:
        return jnp.moveaxis(out.reshape(2, D, H, W), 0, -1)
    out = jnp.moveaxis(out.reshape(n_steps, 2, D, H, W), 1, -1)
    return jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
