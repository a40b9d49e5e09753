"""Single-step fused kernel on a pre-haloed local block — the multi-chip
composition unit.

Under spatial decomposition each device holds a block of the global grid;
per time step the 2-cell halo is refreshed over ICI (`lax.ppermute`,
parallel/halo.py) and the local update is then purely device-local.  This
kernel is that local update fused into one pallas_call (stencil + Pi +
Euler on VPU), composing with `shard_map` exactly like the jnp valid-region
step — see `parallel.sharded.sharded_rollout_nd(impl='pallas')`.

Layout matches cell2d.py: channel-first [2, Hp, Wp], halo width 2, interior
at [2:2+h, 2:2+w]; cross stencils never read halo corners.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig
from percnn_tpu.ops.pallas.cell2d import (
    HALO,
    _check_fusable,
    _interior,
    _lap,
    _param_block,
    _pi_poly,
    _round_up,
    pack_pi_params_2d,
)


def _step_kernel(p_ref, x_ref, out_ref, *, cfg: PiCellConfig, h: int, w: int):
    u = x_ref[0, :, :]
    v = x_ref[1, :, :]
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    block = _param_block(cfg)
    lap_u = _lap(u, h, w, inv_dx2)
    lap_v = _lap(v, h, w, inv_dx2)
    ui = _interior(u, 0, 0, h, w)
    vi = _interior(v, 0, 0, h, w)
    # k x k Pi branches read the exchanged halo (corners are valid: the
    # sequential per-axis ICI exchange fills them with diagonal neighbours)
    pi_u = _pi_poly(u, v, p_ref, 2, cfg, h, w)
    pi_v = _pi_poly(u, v, p_ref, 2 + block, cfg, h, w)
    out_ref[0, 0:h, 0:w] = ui + cfg.dt * (p_ref[0] * lap_u + pi_u)
    out_ref[1, 0:h, 0:w] = vi + cfg.dt * (p_ref[1] * lap_v + pi_v)


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "interpret"))
def _pallas_step(packed, xp_cf, *, cfg, h, w, interpret):
    hp, wp = xp_cf.shape[1], xp_cf.shape[2]
    ho, wo = _round_up(h, 8), _round_up(w, 128)
    kernel = functools.partial(_step_kernel, cfg=cfg, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ho, wo), jnp.float32),
        interpret=interpret,
    )(packed, xp_cf)
    return out


def _pallas_step_haloed_impl(
    params: dict,
    xp: jnp.ndarray,
    cfg: PiCellConfig,
    *,
    packed=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    _check_fusable(cfg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = xp.shape[0] - 2 * HALO, xp.shape[1] - 2 * HALO
    hp, wp = _round_up(xp.shape[0], 8), _round_up(xp.shape[1], 128)
    if packed is None:
        packed = pack_pi_params_2d(params, cfg)
    xp_cf = jnp.moveaxis(xp.astype(jnp.float32), -1, 0)
    xp_cf = jnp.pad(xp_cf, ((0, 0), (0, hp - xp.shape[0]), (0, wp - xp.shape[1])))
    out = _pallas_step(packed, xp_cf, cfg=cfg, h=h, w=w, interpret=interpret)
    return jnp.moveaxis(out[:, 0:h, 0:w], 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_step_haloed(params: dict, xp: jnp.ndarray,
                       cfg: PiCellConfig) -> jnp.ndarray:
    """One Euler step on a haloed local block [h+4, w+4, 2] -> [h, w, 2].

    Trainable: the forward is the fused Pallas kernel; the VJP is the exact
    adjoint of the jnp valid-region step (core.cell.pi_cell_step_valid —
    same math, parity-tested), producing halo cotangents on ``xp`` whose
    transport back to neighbour devices is ppermute's automatic transpose
    in parallel/halo.py.  This is what makes
    `sharded_rollout_nd(impl='pallas')` usable inside a training graph
    (SURVEY §2.3: the periodic-pad layer lives in training,
    train_2drd.py:108-109)."""
    return _pallas_step_haloed_impl(params, xp, cfg)


def _step_fwd(params, xp, cfg):
    return _pallas_step_haloed_impl(params, xp, cfg), (params, xp)


def _step_bwd(cfg, res, g):
    from percnn_tpu.core.cell import pi_cell_step_valid

    params, xp = res
    _, vjp = jax.vjp(lambda p, x: pi_cell_step_valid(p, x, cfg), params, xp)
    return vjp(g)


pallas_step_haloed.defvjp(_step_fwd, _step_bwd)
