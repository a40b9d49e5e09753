"""Fused 2D Pi-cell rollout kernel (the TPU performance core).

One `pallas_call` executes the ENTIRE T-step recurrence:

- grid = (T,): TPU Pallas grids run sequentially on a core, so VMEM scratch
  carries the state from step to step — the recurrent state never touches
  HBM during the rollout;
- halo-in-state layout: the field is stored padded to [Hp, Wp] (tile-aligned)
  with a 2-cell periodic halo.  All stencils in the cell are 5-point crosses
  (reference lap_2d_op, train_2drd.py:20-24), so corners are never read and
  halo refresh is 4 strip copies per step;
- the Pi-block's 1x1 branches unroll to static VPU fused-multiply-adds over
  the [Hp, Wp] planes (hidden C is small and static);
- every frame is written to HBM through the output pipeline (double-buffered
  by Pallas) — the kernel streams [T, Hp, Wp, 2] while computing.

Equivalent math to `percnn_tpu.core.cell.pi_cell_step` (kernel_size=1
variants: LO forward C=4, GS 2D C=8); parity-tested against the jnp path.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig, effective_diffusion

HALO = 2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_dims(h: int, w: int) -> tuple[int, int]:
    """Tile-aligned padded dims: sublanes to 8, lanes to 128."""
    return _round_up(h + 2 * HALO, 8), _round_up(w + 2 * HALO, 128)


def pad_state_2d(h0: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 2] -> [2, Hp, Wp] (channel-first: lanes = W, sublanes = H)
    with periodic halos at [2:H+2, 2:W+2]."""
    H, W = h0.shape[0], h0.shape[1]
    hp, wp = padded_dims(H, W)
    wrapped = jnp.pad(h0, ((HALO, HALO), (HALO, HALO), (0, 0)), mode="wrap")
    full = jnp.pad(wrapped, ((0, hp - H - 2 * HALO), (0, wp - W - 2 * HALO), (0, 0)))
    return jnp.moveaxis(full, -1, 0)


def unpad_frames_2d(frames: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[T, 2, Hp, Wp] -> [T, H, W, 2]."""
    return jnp.moveaxis(frames[:, :, HALO : HALO + H, HALO : HALO + W], 1, -1)


def pack_pi_params_2d(params: dict, cfg: PiCellConfig) -> jnp.ndarray:
    """Flatten cell params to one f32 vector for SMEM.

    Layout: [Du, Dv] then per output channel: (w0[2C], b0[C], w1[2C], b1[C],
    w2[2C], b2[C], w_out[C], b_out[1]).  Diffusion reparametrisation
    (mu_up*sigmoid) is applied here so the kernel sees plain coefficients.
    """
    parts = [effective_diffusion(params, cfg).reshape(-1)]
    for c in range(cfg.channels):
        br = params["pi"][c]
        for i in range(cfg.n_branches):
            parts.append(br[f"w{i}"].reshape(-1))  # [2, C] row-major
            parts.append(br[f"b{i}"].reshape(-1))
        parts.append(br["w_out"].reshape(-1))
        parts.append(br["b_out"].reshape(-1))
    return jnp.concatenate([p.astype(jnp.float32) for p in parts])


def _interior(x, di: int, dj: int, H: int, W: int):
    """Shifted interior slice of a padded plane: x[2+di : 2+di+H, ...]."""
    return x[HALO + di : HALO + di + H, HALO + dj : HALO + dj + W]


def _lap(x, H: int, W: int, inv_dx2: float):
    c = _interior(x, 0, 0, H, W)
    s1 = (_interior(x, 1, 0, H, W) + _interior(x, -1, 0, H, W)
          + _interior(x, 0, 1, H, W) + _interior(x, 0, -1, H, W))
    s2 = (_interior(x, 2, 0, H, W) + _interior(x, -2, 0, H, W)
          + _interior(x, 0, 2, H, W) + _interior(x, 0, -2, H, W))
    return (-5.0 * c + (4.0 / 3.0) * s1 - (1.0 / 12.0) * s2) * inv_dx2


def _pi_poly(u, v, p, base: int, C: int):
    """Unrolled Pi-block on interior planes: returns [H, W]."""
    # branch weights at p[base + ...]: w_i is [2, C] row-major
    acc = None
    stride = 3 * C  # per-branch block size (2C weights + C bias)
    for c in range(C):
        prod = None
        for i in range(3):
            off = base + i * stride
            y = p[off + c] * u + p[off + C + c] * v + p[off + 2 * C + c]
            prod = y if prod is None else prod * y
        term = p[base + 3 * stride + c] * prod
        acc = term if acc is None else acc + term
    return acc + p[base + 3 * stride + C]


def _refresh_halos(ref, interior, H: int, W: int):
    """Write `interior` [H, W] into padded `ref` and refresh the periodic
    edge strips (corners unused by cross stencils)."""
    ref[HALO : HALO + H, HALO : HALO + W] = interior
    # row halos (top/bottom): copy opposite interior rows
    ref[0:HALO, HALO : HALO + W] = interior[H - HALO : H, :]
    ref[HALO + H : 2 * HALO + H, HALO : HALO + W] = interior[0:HALO, :]
    # column halos (left/right)
    ref[HALO : HALO + H, 0:HALO] = interior[:, W - HALO : W]
    ref[HALO : HALO + H, HALO + W : 2 * HALO + W] = interior[:, 0:HALO]


def _rollout_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *, cfg: PiCellConfig,
                    H: int, W: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    u = su_ref[:, :]
    v = sv_ref[:, :]
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    C = cfg.hidden
    # params: [Du, Dv, pi_u block, pi_v block]
    block = 3 * (3 * C) + C + 1
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    pi_u = _pi_poly(ui, vi, p_ref, 2, C)
    pi_v = _pi_poly(ui, vi, p_ref, 2 + block, C)
    un = ui + cfg.dt * (p_ref[0] * lap_u + pi_u)
    vn = vi + cfg.dt * (p_ref[1] * lap_v + pi_v)
    _refresh_halos(su_ref, un, H, W)
    _refresh_halos(sv_ref, vn, H, W)
    out_ref[0, 0, :, :] = su_ref[:, :]
    out_ref[0, 1, :, :] = sv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_rollout_padded(packed, state0, *, cfg, n_steps, H, W, interpret):
    hp, wp = state0.shape[1], state0.shape[2]
    kernel = functools.partial(_rollout_kernel, cfg=cfg, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, hp, wp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, hp, wp), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, 2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(packed, state0)


def _final_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *, cfg: PiCellConfig,
                  H: int, W: int):
    """Like _rollout_kernel but only the final state leaves the chip —
    the output block's index map pins one buffer, so per-step HBM traffic
    is zero (pure-compute roofline / final-state inference)."""
    t = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    u = su_ref[:, :]
    v = sv_ref[:, :]
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    C = cfg.hidden
    block = 3 * (3 * C) + C + 1
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    pi_u = _pi_poly(ui, vi, p_ref, 2, C)
    pi_v = _pi_poly(ui, vi, p_ref, 2 + block, C)
    un = ui + cfg.dt * (p_ref[0] * lap_u + pi_u)
    vn = vi + cfg.dt * (p_ref[1] * lap_v + pi_v)
    _refresh_halos(su_ref, un, H, W)
    _refresh_halos(sv_ref, vn, H, W)

    @pl.when(t == n - 1)
    def _():
        out_ref[0, :, :] = su_ref[:, :]
        out_ref[1, :, :] = sv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_final_padded(packed, state0, *, cfg, n_steps, H, W, interpret):
    hp, wp = state0.shape[1], state0.shape[2]
    kernel = functools.partial(_final_kernel, cfg=cfg, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, hp, wp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, hp, wp), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(packed, state0)


def fused_rollout_final_2d(
    params: dict,
    h0: jnp.ndarray,
    cfg: PiCellConfig,
    n_steps: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Final state only: [H, W, 2] -> [H, W, 2] after n_steps (no frame
    streaming — the fastest inference path)."""
    if cfg.kernel_size != 1 or cfg.n_branches != 3:
        raise NotImplementedError(
            "fused kernel supports kernel_size=1, n_branches=3 Pi cells")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = h0.shape[0], h0.shape[1]
    packed = pack_pi_params_2d(params, cfg)
    state0 = pad_state_2d(h0.astype(jnp.float32))
    out = _fused_final_padded(packed, state0, cfg=cfg, n_steps=n_steps,
                              H=H, W=W, interpret=interpret)
    return jnp.moveaxis(out[:, HALO:HALO + H, HALO:HALO + W], 0, -1)


def fused_rollout_2d(
    params: dict,
    h0: jnp.ndarray,
    cfg: PiCellConfig,
    n_steps: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Full fused rollout: [H, W, 2] -> [n_steps+1, H, W, 2] (frame 0 = h0).

    Drop-in replacement for `rollout(pi_cell_step, ...)` on the inference /
    throughput path (kernel_size=1 cells).  `interpret=None` auto-selects
    interpreter mode off-TPU so tests run on CPU.
    """
    if cfg.kernel_size != 1 or cfg.n_branches != 3:
        raise NotImplementedError(
            "fused kernel supports kernel_size=1, n_branches=3 Pi cells")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = h0.shape[0], h0.shape[1]
    packed = pack_pi_params_2d(params, cfg)
    state0 = pad_state_2d(h0.astype(jnp.float32))
    frames = _fused_rollout_padded(
        packed, state0, cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret
    )
    out = unpad_frames_2d(frames, H, W)
    return jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
