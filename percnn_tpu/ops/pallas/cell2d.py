"""Fused 2D Pi-cell rollout kernel (the TPU performance core).

One `pallas_call` executes the ENTIRE T-step recurrence:

- grid = (T,): TPU Pallas grids run sequentially on a core, so VMEM scratch
  carries the state from step to step — the recurrent state never touches
  HBM during the rollout;
- halo-in-state layout: the field is stored padded to [Hp, Wp] (tile-aligned)
  with a 2-cell periodic halo.  All stencils in the cell are 5-point crosses
  (reference lap_2d_op, train_2drd.py:20-24), so corners are never read and
  halo refresh is 4 strip copies per step;
- the Pi-block's branch convs unroll to static VPU fused-multiply-adds over
  the [Hp, Wp] planes: 1x1 branches are 2 taps per hidden channel, k x k
  branches are k*k*2 shifted-plane taps (the same halo covers radius <= 2,
  with corners refreshed for full kernels);
- every frame is written to HBM through the output pipeline (double-buffered
  by Pallas) — the kernel streams [T, Hp, Wp, 2] while computing.

Equivalent math to `percnn_tpu.core.cell.pi_cell_step` for kernel_size
1/3/5 (LO forward C=4 k=1, GS 2D C=8 k=1, Burgers/LO Stage-1 C=16 k=5,
rcnn_Burgers...py:108-129,161-173); parity-tested against the jnp path.
"""

from __future__ import annotations

import functools
import os
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig, effective_diffusion

HALO = 2

# The k=5 C=16 kernels unroll ~5k shifted-plane FMAs per step; Mosaic's
# default 16MB scoped-VMEM stack is too small for their live temporaries.
# Single-field state + streamed IO leave most of the chip's VMEM free.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

MXU_FWD_ENABLED = os.environ.get("PERCNN_DISABLE_MXU", "") != "1"
"""Route k>1 rollouts through the im2col+dot_general kernel (the branch
convs run on the MXU instead of unrolled VPU FMAs).  Kill switch for
toolchains where the in-kernel dot misbehaves (env: PERCNN_DISABLE_MXU=1)."""


def mxu_fwd_fits_vmem(cfg: PiCellConfig, shape: tuple) -> bool:
    """The MXU forward holds the im2col stack + activation planes in VMEM
    scratch; large grids must fall back to the few-plane VPU kernel
    (mirrors `backward2d.pg_fits_vmem` for the k=1 pg path)."""
    hp, wp = padded_dims(shape[0], shape[1])
    planes = (2                                 # state scratch
              + _round_up(n_taps(cfg), 8)       # im2col stack
              + mxu_rows(cfg)                   # activation planes
              + 16)                             # double-buffered IO margin
    return planes * hp * wp * 4 <= 90 * 1024 ** 2


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


def _param_block(cfg: PiCellConfig) -> int:
    """Per-output-channel length of the packed parameter vector."""
    wsize = cfg.kernel_size ** 2 * cfg.channels * cfg.hidden
    return cfg.n_branches * (wsize + cfg.hidden) + cfg.hidden + 1


def pack_pi_params_2d(params: dict, cfg: PiCellConfig) -> jnp.ndarray:
    """Flatten cell params to one f32 vector for SMEM.

    Layout: [Du, Dv] then per output channel: per branch (w_i row-major
    (ki, kj, cin, c) — [2C] for kernel_size=1, [k*k*2C] for k x k — then
    b_i [C]), then w_out[C], b_out[1].  Diffusion reparametrisation
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


def n_taps(cfg: PiCellConfig) -> int:
    """im2col rows for the MXU branch-conv path: k*k taps x 2 channels + a
    ones row that folds the biases into the matmul."""
    return cfg.kernel_size ** 2 * 2 + 1


def mxu_rows(cfg: PiCellConfig) -> int:
    """Matmul M dimension: one row per (output eq, branch, hidden channel)."""
    return cfg.channels * cfg.n_branches * cfg.hidden


def pack_pi_matrix_2d(params: dict, cfg: PiCellConfig) -> jnp.ndarray:
    """Branch-conv weights as ONE [M, K] matmul operand (VMEM input).

    Row (o*nb + i)*C + c holds branch i of output o, hidden channel c:
    columns (ki*k + kj)*2 + cin are the conv taps (matching `_build_im2col`'s
    shifted-plane order) and column k*k*2 is the bias (multiplied by the
    ones row).  K is padded to a multiple of 8 with zeros so the scratch
    operand is tile-aligned.
    """
    k = cfg.kernel_size
    C = cfg.hidden
    nb = cfg.n_branches
    K = _round_up(n_taps(cfg), 8)
    blocks = []
    for o in range(cfg.channels):
        br = params["pi"][o]
        for i in range(nb):
            w = jnp.asarray(br[f"w{i}"], jnp.float32).reshape(k, k, 2, C)
            b = jnp.asarray(br[f"b{i}"], jnp.float32).reshape(C)
            m = jnp.moveaxis(w, -1, 0).reshape(C, k * k * 2)
            pad = jnp.zeros((C, K - k * k * 2 - 1), jnp.float32)
            blocks.append(jnp.concatenate([m, b[:, None], pad], axis=1))
    return jnp.concatenate(blocks, axis=0)


def _build_im2col(s_ref, up, vp, k: int, H: int, W: int, t):
    """Write the k*k x 2 shifted interiors of the padded state planes into
    the im2col scratch rows [*, 0:H, 0:W]; the ones row (bias) is written
    once at t == 0 (scratch persists across grid steps).  Columns outside
    [0:H, 0:W] hold junk — the matmul is pointwise in space, so junk
    columns only produce junk output columns, which are never read."""
    r_half = k // 2

    @pl.when(t == 0)
    def _():
        # zero everything once: the pad rows multiply ZERO weight columns,
        # but uninitialized junk can be NaN and NaN * 0 = NaN; then set the
        # bias (ones) row.  Data rows are overwritten every step.
        s_ref[:, :, :] = jnp.zeros_like(s_ref)
        s_ref[k * k * 2, :, :] = jnp.ones_like(s_ref[0, :, :])

    row = 0
    for ki in range(k):
        for kj in range(k):
            s_ref[row, 0:H, 0:W] = up[HALO + ki - r_half:HALO + ki - r_half + H,
                                      HALO + kj - r_half:HALO + kj - r_half + W]
            s_ref[row + 1, 0:H, 0:W] = vp[HALO + ki - r_half:HALO + ki - r_half + H,
                                          HALO + kj - r_half:HALO + kj - r_half + W]
            row += 2


def _pi_poly_from_y(y_ref, p, base: int, o: int, cfg: PiCellConfig,
                    H: int, W: int):
    """Pi-block output for eq `o` from the matmul activations y_ref
    ([M, Hp, Wp], rows as in pack_pi_matrix_2d; spatial positions [0:H, 0:W])."""
    C = cfg.hidden
    nb = cfg.n_branches
    wsize = cfg.kernel_size ** 2 * 2 * C
    stride = wsize + C
    acc = None
    for c in range(C):
        prod = None
        for i in range(nb):
            y = y_ref[(o * nb + i) * C + c, 0:H, 0:W]
            prod = y if prod is None else prod * y
        term = p[base + nb * stride + c] * prod
        acc = term if acc is None else acc + term
    return acc + p[base + nb * stride + C]


def _rollout_kernel_mxu(p_ref, wm_ref, init_ref, out_ref, su_ref, sv_ref,
                        s_ref, y_ref, *, cfg: PiCellConfig, H: int, W: int):
    """Forward rollout step with the branch convs on the MXU: im2col by
    halo-shifted slices + ONE [M, K] x [K, Hp, Wp] dot_general per step,
    replacing ~k*k*2*M VPU plane-FMAs (4800 for the Burgers cell)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    u = su_ref[:, :]
    v = sv_ref[:, :]
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    block = _param_block(cfg)
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    _build_im2col(s_ref, u, v, cfg.kernel_size, H, W, t)
    y_ref[:, :, :] = jax.lax.dot_general(
        wm_ref[:, :], s_ref[:, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pi_u = _pi_poly_from_y(y_ref, p_ref, 2, 0, cfg, H, W)
    pi_v = _pi_poly_from_y(y_ref, p_ref, 2 + block, 1, cfg, H, W)
    un = ui + cfg.dt * (p_ref[0] * lap_u + pi_u)
    vn = vi + cfg.dt * (p_ref[1] * lap_v + pi_v)
    _refresh_halos(su_ref, un, H, W)
    _refresh_halos(sv_ref, vn, H, W)
    out_ref[0, 0, :, :] = su_ref[:, :]
    out_ref[0, 1, :, :] = sv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_rollout_padded_mxu(packed, wmat, state0, *, cfg, n_steps, H, W,
                              interpret):
    hp, wp = state0.shape[1], state0.shape[2]
    K = _round_up(n_taps(cfg), 8)
    M = mxu_rows(cfg)
    kernel = functools.partial(_rollout_kernel_mxu, cfg=cfg, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, wp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, hp, wp), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, 2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((K, hp, wp), jnp.float32),
            pltpu.VMEM((M, hp, wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, wmat, state0)


def _check_fusable(cfg: PiCellConfig) -> None:
    """The fused kernels handle any odd Pi kernel whose radius fits in the
    2-cell in-state halo (1x1, 3x3, 5x5 — reference uses 1 and 5)."""
    if cfg.kernel_size % 2 == 0 or cfg.kernel_size // 2 > HALO:
        raise NotImplementedError(
            f"fused kernel supports odd kernel_size <= {2 * HALO + 1}, "
            f"got {cfg.kernel_size}")
    if cfg.channels != 2:
        raise NotImplementedError("fused kernel assumes 2 state channels (u, v)")


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


def _pi_poly(up, vp, p, base: int, cfg: PiCellConfig, H: int, W: int):
    """Unrolled Pi-block on PADDED planes: returns interior [H, W].

    Branch convs (k x k cross-correlation, torch Conv2d semantics) unroll
    to k*k*2 shifted-plane FMAs per hidden channel; the in-state halo
    (radius 2 >= k//2) with filled corners makes every shifted read valid."""
    k = cfg.kernel_size
    r = k // 2
    C = cfg.hidden
    wsize = k * k * 2 * C
    stride = wsize + C  # per-branch block (weights + bias)
    acc = None
    for c in range(C):
        prod = None
        for i in range(cfg.n_branches):
            off = base + i * stride
            y = None
            for ki in range(k):
                for kj in range(k):
                    tap = (ki * k + kj) * 2 * C
                    su = _interior(up, ki - r, kj - r, H, W)
                    sv = _interior(vp, ki - r, kj - r, H, W)
                    term = p[off + tap + c] * su + p[off + tap + C + c] * sv
                    y = term if y is None else y + term
            y = y + p[off + wsize + c]
            prod = y if prod is None else prod * y
        term = p[base + cfg.n_branches * stride + c] * prod
        acc = term if acc is None else acc + term
    return acc + p[base + cfg.n_branches * stride + C]


def _refresh_halos(ref, interior, H: int, W: int):
    """Write `interior` [H, W] into padded `ref` and refresh the periodic
    edge strips and corners (full k x k kernels read the corners; cross
    stencils never touch them)."""
    ref[HALO : HALO + H, HALO : HALO + W] = interior
    # row halos (top/bottom): copy opposite interior rows
    ref[0:HALO, HALO : HALO + W] = interior[H - HALO : H, :]
    ref[HALO + H : 2 * HALO + H, HALO : HALO + W] = interior[0:HALO, :]
    # column halos (left/right)
    ref[HALO : HALO + H, 0:HALO] = interior[:, W - HALO : W]
    ref[HALO : HALO + H, HALO + W : 2 * HALO + W] = interior[:, 0:HALO]
    # corners: diagonal-neighbour wrap
    ref[0:HALO, 0:HALO] = interior[H - HALO : H, W - HALO : W]
    ref[0:HALO, HALO + W : 2 * HALO + W] = interior[H - HALO : H, 0:HALO]
    ref[HALO + H : 2 * HALO + H, 0:HALO] = interior[0:HALO, W - HALO : W]
    ref[HALO + H : 2 * HALO + H, HALO + W : 2 * HALO + W] = interior[0:HALO, 0:HALO]


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
    # params: [Du, Dv, pi_u block, pi_v block]
    block = _param_block(cfg)
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    pi_u = _pi_poly(u, v, p_ref, 2, cfg, H, W)
    pi_v = _pi_poly(u, v, p_ref, 2 + block, cfg, H, W)
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
        compiler_params=_COMPILER_PARAMS,
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
    block = _param_block(cfg)
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    pi_u = _pi_poly(u, v, p_ref, 2, cfg, H, W)
    pi_v = _pi_poly(u, v, p_ref, 2 + block, cfg, H, W)
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
        compiler_params=_COMPILER_PARAMS,
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
    _check_fusable(cfg)
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
    throughput path (kernel_size 1/3/5 cells).  `interpret=None` auto-selects
    interpreter mode off-TPU so tests run on CPU.
    """
    _check_fusable(cfg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = h0.shape[0], h0.shape[1]
    packed = pack_pi_params_2d(params, cfg)
    state0 = pad_state_2d(h0.astype(jnp.float32))
    if cfg.kernel_size > 1 and MXU_FWD_ENABLED \
            and mxu_fwd_fits_vmem(cfg, (H, W)):
        wmat = pack_pi_matrix_2d(params, cfg)
        frames = _fused_rollout_padded_mxu(
            packed, wmat, state0, cfg=cfg, n_steps=n_steps, H=H, W=W,
            interpret=interpret)
    else:
        frames = _fused_rollout_padded(
            packed, state0, cfg=cfg, n_steps=n_steps, H=H, W=W,
            interpret=interpret)
    out = unpad_frames_2d(frames, H, W)
    return jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
