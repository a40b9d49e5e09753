"""Member-batched fused 2D rollout + BPTT kernels (ensemble training).

The single-instance kernels in cell2d.py / backward2d.py carry the state in
VMEM scratch across a (T,) grid; a `vmap` over them would fall back to a
serial loop of separate pallas_calls.  These variants add a leading MEMBER
grid dimension instead: grid = (M, T) walks members outer / time inner, so
K independent rollouts (distinct params + initial states) execute as ONE
pallas_call with zero per-member dispatch overhead and the state still
VMEM-resident per member.

These are the OPT-IN `bptt='batched'/'batched_pg'` modes of the ensemble
trainer (experiments/ensemble.py).  Its 'auto' default is a static
per-member loop of the single-member fused kernels inside one jit, which
measured faster (41 vs 64 ms at M=4, T=800, GS2D shape) — the (M, T)-grid
variants are kept because they scale to member counts where the unrolled
loop would bloat compile time.

Per-member parameters live in one [M, P] SMEM table indexed by
program_id(0); blocks of init/out stream per (m, t) through the normal
Pallas pipeline.  Math is identical to the single-member kernels
(same _lap/_pi_poly/_refresh_halos helpers) — parity-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig, pi_cell_step
from percnn_tpu.core.rollout import chunked_param_grads
from percnn_tpu.ops.pallas.cell2d import (
    HALO,
    _COMPILER_PARAMS,
    _check_fusable,
    _interior,
    _lap,
    _param_block,
    _refresh_halos,
    _pi_poly,
    pack_pi_params_2d,
    pad_state_2d,
    unpad_frames_2d,
)
from percnn_tpu.ops.pallas.backward2d import _pi_jacobian_T


class _ParamRow:
    """Adapter: expose row m of an [M, P] SMEM table with the flat-index
    protocol the shared kernel helpers use (p[i] -> scalar)."""

    def __init__(self, ref, m):
        self.ref = ref
        self.m = m

    def __getitem__(self, i):
        return self.ref[self.m, i]


def _rollout_kernel_b(p_ref, init_ref, out_ref, su_ref, sv_ref, *,
                      cfg: PiCellConfig, H: int, W: int):
    m = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, 0, :, :]
        sv_ref[:, :] = init_ref[0, 1, :, :]

    p = _ParamRow(p_ref, m)
    u = su_ref[:, :]
    v = sv_ref[:, :]
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    block = _param_block(cfg)
    lap_u = _lap(u, H, W, inv_dx2)
    lap_v = _lap(v, H, W, inv_dx2)
    ui = _interior(u, 0, 0, H, W)
    vi = _interior(v, 0, 0, H, W)
    pi_u = _pi_poly(u, v, p, 2, cfg, H, W)
    pi_v = _pi_poly(u, v, p, 2 + block, cfg, H, W)
    un = ui + cfg.dt * (p[0] * lap_u + pi_u)
    vn = vi + cfg.dt * (p[1] * lap_v + pi_v)
    _refresh_halos(su_ref, un, H, W)
    _refresh_halos(sv_ref, vn, H, W)
    out_ref[0, 0, 0, :, :] = su_ref[:, :]
    out_ref[0, 0, 1, :, :] = sv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_rollout_padded_b(packed, state0, *, cfg, n_steps, H, W, interpret):
    """packed [M, P], state0 [M, 2, Hp, Wp] -> frames [M, T, 2, Hp, Wp]."""
    M, hp, wp = state0.shape[0], state0.shape[2], state0.shape[3]
    kernel = functools.partial(_rollout_kernel_b, cfg=cfg, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(M, n_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, hp, wp), lambda m, t: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, hp, wp), lambda m, t: (m, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, n_steps, 2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, state0)


def _phase1_kernel_b(p_ref, frames_ref, fbar_ref, gins_ref, g0_ref,
                     sgu_ref, sgv_ref, sz_ref, *, cfg: PiCellConfig, H: int,
                     W: int, n_steps: int):
    m = pl.program_id(0)
    k = pl.program_id(1)  # index maps deliver t = T-1-k

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)

    p = _ParamRow(p_ref, m)
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    gu_in_i = _interior(sgu_ref[:, :], 0, 0, H, W) + fbar_ref[0, 0, 0, HALO:HALO + H, HALO:HALO + W]
    gv_in_i = _interior(sgv_ref[:, :], 0, 0, H, W) + fbar_ref[0, 0, 1, HALO:HALO + H, HALO:HALO + W]
    _refresh_halos(sgu_ref, gu_in_i, H, W)
    _refresh_halos(sgv_ref, gv_in_i, H, W)
    gins_ref[0, 0, 0, :, :] = sgu_ref[:, :]
    gins_ref[0, 0, 1, :, :] = sgv_ref[:, :]

    gu = sgu_ref[:, :]
    gv = sgv_ref[:, :]
    lap_gu = _lap(gu, H, W, inv_dx2)
    lap_gv = _lap(gv, H, W, inv_dx2)
    up = frames_ref[0, 0, 0, :, :]
    vp = frames_ref[0, 0, 1, :, :]
    jtu, jtv = _pi_jacobian_T(up, vp, gu_in_i, gv_in_i, p, cfg, H, W, sz_ref)
    gu_prev = gu_in_i + cfg.dt * (p[0] * lap_gu + jtu)
    gv_prev = gv_in_i + cfg.dt * (p[1] * lap_gv + jtv)
    _refresh_halos(sgu_ref, gu_prev, H, W)
    _refresh_halos(sgv_ref, gv_prev, H, W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, 0, :, :] = sgu_ref[:, :]
        g0_ref[0, 1, :, :] = sgv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1_b(packed, frames_pad, fbar_pad, *, cfg, n_steps, H, W,
                    interpret):
    """frames_pad/fbar_pad [M, T, 2, Hp, Wp] -> (g_ins same shape, g0 [M, 2, Hp, Wp])."""
    M, hp, wp = frames_pad.shape[0], frames_pad.shape[3], frames_pad.shape[4]
    kernel = functools.partial(_phase1_kernel_b, cfg=cfg, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda m, k: (m, n_steps - 1 - k, 0, 0, 0)
    gins, g0 = pl.pallas_call(
        kernel,
        grid=(M, n_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), lambda m, k: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, n_steps, 2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((M, 2, hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, frames_pad, fbar_pad)
    return gins, g0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_rollout_tp_2d_batched(params, h0, cfg: PiCellConfig, n_steps: int,
                                pgrad_chunk: int = 64):
    """Differentiable member-batched fused rollout.

    params: stacked cell params (leading member axis M on every leaf);
    h0: [M, H, W, 2].  Returns [M, n_steps+1, H, W, 2].  Forward and the
    sequential backward sweep run as single pallas_calls over an (M, T)
    grid; phase-2 parameter gradients are vmapped over members."""
    return _forward_b(params, h0, cfg, n_steps)[0]


def _forward_b(params, h0, cfg, n_steps):
    _check_fusable(cfg)
    interpret = jax.default_backend() != "tpu"
    M, H, W = h0.shape[0], h0.shape[1], h0.shape[2]
    packed = jax.vmap(lambda p: pack_pi_params_2d(p, cfg))(params)
    h0_pad = jax.vmap(pad_state_2d)(h0.astype(jnp.float32))
    frames_pad = _fused_rollout_padded_b(
        packed, h0_pad, cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret
    )
    out = jax.vmap(lambda f: unpad_frames_2d(f, H, W))(frames_pad)
    frames = jnp.concatenate([h0.astype(jnp.float32)[:, None], out], axis=1)
    return frames, (packed, h0_pad, frames_pad)


def _fused_tp_b_fwd(params, h0, cfg, n_steps, pgrad_chunk):
    frames, (packed, h0_pad, frames_pad) = _forward_b(params, h0, cfg, n_steps)
    return frames, (params, packed, h0_pad, frames_pad)


def _fused_tp_b_bwd(cfg, n_steps, pgrad_chunk, residuals, frames_bar):
    params, packed, h0_pad, frames_pad = residuals
    M, H, W = frames_bar.shape[0], frames_bar.shape[2], frames_bar.shape[3]
    interpret = jax.default_backend() != "tpu"
    hp, wp = h0_pad.shape[2], h0_pad.shape[3]

    fbar_pad = jnp.zeros((M, n_steps, 2, hp, wp), jnp.float32)
    fbar_pad = fbar_pad.at[:, :, :, HALO:HALO + H, HALO:HALO + W].set(
        jnp.moveaxis(frames_bar[:, 1:].astype(jnp.float32), -1, 2)
    )
    h_prev_pad = jnp.concatenate([h0_pad[:, None], frames_pad[:, :-1]], axis=1)

    gins_pad, g0_pad = _fused_phase1_b(
        packed, h_prev_pad, fbar_pad,
        cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0_pad[:, :, HALO:HALO + H, HALO:HALO + W], 1, -1)
              + frames_bar[:, 0])

    h_prev = jax.vmap(lambda f: unpad_frames_2d(f, H, W))(h_prev_pad)
    g_ins = jax.vmap(lambda f: unpad_frames_2d(f, H, W))(gins_pad)

    params_bar = jax.vmap(
        lambda p, hp_, gi: chunked_param_grads(
            lambda pp, h: pi_cell_step(pp, h, cfg), p, hp_, gi,
            n_steps, pgrad_chunk)
    )(params, h_prev, g_ins)
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_2d_batched.defvjp(_fused_tp_b_fwd, _fused_tp_b_bwd)


# ---------------------------------------------------------------------------
# Member-batched fully-fused backward (k=1): per-member parameter-gradient
# plane accumulators live in VMEM *scratch* (read-modify-write across the
# sequential time grid is only unambiguous there — accumulating into a
# revisited output block produced ~3e-3-wrong gradients on real TPU) and
# flush to the member's output slot at the last time step.  No XLA
# phase-2, no g_ins stream.
# ---------------------------------------------------------------------------

from percnn_tpu.ops.pallas.backward2d import (  # noqa: E402
    _pg_layout,
    _pg_step,
    _pg_unpack,
)


def _phase1_pg_kernel_b(p_ref, frames_ref, fbar_ref, g0_ref, acc_out_ref,
                        sgu_ref, sgv_ref, acc_ref, *, cfg: PiCellConfig,
                        H: int, W: int, n_steps: int):
    m = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)
        acc_ref[:, :, :] = jnp.zeros_like(acc_ref)

    def acc(a, plane):
        acc_ref[a] += plane

    _pg_step(_ParamRow(p_ref, m),
             frames_ref[0, 0, 0, :, :], frames_ref[0, 0, 1, :, :],
             fbar_ref[0, 0, 0, HALO:HALO + H, HALO:HALO + W],
             fbar_ref[0, 0, 1, HALO:HALO + H, HALO:HALO + W],
             sgu_ref, sgv_ref, acc, cfg=cfg, H=H, W=W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, 0, :, :] = sgu_ref[:, :]
        g0_ref[0, 1, :, :] = sgv_ref[:, :]
        acc_out_ref[0, :, :, :] = acc_ref[:, :, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1_pg_b(packed, frames_pad, fbar_pad, *, cfg, n_steps, H, W,
                       interpret):
    M, hp, wp = frames_pad.shape[0], frames_pad.shape[3], frames_pad.shape[4]
    A = _pg_layout(cfg)["A"]
    kernel = functools.partial(_phase1_pg_kernel_b, cfg=cfg, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda m, k: (m, n_steps - 1 - k, 0, 0, 0)
    g0, acc = pl.pallas_call(
        kernel,
        grid=(M, n_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, hp, wp), lambda m, k: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, H, W), lambda m, k: (m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, 2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((M, A, H, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((A, H, W), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, frames_pad, fbar_pad)
    return g0, acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_rollout_tp_2d_batched_pg(params, h0, cfg: PiCellConfig,
                                   n_steps: int):
    """Member-batched fully-fused rollout (2D k=1): forward + reverse sweep
    + per-member parameter gradients in two pallas_calls."""
    if cfg.ndim != 2 or cfg.kernel_size != 1:
        raise NotImplementedError(
            "batched pg path requires ndim=2, kernel_size=1 "
            f"(got ndim={cfg.ndim}, kernel_size={cfg.kernel_size})")
    return _forward_b(params, h0, cfg, n_steps)[0]


def _fused_tp_b_pg_fwd(params, h0, cfg, n_steps):
    frames, (packed, h0_pad, frames_pad) = _forward_b(params, h0, cfg, n_steps)
    return frames, (params, packed, h0_pad, frames_pad)


def _fused_tp_b_pg_bwd(cfg, n_steps, residuals, frames_bar):
    params, packed, h0_pad, frames_pad = residuals
    M, H, W = frames_bar.shape[0], frames_bar.shape[2], frames_bar.shape[3]
    interpret = jax.default_backend() != "tpu"
    hp, wp = h0_pad.shape[2], h0_pad.shape[3]

    fbar_pad = jnp.zeros((M, n_steps, 2, hp, wp), jnp.float32)
    fbar_pad = fbar_pad.at[:, :, :, HALO:HALO + H, HALO:HALO + W].set(
        jnp.moveaxis(frames_bar[:, 1:].astype(jnp.float32), -1, 2)
    )
    h_prev_pad = jnp.concatenate([h0_pad[:, None], frames_pad[:, :-1]], axis=1)

    g0_pad, acc = _fused_phase1_pg_b(
        packed, h_prev_pad, fbar_pad,
        cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0_pad[:, :, HALO:HALO + H, HALO:HALO + W], 1, -1)
              + frames_bar[:, 0])
    params_bar = jax.vmap(
        lambda a, p: _pg_unpack(a.sum(axis=(1, 2)), p, cfg)
    )(acc, params)
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_2d_batched_pg.defvjp(_fused_tp_b_pg_fwd, _fused_tp_b_pg_bwd)
