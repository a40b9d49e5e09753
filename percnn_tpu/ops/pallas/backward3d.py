"""Fused backward sweep + trainable rollout for the 3D Pi cell.

Same structure as backward2d.py but on the flat [D, H*W] layout of
cell3d.py: the periodic Laplacian is roll-based (self-adjoint, so the
transpose is itself), the Pi block is pointwise, and there are no halos to
maintain.  Phase-2 parameter gradients stay XLA-batched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from percnn_tpu.core.cell import PiCellConfig, pi_cell_step
from percnn_tpu.core.rollout import chunked_param_grads
from percnn_tpu.ops.pallas.cell3d import (
    _fused_rollout3d_flat,
    _lap3d_flat,
    pack_pi_expanded_3d,
    pack_pi_params_3d,
)


def _pi_jacobian_T_pointwise(ui, vi, gu, gv, p, C: int, blocks: tuple):
    """(J_Pi)^T for the POINTWISE (k=1) Pi block on full planes.

    For each output channel o with branch affine forms y_i = w_i0*u +
    w_i1*v + b_i:  d pi_o / du = sum_c wout[c] * sum_i w_i0[c] *
    prod_{j != i} y_j[c].  Returns (du_bar, dv_bar)."""
    du_acc = None
    dv_acc = None
    for base, g in zip(blocks, (gu, gv)):
        stride = 3 * C
        for c in range(C):
            ys = []
            w_u = []
            w_v = []
            for i in range(3):
                off = base + i * stride
                ys.append(p[off + c] * ui + p[off + C + c] * vi + p[off + 2 * C + c])
                w_u.append(p[off + c])
                w_v.append(p[off + C + c])
            p01 = ys[0] * ys[1]
            p02 = ys[0] * ys[2]
            p12 = ys[1] * ys[2]
            wo = p[base + 3 * stride + c]
            du = w_u[0] * p12 + w_u[1] * p02 + w_u[2] * p01
            dv = w_v[0] * p12 + w_v[1] * p02 + w_v[2] * p01
            t_u = wo * du * g
            t_v = wo * dv * g
            du_acc = t_u if du_acc is None else du_acc + t_u
            dv_acc = t_v if dv_acc is None else dv_acc + t_v
    return du_acc, dv_acc


def _phase1_kernel3d(p_ref, frames_ref, fbar_ref, gins_ref, g0_ref,
                     sgu_ref, sgv_ref, *, cfg: PiCellConfig, D: int, H: int,
                     W: int, n_steps: int):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)

    C = cfg.hidden
    block = 3 * (3 * C) + C + 1
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    gu_in = sgu_ref[:, :] + fbar_ref[0, 0, :, :]
    gv_in = sgv_ref[:, :] + fbar_ref[0, 1, :, :]
    gins_ref[0, 0, :, :] = gu_in
    gins_ref[0, 1, :, :] = gv_in

    lap_gu = _lap3d_flat(gu_in, D, H, W, inv_dx2)
    lap_gv = _lap3d_flat(gv_in, D, H, W, inv_dx2)
    ui = frames_ref[0, 0, :, :]
    vi = frames_ref[0, 1, :, :]
    jtu, jtv = _pi_jacobian_T_pointwise(ui, vi, gu_in, gv_in, p_ref, C,
                                        (2, 2 + block))
    sgu_ref[:, :] = gu_in + cfg.dt * (p_ref[0] * lap_gu + jtu)
    sgv_ref[:, :] = gv_in + cfg.dt * (p_ref[1] * lap_gv + jtv)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "D", "H", "W", "interpret"))
def _fused_phase1_3d(packed, frames_flat, fbar_flat, *, cfg, n_steps, D, H, W,
                     interpret):
    hw = H * W
    kernel = functools.partial(_phase1_kernel3d, cfg=cfg, D=D, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, D, hw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, D, hw), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, D, hw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, hw), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 2, D, hw), jnp.float32),
            jax.ShapeDtypeStruct((2, D, hw), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, hw), jnp.float32),
            pltpu.VMEM((D, hw), jnp.float32),
        ],
        interpret=interpret,
    )(packed, frames_flat, fbar_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_rollout_tp_3d(params, h0, cfg: PiCellConfig, n_steps: int,
                        pgrad_chunk: int = 16):
    """Differentiable fused 3D rollout: [D, H, W, 2] -> [n_steps+1, D, H, W, 2].

    Requires the cell3d tile-alignment (D%8==0, (H*W)%128==0)."""
    return _forward3d(params, h0, cfg, n_steps)[0]


def _forward3d(params, h0, cfg, n_steps):
    if cfg.kernel_size != 1 or cfg.n_branches != 3:
        raise NotImplementedError(
            "fused trainable rollout supports kernel_size=1, n_branches=3 Pi cells")
    D, H, W = h0.shape[0], h0.shape[1], h0.shape[2]
    if D % 8 != 0 or (H * W) % 128 != 0:
        raise ValueError(f"grid {D}x{H}x{W} not tile-aligned for the fused 3D kernel")
    interpret = jax.default_backend() != "tpu"
    packed = pack_pi_params_3d(params, cfg)
    state0 = jnp.moveaxis(h0.astype(jnp.float32), -1, 0).reshape(2, D, H * W)
    # forward runs the expanded-cubic fast path; `packed` (literal branch
    # form) is what the phase-1/phase-2 grad kernels consume
    frames_flat = _fused_rollout3d_flat(
        pack_pi_expanded_3d(params, cfg), state0, cfg=cfg, n_steps=n_steps,
        D=D, H=H, W=W, interpret=interpret, expanded=True,
    )
    out = jnp.moveaxis(frames_flat.reshape(n_steps, 2, D, H, W), 1, -1)
    frames = jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
    return frames, (packed, state0, frames_flat)


def _fused_tp3d_fwd(params, h0, cfg, n_steps, pgrad_chunk):
    frames, (packed, state0, frames_flat) = _forward3d(params, h0, cfg, n_steps)
    return frames, (params, packed, state0, frames_flat)


def _fused_tp3d_bwd(cfg, n_steps, pgrad_chunk, residuals, frames_bar):
    params, packed, state0, frames_flat = residuals
    D, H, W = frames_bar.shape[1], frames_bar.shape[2], frames_bar.shape[3]
    interpret = jax.default_backend() != "tpu"

    fbar_flat = jnp.moveaxis(frames_bar[1:].astype(jnp.float32), -1, 1) \
        .reshape(n_steps, 2, D, H * W)
    h_prev_flat = jnp.concatenate([state0[None], frames_flat[:-1]], axis=0)

    gins_flat, g0 = _fused_phase1_3d(
        packed, h_prev_flat, fbar_flat, cfg=cfg, n_steps=n_steps,
        D=D, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0.reshape(2, D, H, W), 0, -1) + frames_bar[0])

    h_prev = jnp.moveaxis(h_prev_flat.reshape(n_steps, 2, D, H, W), 1, -1)
    g_ins = jnp.moveaxis(gins_flat.reshape(n_steps, 2, D, H, W), 1, -1)

    params_bar = chunked_param_grads(
        lambda p, h: pi_cell_step(p, h, cfg), params, h_prev, g_ins,
        n_steps, pgrad_chunk)
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_3d.defvjp(_fused_tp3d_fwd, _fused_tp3d_bwd)


# ---------------------------------------------------------------------------
# Fully-fused 3D backward (pointwise Pi): parameter gradients accumulate in
# VMEM scratch planes during the reverse sweep — no XLA phase-2, no g_ins
# stream, full-f32 accumulation (the XLA pgrad einsums run bf16 multiplies
# by TPU default; see backward2d.py and examples/debug_pg.py).
# Layout/unpack are shared with 2D (_pg_layout/_pg_unpack): the packed
# per-branch order [w_u[C], w_v[C], b[C]] is identical.
# ---------------------------------------------------------------------------

from percnn_tpu.ops.pallas.backward2d import (  # noqa: E402
    _pg_accumulate_pi,
    _pg_layout,
    _pg_unpack,
)
from percnn_tpu.ops.pallas.cell2d import _COMPILER_PARAMS  # noqa: E402


def _pg_step3d_flat(p, ui, vi, fb_u, fb_v, sgu_ref, sgv_ref, acc, *,
                    cfg: PiCellConfig, D: int, H: int, W: int):
    """One reverse step on flat [D, H*W] planes with gradient accumulation."""
    lay = _pg_layout(cfg)
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    gu_in = sgu_ref[:, :] + fb_u
    gv_in = sgv_ref[:, :] + fb_v

    acc(lay["diff"] + 0, gu_in * _lap3d_flat(ui, D, H, W, inv_dx2))
    acc(lay["diff"] + 1, gv_in * _lap3d_flat(vi, D, H, W, inv_dx2))
    acc(lay["bout"] + 0, gu_in)
    acc(lay["bout"] + 1, gv_in)

    lap_gu = _lap3d_flat(gu_in, D, H, W, inv_dx2)
    lap_gv = _lap3d_flat(gv_in, D, H, W, inv_dx2)

    du_acc, dv_acc = _pg_accumulate_pi(p, ui, vi, gu_in, gv_in, acc, cfg=cfg)

    sgu_ref[:, :] = gu_in + cfg.dt * (p[0] * lap_gu + du_acc)
    sgv_ref[:, :] = gv_in + cfg.dt * (p[1] * lap_gv + dv_acc)


def _phase1_pg_kernel3d(p_ref, frames_ref, fbar_ref, g0_ref, acc_out_ref,
                        sgu_ref, sgv_ref, acc_ref, *, cfg: PiCellConfig,
                        D: int, H: int, W: int, n_steps: int):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)
        acc_ref[:, :, :] = jnp.zeros_like(acc_ref)

    def acc(a, plane):
        acc_ref[a] += plane

    _pg_step3d_flat(p_ref, frames_ref[0, 0, :, :], frames_ref[0, 1, :, :],
                    fbar_ref[0, 0, :, :], fbar_ref[0, 1, :, :],
                    sgu_ref, sgv_ref, acc, cfg=cfg, D=D, H=H, W=W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]
        acc_out_ref[:, :, :] = acc_ref[:, :, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "D", "H", "W", "interpret"))
def _fused_phase1_pg_3d(packed, frames_flat, fbar_flat, *, cfg, n_steps,
                        D, H, W, interpret):
    hw = H * W
    A = _pg_layout(cfg)["A"]
    kernel = functools.partial(_phase1_pg_kernel3d, cfg=cfg, D=D, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, D, hw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, D, hw), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, D, hw), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, D, hw), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, D, hw), jnp.float32),
            jax.ShapeDtypeStruct((A, D, hw), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, hw), jnp.float32),
            pltpu.VMEM((D, hw), jnp.float32),
            pltpu.VMEM((A, D, hw), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, frames_flat, fbar_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_rollout_tp_3d_pg(params, h0, cfg: PiCellConfig, n_steps: int):
    """Fully-fused differentiable 3D rollout (pointwise Pi): forward,
    reverse sweep AND parameter gradients in two pallas_calls."""
    if cfg.ndim != 3 or cfg.kernel_size != 1 or cfg.n_branches != 3:
        raise NotImplementedError(
            "fused_rollout_tp_3d_pg requires ndim=3, kernel_size=1, "
            f"n_branches=3 (got ndim={cfg.ndim}, "
            f"kernel_size={cfg.kernel_size}, n_branches={cfg.n_branches})")
    return _forward3d(params, h0, cfg, n_steps)[0]


def _fused_tp3d_pg_fwd(params, h0, cfg, n_steps):
    frames, (packed, state0, frames_flat) = _forward3d(params, h0, cfg, n_steps)
    return frames, (params, packed, state0, frames_flat)


def _fused_tp3d_pg_bwd(cfg, n_steps, residuals, frames_bar):
    params, packed, state0, frames_flat = residuals
    D, H, W = frames_bar.shape[1], frames_bar.shape[2], frames_bar.shape[3]
    interpret = jax.default_backend() != "tpu"

    fbar_flat = jnp.moveaxis(frames_bar[1:].astype(jnp.float32), -1, 1) \
        .reshape(n_steps, 2, D, H * W)
    h_prev_flat = jnp.concatenate([state0[None], frames_flat[:-1]], axis=0)

    g0, acc = _fused_phase1_pg_3d(
        packed, h_prev_flat, fbar_flat, cfg=cfg, n_steps=n_steps,
        D=D, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0.reshape(2, D, H, W), 0, -1) + frames_bar[0])
    params_bar = _pg_unpack(acc.sum(axis=(1, 2)), params, cfg)
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_3d_pg.defvjp(_fused_tp3d_pg_fwd, _fused_tp3d_pg_bwd)
