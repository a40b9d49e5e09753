"""Fused backward (phase-1) kernel for the 2D Pi-cell rollout + the
fully-fused trainable rollout.

BPTT structure (core/rollout.py rollout_tp): the sequential part of the
backward is the reverse state-cotangent sweep
    g_t = g_in + dt * ( D * Lap(g_in) + J_Pi(h_t)^T g_in ),
    g_in = g_{t+1} + frames_bar[t+1]
(the 4th-order periodic Laplacian is self-adjoint, so its transpose is
itself).  This kernel runs that sweep as ONE pallas_call: the grid walks
time in reverse (the input index maps read frames/frames_bar back-to-front),
the adjoint state lives in VMEM scratch with the same halo-in-state layout
as the forward kernel, and the per-step g_in fields are streamed out for
the parallel phase-2 parameter-gradient computation (which stays jnp/XLA —
it is a batched-over-time reduction that XLA fuses well).

`fused_rollout_tp_2d` glues forward kernel + this backward + phase 2 into a
custom-VJP rollout that is exact (parity-tested against autodiff).
"""

from __future__ import annotations

import functools
import os

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
    pack_pi_params_2d,
    pad_state_2d,
    padded_dims,
    unpad_frames_2d,
    _fused_rollout_padded,
)


def _pi_jacobian_T(up, vp, gu, gv, p, cfg: PiCellConfig, H: int, W: int,
                   sz_ref):
    """(J_Pi)^T applied to (gu, gv); returns interior (du_bar, dv_bar).

    up/vp are PADDED state planes (valid halo incl. corners), gu/gv interior
    cotangents.  For each output o, hidden channel c and branch i with
    y_{i,c} = conv_k(w_i)(u, v) + b_i, the adjoint of the branch conv is the
    correlation with REVERSED taps applied to
        z = w_out[c] * g_o * prod_{j != i} y_{j,c}.
    z is only known on the interior; since the fields are periodic, z's halo
    equals the wrapped interior, so it is refreshed into `sz_ref` and read
    back with reversed shifts (k=1 needs no shift and skips the scratch)."""
    k = cfg.kernel_size
    r = k // 2
    C = cfg.hidden
    nb = cfg.n_branches
    wsize = k * k * 2 * C
    stride = wsize + C
    block = _param_block(cfg)

    if k == 1:
        # pointwise fast path: fully unrolled (small body, no scratch)
        du_acc = None
        dv_acc = None
        for base, g in zip((2, 2 + block), (gu, gv)):
            for c in range(C):
                ys = []
                for i in range(nb):
                    off = base + i * stride
                    ys.append(p[off + c] * _interior(up, 0, 0, H, W)
                              + p[off + C + c] * _interior(vp, 0, 0, H, W)
                              + p[off + wsize + c])
                wo = p[base + nb * stride + c]
                for i in range(nb):
                    pexc = None
                    for j in range(nb):
                        if j != i:
                            pexc = ys[j] if pexc is None else pexc * ys[j]
                    z = wo * g if pexc is None else wo * g * pexc
                    off = base + i * stride
                    du = p[off + c] * z
                    dv = p[off + C + c] * z
                    du_acc = du if du_acc is None else du_acc + du
                    dv_acc = dv if dv_acc is None else dv_acc + dv
        return du_acc, dv_acc

    # k > 1: fori_loop over (output o, hidden channel c) with dynamic SMEM
    # weight reads — keeps the unrolled body ~50 taps instead of ~5000, or
    # Mosaic's register allocator drowns in spill slots (C=16 k=5 needed
    # 169M of spill VMEM fully unrolled).
    def oc_body(idx, accs):
        du_acc, dv_acc = accs
        o = idx // C
        c = idx % C
        base = 2 + o * block
        g = jnp.where(o == 0, gu, gv)
        ys = []
        for i in range(nb):
            off = base + i * stride
            y = None
            for ki in range(k):
                for kj in range(k):
                    tap = (ki * k + kj) * 2 * C
                    term = (p[off + tap + c] * _interior(up, ki - r, kj - r, H, W)
                            + p[off + tap + C + c] * _interior(vp, ki - r, kj - r, H, W))
                    y = term if y is None else y + term
            ys.append(y + p[off + wsize + c])
        wo = p[base + nb * stride + c]
        for i in range(nb):
            pexc = None
            for j in range(nb):
                if j != i:
                    pexc = ys[j] if pexc is None else pexc * ys[j]
            z = wo * g if pexc is None else wo * g * pexc
            _refresh_halos(sz_ref, z, H, W)
            zp = sz_ref[:, :]
            off = base + i * stride
            for ki in range(k):
                for kj in range(k):
                    tap = (ki * k + kj) * 2 * C
                    sz = _interior(zp, r - ki, r - kj, H, W)
                    du_acc = du_acc + p[off + tap + c] * sz
                    dv_acc = dv_acc + p[off + tap + C + c] * sz
        return du_acc, dv_acc

    zero = jnp.zeros((H, W), jnp.float32)
    return jax.lax.fori_loop(0, 2 * C, oc_body, (zero, zero))


def _pi_jacobian_T_ys(ys_ref, gu, gv, p, cfg: PiCellConfig, H: int, W: int,
                      sz_ref):
    """(J_Pi)^T from PRECOMPUTED branch activations (k>1 fast path).

    Identical math to `_pi_jacobian_T`, but the per-(eq, branch, channel)
    activations y come from `ys_ref` — a [G, H, W] block (G = 2*nb*C,
    plane index (o*nb + i)*C + c) computed OUTSIDE the sequential sweep by
    time-batched XLA convs (see `_precompute_ys`).  This halves the VPU
    work of the reverse step: only the adjoint correlation (which is
    irreducibly sequential) remains in-kernel."""
    k = cfg.kernel_size
    r = k // 2
    C = cfg.hidden
    nb = cfg.n_branches
    wsize = k * k * 2 * C
    stride = wsize + C
    block = _param_block(cfg)

    def oc_body(idx, accs):
        du_acc, dv_acc = accs
        o = idx // C
        c = idx % C
        base = 2 + o * block
        g = jnp.where(o == 0, gu, gv)
        ys = [ys_ref[0, (o * nb + i) * C + c, :, :] for i in range(nb)]
        wo = p[base + nb * stride + c]
        for i in range(nb):
            pexc = None
            for j in range(nb):
                if j != i:
                    pexc = ys[j] if pexc is None else pexc * ys[j]
            z = wo * g if pexc is None else wo * g * pexc
            _refresh_halos(sz_ref, z, H, W)
            zp = sz_ref[:, :]
            off = base + i * stride
            for ki in range(k):
                for kj in range(k):
                    tap = (ki * k + kj) * 2 * C
                    sz = _interior(zp, r - ki, r - kj, H, W)
                    du_acc = du_acc + p[off + tap + c] * sz
                    dv_acc = dv_acc + p[off + tap + C + c] * sz
        return du_acc, dv_acc

    zero = jnp.zeros((H, W), jnp.float32)
    return jax.lax.fori_loop(0, 2 * C, oc_body, (zero, zero))


def _phase1_kernel(p_ref, frames_ref, fbar_ref, gins_ref, g0_ref,
                   sgu_ref, sgv_ref, sz_ref, *, cfg: PiCellConfig, H: int,
                   W: int, n_steps: int):
    k = pl.program_id(0)  # walks 0..T-1; index maps deliver t = T-1-k

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)

    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    # g_in = g + frames_bar[t+1]  (interior values; halos refreshed below)
    gu_in_i = _interior(sgu_ref[:, :], 0, 0, H, W) + fbar_ref[0, 0, HALO:HALO + H, HALO:HALO + W]
    gv_in_i = _interior(sgv_ref[:, :], 0, 0, H, W) + fbar_ref[0, 1, HALO:HALO + H, HALO:HALO + W]
    # write g_in for phase 2 (interior only matters; halos streamed too)
    _refresh_halos(sgu_ref, gu_in_i, H, W)
    _refresh_halos(sgv_ref, gv_in_i, H, W)
    gins_ref[0, 0, :, :] = sgu_ref[:, :]
    gins_ref[0, 1, :, :] = sgv_ref[:, :]

    gu = sgu_ref[:, :]
    gv = sgv_ref[:, :]
    lap_gu = _lap(gu, H, W, inv_dx2)
    lap_gv = _lap(gv, H, W, inv_dx2)
    up = frames_ref[0, 0, :, :]
    vp = frames_ref[0, 1, :, :]
    jtu, jtv = _pi_jacobian_T(up, vp, gu_in_i, gv_in_i, p_ref, cfg, H, W,
                              sz_ref)
    gu_prev = gu_in_i + cfg.dt * (p_ref[0] * lap_gu + jtu)
    gv_prev = gv_in_i + cfg.dt * (p_ref[1] * lap_gv + jtv)
    _refresh_halos(sgu_ref, gu_prev, H, W)
    _refresh_halos(sgv_ref, gv_prev, H, W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1(packed, frames_pad, fbar_pad, *, cfg, n_steps, H, W, interpret):
    """frames_pad: [T, 2, Hp, Wp] (states h_1..h_T as written by the forward
    kernel; h_t for step t is frames_pad[t-1], with h_0 handled by caller);
    fbar_pad: [T, 2, Hp, Wp] = cotangents for frames 1..T.
    Returns (g_ins [T, 2, Hp, Wp] reversed-to-forward order, g0 [2, Hp, Wp])."""
    hp, wp = frames_pad.shape[2], frames_pad.shape[3]
    kernel = functools.partial(_phase1_kernel, cfg=cfg, H=H, W=W, n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    gins, g0 = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, wp), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),  # z plane for k>1 adjoint convs
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, frames_pad, fbar_pad)
    return gins, g0


def _phase1_ys_kernel(p_ref, frames_ref, fbar_ref, ys_ref, gins_ref, g0_ref,
                      sgu_ref, sgv_ref, sz_ref, *, cfg: PiCellConfig, H: int,
                      W: int, n_steps: int):
    """Reverse sweep with hoisted branch activations (k>1)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)

    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    gu_in_i = _interior(sgu_ref[:, :], 0, 0, H, W) + fbar_ref[0, 0, HALO:HALO + H, HALO:HALO + W]
    gv_in_i = _interior(sgv_ref[:, :], 0, 0, H, W) + fbar_ref[0, 1, HALO:HALO + H, HALO:HALO + W]
    _refresh_halos(sgu_ref, gu_in_i, H, W)
    _refresh_halos(sgv_ref, gv_in_i, H, W)
    gins_ref[0, 0, :, :] = sgu_ref[:, :]
    gins_ref[0, 1, :, :] = sgv_ref[:, :]

    lap_gu = _lap(sgu_ref[:, :], H, W, inv_dx2)
    lap_gv = _lap(sgv_ref[:, :], H, W, inv_dx2)
    jtu, jtv = _pi_jacobian_T_ys(ys_ref, gu_in_i, gv_in_i, p_ref, cfg, H, W,
                                 sz_ref)
    gu_prev = gu_in_i + cfg.dt * (p_ref[0] * lap_gu + jtu)
    gv_prev = gv_in_i + cfg.dt * (p_ref[1] * lap_gv + jtv)
    _refresh_halos(sgu_ref, gu_prev, H, W)
    _refresh_halos(sgv_ref, gv_prev, H, W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1_ys(packed, frames_pad, fbar_pad, ys_flat, *, cfg, n_steps,
                     H, W, interpret):
    """Like `_fused_phase1` but branch activations stream in precomputed
    (`ys_flat`: [T, G, H, W], G = 2*nb*C)."""
    hp, wp = frames_pad.shape[2], frames_pad.shape[3]
    G = ys_flat.shape[1]
    kernel = functools.partial(_phase1_ys_kernel, cfg=cfg, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    gins, g0 = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, H, W), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, wp), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, frames_pad, fbar_pad, ys_flat)
    return gins, g0


MXU_BWD_ENABLED = os.environ.get("PERCNN_DISABLE_MXU", "") != "1"
"""Route the k>1 reverse sweep through the im2col+dot_general kernel
(branch activations AND the adjoint correlation as MXU matmuls, activations
streamed out for the phase-2 parameter gradients).  Env kill switch:
PERCNN_DISABLE_MXU=1."""


def mxu_bwd_fits_vmem(cfg: PiCellConfig, H: int, W: int) -> bool:
    """The MXU reverse sweep holds im2col + activation + cotangent-product
    + adjoint planes in VMEM scratch and double-buffers an M-plane ys
    output block; larger grids fall back to the hoisted-ys VPU kernel."""
    from percnn_tpu.ops.pallas.cell2d import (
        _round_up, mxu_rows, n_taps, padded_dims,
    )

    hp, wp = padded_dims(H, W)
    M = mxu_rows(cfg)
    planes = (2                                  # adjoint state
              + _round_up(n_taps(cfg), 8)        # im2col stack
              + 2 * M                            # y + z planes
              + _round_up(cfg.kernel_size ** 2 * 2, 8)  # zw
              + 2 * M + 16)                      # ys out buffers + IO margin
    return planes * hp * wp * 4 <= 90 * 1024 ** 2


def pack_adjoint_matrix_2d(wmat: jnp.ndarray, cfg: PiCellConfig) -> jnp.ndarray:
    """Adjoint matmul operand [K2, M] from the forward one ([M, K]):
    row 2*tap + cin of the transpose of wmat's tap columns (bias dropped —
    biases don't enter the Jacobian), zero-padded to a multiple of 8."""
    from percnn_tpu.ops.pallas.cell2d import _round_up

    taps = cfg.kernel_size ** 2 * 2
    w2 = wmat[:, :taps].T
    pad = _round_up(taps, 8) - taps
    return jnp.pad(w2, ((0, pad), (0, 0)))


def _phase1_mxu_kernel(p_ref, wm_ref, w2_ref, frames_ref, fbar_ref,
                       gins_ref, g0_ref, ys_ref,
                       sgu_ref, sgv_ref, s_ref, y_ref, z_ref, zw_ref, *,
                       cfg: PiCellConfig, H: int, W: int, n_steps: int):
    """Reverse sweep with BOTH heavy contractions on the MXU:

      y   = Wm @ im2col(h_t)            (branch activations, as forward)
      zw  = W2 @ z                      (adjoint pre-shift contraction)
      jt  = sum_tap shift_tap(zw[tap])  (shift-after-matmul accumulation)

    where z[(o,i,c)] = w_out[c] * g_o * prod_{j != i} y_{(o,j,c)}.  The
    shift-after-matmul ordering works because the matmul is pointwise in
    space; zw rows get their periodic halos refreshed before the shifted
    reads.  y is streamed out for the phase-2 parameter gradients (zero
    extra compute — it exists anyway)."""
    from percnn_tpu.ops.pallas.cell2d import _build_im2col

    k = pl.program_id(0)
    kk = cfg.kernel_size
    r = kk // 2
    C = cfg.hidden
    nb = cfg.n_branches
    wsize = kk * kk * 2 * C
    stride = wsize + C
    block = _param_block(cfg)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)
        z_ref[:, :, :] = jnp.zeros_like(z_ref)

    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    gu_in_i = _interior(sgu_ref[:, :], 0, 0, H, W) + fbar_ref[0, 0, HALO:HALO + H, HALO:HALO + W]
    gv_in_i = _interior(sgv_ref[:, :], 0, 0, H, W) + fbar_ref[0, 1, HALO:HALO + H, HALO:HALO + W]
    _refresh_halos(sgu_ref, gu_in_i, H, W)
    _refresh_halos(sgv_ref, gv_in_i, H, W)
    gins_ref[0, 0, :, :] = sgu_ref[:, :]
    gins_ref[0, 1, :, :] = sgv_ref[:, :]

    lap_gu = _lap(sgu_ref[:, :], H, W, inv_dx2)
    lap_gv = _lap(sgv_ref[:, :], H, W, inv_dx2)

    # branch activations on the MXU (same as the forward kernel)
    _build_im2col(s_ref, frames_ref[0, 0, :, :], frames_ref[0, 1, :, :],
                  kk, H, W, k)
    y_ref[:, :, :] = jax.lax.dot_general(
        wm_ref[:, :], s_ref[:, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ys_ref[0, :, :, :] = y_ref[:, :, :]

    # z rows (VPU): w_out[c] * g_o * product of the OTHER branches
    for o in range(cfg.channels):
        base = 2 + o * block
        g = gu_in_i if o == 0 else gv_in_i
        for c in range(C):
            ys = [y_ref[(o * nb + i) * C + c, 0:H, 0:W] for i in range(nb)]
            t0 = p_ref[base + nb * stride + c] * g
            for i in range(nb):
                pexc = None
                for j in range(nb):
                    if j != i:
                        pexc = ys[j] if pexc is None else pexc * ys[j]
                zi = t0 if pexc is None else t0 * pexc
                z_ref[(o * nb + i) * C + c, HALO:HALO + H, HALO:HALO + W] = zi

    # adjoint contraction on the MXU, then shift-accumulate
    zw_ref[:, :, :] = jax.lax.dot_general(
        w2_ref[:, :], z_ref[:, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = None
    dv = None
    for ki in range(kk):
        for kj in range(kk):
            tap = ki * kk + kj
            # refresh this row's halos, then read at the REVERSED shift
            for cin in range(2):
                row = 2 * tap + cin
                _refresh_halos(zw_ref.at[row],
                               _interior(zw_ref[row], 0, 0, H, W), H, W)
            su = _interior(zw_ref[2 * tap], r - ki, r - kj, H, W)
            sv = _interior(zw_ref[2 * tap + 1], r - ki, r - kj, H, W)
            du = su if du is None else du + su
            dv = sv if dv is None else dv + sv

    gu_prev = gu_in_i + cfg.dt * (p_ref[0] * lap_gu + du)
    gv_prev = gv_in_i + cfg.dt * (p_ref[1] * lap_gv + dv)
    _refresh_halos(sgu_ref, gu_prev, H, W)
    _refresh_halos(sgv_ref, gv_prev, H, W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1_mxu(packed, wmat, w2mat, frames_pad, fbar_pad, *, cfg,
                      n_steps, H, W, interpret):
    """MXU reverse sweep. Returns (g_ins, g0, ys_stream) where ys_stream is
    [T, M, Hp, Wp] (valid at [0:H, 0:W]) for `_param_grads_stream`."""
    from percnn_tpu.ops.pallas.cell2d import _round_up, mxu_rows, n_taps

    hp, wp = frames_pad.shape[2], frames_pad.shape[3]
    K = _round_up(n_taps(cfg), 8)
    K2 = _round_up(cfg.kernel_size ** 2 * 2, 8)
    M = mxu_rows(cfg)
    kernel = functools.partial(_phase1_mxu_kernel, cfg=cfg, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    gins, g0, ys = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, K), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, M), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, wp), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, hp, wp), rev, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, 2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, M, hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((K, hp, wp), jnp.float32),
            pltpu.VMEM((M, hp, wp), jnp.float32),
            pltpu.VMEM((M, hp, wp), jnp.float32),
            pltpu.VMEM((K2, hp, wp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(packed, wmat, w2mat, frames_pad, fbar_pad)
    return gins, g0, ys


def _param_grads_stream(params, h_prev, g_ins, ys_stream, cfg: PiCellConfig):
    """`_param_grads_direct` consuming the kernel-streamed activations
    ([T, M, Hp, Wp], rows (o*nb + i)*C + c, valid at [0:H, 0:W]) instead of
    recomputing them with batched convs."""
    H, W = h_prev.shape[1], h_prev.shape[2]
    nb = cfg.n_branches
    C = cfg.hidden
    ys = [[jnp.moveaxis(
        ys_stream[:, (o * nb + i) * C:(o * nb + i + 1) * C, 0:H, 0:W], 1, -1)
        for i in range(nb)] for o in range(cfg.channels)]
    return _param_grads_direct(params, h_prev, g_ins, ys, cfg)


def _precompute_ys(params, h_prev, cfg: PiCellConfig):
    """Branch activations y_{o,i} = conv(w_i^o)(h_t) + b_i^o for ALL steps,
    as time-batched XLA convs (MXU) — the hoisted half of the reverse sweep.

    h_prev: [T, H, W, 2] (step inputs).  Returns
      ys:      list-of-lists [o][i] of [T, H, W, C] (for phase-2), and
      ys_flat: [T, G, H, W] f32 with plane index (o*nb + i)*C + c (kernel).
    """
    from percnn_tpu.ops.convs import conv_nd_periodic

    nb = cfg.n_branches
    ys = []
    with jax.default_matmul_precision("highest"):
        for o in range(cfg.channels):
            br = params["pi"][o]
            ys.append([
                conv_nd_periodic(h_prev.astype(jnp.float32),
                                 jnp.asarray(br[f"w{i}"], jnp.float32)
                                 .reshape((cfg.kernel_size,) * 2 + (2, cfg.hidden)),
                                 jnp.asarray(br[f"b{i}"], jnp.float32))
                for i in range(nb)
            ])
    # [T, H, W, C] x (2*nb) -> [T, G, H, W]
    stacked = jnp.stack([y for row in ys for y in row], axis=1)  # [T, 2nb, H, W, C]
    ys_flat = jnp.moveaxis(stacked, -1, 2).reshape(
        stacked.shape[0], -1, stacked.shape[2], stacked.shape[3])
    return ys, ys_flat


def _param_grads_direct(params, h_prev, g_ins, ys, cfg: PiCellConfig):
    """Parameter gradients straight from the streamed cotangents: no cell
    re-execution, no per-chunk vjp — each branch-weight gradient is ONE
    time-batched conv-weight-grad (MXU), everything else is elementwise
    reductions.  Math (per eq o, branch i, hidden c; all summed over t, xy):

        cot_i      = g_o * w_out[c] * prod_{j != i} y_{j,c}
        dw_i       = dt * conv_weight_grad(h, cot_i)
        db_i       = dt * sum cot_i
        dw_out[c]  = dt * sum g_o * prod_j y_{j,c}
        db_out     = dt * sum g_o
        ddiff_o    = dt * sum g_o * Lap(h_o)   (x reparam chain rule)
    """
    from percnn_tpu.ops.convs import conv_nd_periodic
    from percnn_tpu.ops.stencils import laplacian

    nb = cfg.n_branches
    C = cfg.hidden
    dt = cfg.dt
    h32 = h_prev.astype(jnp.float32)
    g32 = g_ins.astype(jnp.float32)

    lap = laplacian(h32, cfg.dx, axes=(1, 2))          # [T, H, W, 2]
    draw = dt * jnp.sum(g32 * lap, axis=(0, 1, 2))     # [2]
    if cfg.diffusion == "raw":
        ddiff = draw
    else:
        s = jax.nn.sigmoid(jnp.asarray(params["diff"], jnp.float32))
        ddiff = cfg.mu_up * s * (1 - s) * draw

    pi_bar = []
    with jax.default_matmul_precision("highest"):
        for o in range(cfg.channels):
            br = params["pi"][o]
            wout = jnp.asarray(br["w_out"], jnp.float32).reshape(-1)  # [C]
            go = g32[..., o]                                          # [T, H, W]
            y = ys[o]                                                 # nb x [T, H, W, C]
            prod_all = y[0]
            for yj in y[1:]:
                prod_all = prod_all * yj
            branch = {}
            branch["w_out"] = (dt * jnp.sum(go[..., None] * prod_all,
                                            axis=(0, 1, 2)))[:, None]
            branch["b_out"] = dt * jnp.sum(go)[None]
            for i in range(nb):
                pexc = None
                for j in range(nb):
                    if j != i:
                        pexc = y[j] if pexc is None else pexc * y[j]
                cot = go[..., None] * wout
                if pexc is not None:
                    cot = cot * pexc                                  # [T, H, W, C]
                w_shape = (cfg.kernel_size,) * 2 + (2, C)
                _, vjp = jax.vjp(
                    lambda w: conv_nd_periodic(h32, w.reshape(w_shape)),
                    jnp.zeros(w_shape, jnp.float32))
                (dw,) = vjp(cot)
                branch[f"w{i}"] = dt * dw.reshape(jnp.shape(br[f"w{i}"]))
                branch[f"b{i}"] = dt * jnp.sum(cot, axis=(0, 1, 2))
            pi_bar.append(branch)
    bar = {"diff": ddiff, "pi": pi_bar}
    return jax.tree_util.tree_map(lambda g, p: g.astype(jnp.asarray(p).dtype),
                                  bar, params)


# ---------------------------------------------------------------------------
# Fully-fused trainable rollout: pallas forward + pallas phase-1 backward +
# XLA-batched phase-2 parameter gradients.
# ---------------------------------------------------------------------------


def _frames_h_prev(h0_pad, frames_pad):
    """States h_0..h_{T-1} (inputs of each step) in padded layout."""
    return jnp.concatenate([h0_pad[None], frames_pad[:-1]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_rollout_tp_2d(params, h0, cfg: PiCellConfig, n_steps: int,
                        pgrad_chunk: int = 64):
    """Differentiable fused rollout: [H, W, 2] -> [n_steps+1, H, W, 2].

    Forward AND the sequential backward sweep run as Pallas kernels; the
    parameter-gradient reduction is a time-batched XLA computation.
    Gradients are exact (tested against autodiff through the jnp cell)."""
    frames = _forward(params, h0, cfg, n_steps)[0]
    return frames


def _forward(params, h0, cfg, n_steps):
    _check_fusable(cfg)
    interpret = jax.default_backend() != "tpu"
    H, W = h0.shape[0], h0.shape[1]
    packed = pack_pi_params_2d(params, cfg)
    h0_pad = pad_state_2d(h0.astype(jnp.float32))
    from percnn_tpu.ops.pallas.cell2d import (
        MXU_FWD_ENABLED, _fused_rollout_padded_mxu, mxu_fwd_fits_vmem,
        pack_pi_matrix_2d,
    )
    if cfg.kernel_size > 1 and MXU_FWD_ENABLED \
            and mxu_fwd_fits_vmem(cfg, (H, W)):
        wmat = pack_pi_matrix_2d(params, cfg)
        frames_pad = _fused_rollout_padded_mxu(
            packed, wmat, h0_pad, cfg=cfg, n_steps=n_steps, H=H, W=W,
            interpret=interpret)
    else:
        frames_pad = _fused_rollout_padded(
            packed, h0_pad, cfg=cfg, n_steps=n_steps, H=H, W=W,
            interpret=interpret)
    out = unpad_frames_2d(frames_pad, H, W)
    frames = jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
    return frames, (packed, h0_pad, frames_pad)


def _fused_tp_fwd(params, h0, cfg, n_steps, pgrad_chunk):
    frames, (packed, h0_pad, frames_pad) = _forward(params, h0, cfg, n_steps)
    return frames, (params, packed, h0_pad, frames_pad)


YS_PATH_ENABLED = True
"""Kill switch for the hoisted-ys k>1 backward (set False to force the
round-2 in-kernel-recompute path, e.g. if the ys kernel fails to compile
on a given toolchain)."""


def _ys_path_ok(cfg: PiCellConfig, n_steps: int, H: int, W: int) -> bool:
    """The hoisted-ys backward needs the [T, 2*nb*C, H, W] activation
    stream resident in HBM; cap it at 8 GB (reference k=5 workloads are
    ~0.8 GB at T=200)."""
    return YS_PATH_ENABLED and (
        2 * cfg.n_branches * cfg.hidden * n_steps * H * W * 4
        <= 8 * 1024 ** 3)


def ys_bwd_fits_vmem(cfg: PiCellConfig, H: int, W: int) -> bool:
    """The hoisted-ys reverse sweep streams a [G, H, W] activation block
    per step alongside the frame/cotangent blocks; with double-buffered
    pipelining that is ~2*(G+8) resident planes.  Larger grids fall back
    to the round-2 in-kernel-recompute kernel (`_fused_phase1`)."""
    from percnn_tpu.ops.pallas.cell2d import padded_dims

    hp, wp = padded_dims(H, W)
    G = 2 * cfg.n_branches * cfg.hidden
    planes = 2 * (G + 8) + 8
    return planes * hp * wp * 4 <= 90 * 1024 ** 2


def _fused_tp_bwd(cfg, n_steps, pgrad_chunk, residuals, frames_bar):
    params, packed, h0_pad, frames_pad = residuals
    H, W = frames_bar.shape[1], frames_bar.shape[2]
    interpret = jax.default_backend() != "tpu"

    # cotangents for frames 1..T, padded (zeros in halo/dead region — the
    # kernel only reads the interior of fbar)
    hp, wp = h0_pad.shape[1], h0_pad.shape[2]
    fbar_pad = jnp.zeros((n_steps, 2, hp, wp), jnp.float32)
    fbar_pad = fbar_pad.at[:, :, HALO:HALO + H, HALO:HALO + W].set(
        jnp.moveaxis(frames_bar[1:].astype(jnp.float32), -1, 1)
    )

    frames_prev_pad = _frames_h_prev(h0_pad, frames_pad)
    h_prev = unpad_frames_2d(frames_prev_pad, H, W)

    if cfg.kernel_size > 1 and MXU_BWD_ENABLED \
            and mxu_bwd_fits_vmem(cfg, H, W) \
            and _ys_path_ok(cfg, n_steps, H, W):
        # k>1 fastest path: activations AND adjoint as in-kernel MXU
        # matmuls; activations streamed out for direct parameter grads.
        from percnn_tpu.ops.pallas.cell2d import pack_pi_matrix_2d

        wmat = pack_pi_matrix_2d(params, cfg)
        w2mat = pack_adjoint_matrix_2d(wmat, cfg)
        gins_pad, g0_pad, ys_stream = _fused_phase1_mxu(
            packed, wmat, w2mat, frames_prev_pad, fbar_pad,
            cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
        )
        g_ins = unpad_frames_2d(gins_pad, H, W)
        params_bar = _param_grads_stream(params, h_prev, g_ins, ys_stream, cfg)
    elif cfg.kernel_size > 1 and _ys_path_ok(cfg, n_steps, H, W) \
            and ys_bwd_fits_vmem(cfg, H, W):
        # k>1 fast path: branch activations hoisted out of the sequential
        # sweep (time-batched MXU convs), parameter gradients computed
        # directly from the streamed cotangents — no cell re-execution.
        ys, ys_flat = _precompute_ys(params, h_prev, cfg)
        gins_pad, g0_pad = _fused_phase1_ys(
            packed, frames_prev_pad, fbar_pad, ys_flat,
            cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
        )
        g_ins = unpad_frames_2d(gins_pad, H, W)
        params_bar = _param_grads_direct(params, h_prev, g_ins, ys, cfg)
    else:
        gins_pad, g0_pad = _fused_phase1(
            packed, frames_prev_pad, fbar_pad,
            cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
        )
        # phase 2: batched parameter gradients (XLA)
        g_ins = unpad_frames_2d(gins_pad, H, W)
        params_bar = chunked_param_grads(
            lambda p, h: pi_cell_step(p, h, cfg), params, h_prev, g_ins,
            n_steps, pgrad_chunk)

    h0_bar = (jnp.moveaxis(g0_pad[:, HALO:HALO + H, HALO:HALO + W], 0, -1)
              + frames_bar[0])
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_2d.defvjp(_fused_tp_fwd, _fused_tp_bwd)


# ---------------------------------------------------------------------------
# Fully-fused backward for 1x1-Pi cells: parameter gradients accumulate in
# VMEM plane-accumulators INSIDE the reverse sweep, eliminating the XLA
# phase-2 entirely (no g_ins stream to HBM, no re-read of frames, no
# per-chunk vjp fusions).  The per-(eq, hidden) branch activations the
# Jacobian-transpose already computes are reused for the gradient planes:
#
#   dw_i[cin,c]  = w_out[c] * sum_t,xy  g * prod_{j != i} y_j * h_cin
#   db_i[c]      = w_out[c] * sum_t,xy  g * prod_{j != i} y_j
#   dw_out[c]    =            sum_t,xy  g * prod_j y_j
#   db_out       =            sum_t,xy  g
#   ddiff        =            sum_t,xy  g * Lap(h)
#
# (all x dt; w_out and the diffusion reparametrisation chain rule are
# applied OUTSIDE the kernel since params are step-constant.)  The scalar
# reductions happen once at the end over [A, H, W] accumulator planes.
# ---------------------------------------------------------------------------


def _pg_layout(cfg: PiCellConfig):
    """Accumulator-plane indices for the fused parameter gradients."""
    C, nb = cfg.hidden, cfg.n_branches
    dw = 2 * nb * C * 2     # (o, i, c, cin)
    db = 2 * nb * C         # (o, i, c)
    wout = 2 * C            # (o, c)
    n = dw + db + wout + 2 + 2   # + bout (o), + diff (o)
    return {"dw": 0, "db": dw, "wout": dw + db, "bout": dw + db + wout,
            "diff": dw + db + wout + 2, "A": n}


def pg_accum_vmem_bytes(cfg: PiCellConfig, spatial: tuple) -> int:
    """VMEM footprint of the pg gradient accumulators (scratch + the
    flushed output block), for capacity checks before auto-selecting the
    pg path.  `spatial` is the accumulator plane shape ([H, W] for 2D,
    [D, H*W] for the flat 3D layout); sublane/lane padding included."""
    A = _pg_layout(cfg)["A"]
    rows = -(-spatial[0] // 8) * 8
    lanes = -(-spatial[1] // 128) * 128
    return 2 * A * rows * lanes * 4


def pg_fits_vmem(cfg: PiCellConfig, shape: tuple) -> bool:
    """True when the fully-fused pg backward's accumulators fit comfortably
    under the kernels' VMEM budget for a state of `shape` [*spatial, C].
    Reference shapes: GS2D 100^2 C=8 -> 13 MB, GS3D 48^3 C=2 -> 39 MB;
    a 512^2 C=8 grid (344 MB) falls back to the hybrid path."""
    if cfg.ndim == 2:
        spatial = (shape[0], shape[1])
    else:
        spatial = (shape[0], shape[1] * shape[2])
    budget = _COMPILER_PARAMS.vmem_limit_bytes - 24 * 1024 * 1024
    return pg_accum_vmem_bytes(cfg, spatial) <= budget


def _pg_accumulate_pi(p, ui, vi, gu_in, gv_in, acc, *, cfg: PiCellConfig):
    """Shared o/c/i accumulation loop of the fully-fused backward:
    branch activations, per-branch gradient planes (dw/db/w_out) and the
    Pi Jacobian-transpose contributions.  ui/vi/gu_in/gv_in are plane
    VALUES (interior for 2D, flat for 3D); returns (du_acc, dv_acc).

    Layout note: the packed per-branch order is [w_u[C], w_v[C], b[C]]
    for both the 2D and 3D packers, so offsets are shared."""
    C = cfg.hidden
    nb = cfg.n_branches
    stride = 3 * C
    block = _param_block(cfg)
    lay = _pg_layout(cfg)

    du_acc = None
    dv_acc = None
    for o, g in ((0, gu_in), (1, gv_in)):
        base = 2 + o * block
        for c in range(C):
            ys = []
            for i in range(nb):
                off = base + i * stride
                ys.append(p[off + c] * ui + p[off + C + c] * vi
                          + p[off + 2 * C + c])
            wo = p[base + nb * stride + c]
            prod_all = ys[0]
            for y in ys[1:]:
                prod_all = prod_all * y
            acc(lay["wout"] + o * C + c, g * prod_all)
            for i in range(nb):
                pexc = None
                for j in range(nb):
                    if j != i:
                        pexc = ys[j] if pexc is None else pexc * ys[j]
                zz = g if pexc is None else g * pexc   # z / w_out
                a = lay["dw"] + ((o * nb + i) * C + c) * 2
                acc(a + 0, zz * ui)
                acc(a + 1, zz * vi)
                acc(lay["db"] + (o * nb + i) * C + c, zz)
                off = base + i * stride
                du = (p[off + c] * wo) * zz
                dv = (p[off + C + c] * wo) * zz
                du_acc = du if du_acc is None else du_acc + du
                dv_acc = dv if dv_acc is None else dv_acc + dv
    return du_acc, dv_acc


def _pg_step(p, up, vp, fb_u, fb_v, sgu_ref, sgv_ref, acc, *,
             cfg: PiCellConfig, H: int, W: int):
    """One reverse step with gradient accumulation, shared by the single and
    member-batched kernels.

    p: flat-indexable params; up/vp: padded state planes h_t; fb_u/fb_v:
    interior cotangent planes for frame t+1; acc: a -> accumulator-plane ref.
    """
    lay = _pg_layout(cfg)
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)

    gu_in = _interior(sgu_ref[:, :], 0, 0, H, W) + fb_u
    gv_in = _interior(sgv_ref[:, :], 0, 0, H, W) + fb_v
    _refresh_halos(sgu_ref, gu_in, H, W)
    _refresh_halos(sgv_ref, gv_in, H, W)

    lap_gu = _lap(sgu_ref[:, :], H, W, inv_dx2)
    lap_gv = _lap(sgv_ref[:, :], H, W, inv_dx2)
    ui = _interior(up, 0, 0, H, W)
    vi = _interior(vp, 0, 0, H, W)

    # diffusion + output-bias gradient planes (Laplacian of the STATE)
    acc(lay["diff"] + 0, gu_in * _lap(up, H, W, inv_dx2))
    acc(lay["diff"] + 1, gv_in * _lap(vp, H, W, inv_dx2))
    acc(lay["bout"] + 0, gu_in)
    acc(lay["bout"] + 1, gv_in)

    du_acc, dv_acc = _pg_accumulate_pi(p, ui, vi, gu_in, gv_in, acc, cfg=cfg)

    gu_prev = gu_in + cfg.dt * (p[0] * lap_gu + du_acc)
    gv_prev = gv_in + cfg.dt * (p[1] * lap_gv + dv_acc)
    _refresh_halos(sgu_ref, gu_prev, H, W)
    _refresh_halos(sgv_ref, gv_prev, H, W)


def _phase1_pg_kernel(p_ref, frames_ref, fbar_ref, g0_ref, acc_out_ref,
                      sgu_ref, sgv_ref, acc_ref, *, cfg: PiCellConfig,
                      H: int, W: int, n_steps: int):
    """Reverse sweep + in-kernel parameter-gradient accumulation (k=1).

    Accumulators live in VMEM *scratch* (read-modify-write across grid
    steps is unambiguous there) and flush to the output once at the end.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        sgu_ref[:, :] = jnp.zeros_like(sgu_ref)
        sgv_ref[:, :] = jnp.zeros_like(sgv_ref)
        acc_ref[:, :, :] = jnp.zeros_like(acc_ref)

    def acc(a, plane):
        acc_ref[a] += plane

    _pg_step(p_ref, frames_ref[0, 0, :, :], frames_ref[0, 1, :, :],
             fbar_ref[0, 0, HALO:HALO + H, HALO:HALO + W],
             fbar_ref[0, 1, HALO:HALO + H, HALO:HALO + W],
             sgu_ref, sgv_ref, acc, cfg=cfg, H=H, W=W)

    @pl.when(k == n_steps - 1)
    def _():
        g0_ref[0, :, :] = sgu_ref[:, :]
        g0_ref[1, :, :] = sgv_ref[:, :]
        acc_out_ref[:, :, :] = acc_ref[:, :, :]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "H", "W", "interpret"))
def _fused_phase1_pg(packed, frames_pad, fbar_pad, *, cfg, n_steps, H, W,
                     interpret):
    """Returns (g0 [2, Hp, Wp], acc [A, H, W]) — no g_ins stream."""
    hp, wp = frames_pad.shape[2], frames_pad.shape[3]
    A = _pg_layout(cfg)["A"]
    kernel = functools.partial(_phase1_pg_kernel, cfg=cfg, H=H, W=W,
                               n_steps=n_steps)
    rev = lambda k: (n_steps - 1 - k, 0, 0, 0)
    g0, acc = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hp, wp), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, hp, wp), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, H, W), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((A, H, W), jnp.float32),
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


def _pg_unpack(acc_sums, params, cfg: PiCellConfig):
    """[A] plane sums -> parameter-gradient pytree (applies dt, w_out and
    the diffusion reparametrisation chain rule)."""
    C, nb = cfg.hidden, cfg.n_branches
    lay = _pg_layout(cfg)
    dt = cfg.dt

    if cfg.diffusion == "raw":
        ddiff = dt * acc_sums[lay["diff"]: lay["diff"] + 2]
    else:
        s = jax.nn.sigmoid(params["diff"])
        ddiff = dt * cfg.mu_up * s * (1 - s) \
            * acc_sums[lay["diff"]: lay["diff"] + 2]

    pi_bar = []
    for o in range(2):
        wout = params["pi"][o]["w_out"][:, 0]        # [C]
        branch = {}
        for i in range(nb):
            rows = acc_sums[lay["dw"] + (o * nb + i) * C * 2:
                            lay["dw"] + (o * nb + i + 1) * C * 2]
            dw = rows.reshape(C, 2).T                # [2, C] (cin, c)
            branch[f"w{i}"] = dt * dw * wout[None, :]
            db = acc_sums[lay["db"] + (o * nb + i) * C:
                          lay["db"] + (o * nb + i + 1) * C]
            branch[f"b{i}"] = dt * db * wout
        branch["w_out"] = dt * acc_sums[lay["wout"] + o * C:
                                        lay["wout"] + (o + 1) * C][:, None]
        branch["b_out"] = dt * acc_sums[lay["bout"] + o: lay["bout"] + o + 1]
        pi_bar.append(branch)
    return {"diff": ddiff, "pi": pi_bar}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_rollout_tp_2d_pg(params, h0, cfg: PiCellConfig, n_steps: int):
    """Fully-fused differentiable rollout for 1x1-Pi cells: forward, reverse
    sweep AND parameter gradients in two pallas_calls (no XLA phase 2).

    Exact gradients (parity-tested against autodiff); 2D k=1 only — the
    5x5 cells' 4800 gradient planes would not fit VMEM, they keep the
    hybrid `fused_rollout_tp_2d` path.  Computes in f32 (like all the
    fused kernels)."""
    if cfg.ndim != 2 or cfg.kernel_size != 1:
        raise NotImplementedError(
            "fused_rollout_tp_2d_pg requires ndim=2, kernel_size=1 "
            f"(got ndim={cfg.ndim}, kernel_size={cfg.kernel_size})")
    return _forward(params, h0, cfg, n_steps)[0]


def _fused_tp_pg_fwd(params, h0, cfg, n_steps):
    frames, (packed, h0_pad, frames_pad) = _forward(params, h0, cfg, n_steps)
    return frames, (params, packed, h0_pad, frames_pad)


def _fused_tp_pg_bwd(cfg, n_steps, residuals, frames_bar):
    params, packed, h0_pad, frames_pad = residuals
    H, W = frames_bar.shape[1], frames_bar.shape[2]
    interpret = jax.default_backend() != "tpu"
    hp, wp = h0_pad.shape[1], h0_pad.shape[2]

    fbar_pad = jnp.zeros((n_steps, 2, hp, wp), jnp.float32)
    fbar_pad = fbar_pad.at[:, :, HALO:HALO + H, HALO:HALO + W].set(
        jnp.moveaxis(frames_bar[1:].astype(jnp.float32), -1, 1)
    )

    g0_pad, acc = _fused_phase1_pg(
        packed, _frames_h_prev(h0_pad, frames_pad), fbar_pad,
        cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0_pad[:, HALO:HALO + H, HALO:HALO + W], 0, -1)
              + frames_bar[0])
    params_bar = _pg_unpack(acc.sum(axis=(1, 2)), params, cfg)
    return params_bar, h0_bar.astype(frames_bar.dtype)


fused_rollout_tp_2d_pg.defvjp(_fused_tp_pg_fwd, _fused_tp_pg_bwd)
