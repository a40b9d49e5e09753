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
    frames_pad = _fused_rollout_padded(
        packed, h0_pad, cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret
    )
    out = unpad_frames_2d(frames_pad, H, W)
    frames = jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
    return frames, (packed, h0_pad, frames_pad)


def _fused_tp_fwd(params, h0, cfg, n_steps, pgrad_chunk):
    frames, (packed, h0_pad, frames_pad) = _forward(params, h0, cfg, n_steps)
    return frames, (params, packed, h0_pad, frames_pad)


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

    gins_pad, g0_pad = _fused_phase1(
        packed, _frames_h_prev(h0_pad, frames_pad), fbar_pad,
        cfg=cfg, n_steps=n_steps, H=H, W=W, interpret=interpret,
    )
    h0_bar = (jnp.moveaxis(g0_pad[:, HALO:HALO + H, HALO:HALO + W], 0, -1)
              + frames_bar[0])

    # phase 2: batched parameter gradients (XLA)
    h_prev = unpad_frames_2d(_frames_h_prev(h0_pad, frames_pad), H, W)
    g_ins = unpad_frames_2d(gins_pad, H, W)

    params_bar = chunked_param_grads(
        lambda p, h: pi_cell_step(p, h, cfg), params, h_prev, g_ins,
        n_steps, pgrad_chunk)
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
