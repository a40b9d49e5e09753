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


# --------------------------------------------------------------------------
# Expanded-update fast path.  The k=1 Pi block is a product of three affine
# forms in (u, v) summed over hidden channels — algebraically a single
# bivariate cubic with 10 monomial coefficients per output equation.  The
# naive evaluation costs ~33 vector ops per equation (branch affines,
# products, output head); the expanded form costs 7 SHARED monomial products
# + 12 FMAs per equation, with the coefficients computed once OUTSIDE the
# kernel from the cell params (scalar work, jit-fused).  dt, the effective
# diffusion nu, 1/dx^2, the 4th-order stencil weights and the Laplacian
# center tap all fold into the same scalars, and the width-wrap lane masks
# hoist out of the per-shift helper, so a step is 16 rolls + 4 selects +
# ~33 arith ops per equation instead of ~70+ (the round-5 probe measured
# the old step VPU-issue-bound at ~14 us on 48^3,
# runs/round5/bench3d_probe.jsonl).
# --------------------------------------------------------------------------

EXPANDED_ROW = 12  # [k1, k2, const, u, v, u2, uv, v2, u3, u2v, uv2, v3]


def pack_pi_expanded_3d(params: dict, cfg: PiCellConfig) -> jnp.ndarray:
    """Flatten cell params to the expanded per-equation update coefficients.

    Returns f32 [2 * EXPANDED_ROW]: per output equation eq,
      k1 = dt * nu_eq / dx^2 * 4/3        (1st-neighbour stencil weight)
      k2 = -dt * nu_eq / dx^2 / 12        (2nd-neighbour stencil weight)
      then the dt-scaled cubic coefficients of the expanded Pi polynomial
      [const, u, v, u^2, uv, v^2, u^3, u^2 v, u v^2, v^3], with the
      Laplacian center tap (-15/2 * dt * nu / dx^2) folded into the linear
      coefficient of the equation's own field.
    """
    from percnn_tpu.core.cell import effective_diffusion

    C = cfg.hidden
    nu = effective_diffusion(params, cfg).astype(jnp.float32)
    inv_dx2 = 1.0 / (cfg.dx * cfg.dx)
    dt = cfg.dt
    rows = []
    for eq in range(cfg.channels):
        br = params["pi"][eq]
        a, b, c = [], [], []
        for i in range(cfg.n_branches):
            w = br[f"w{i}"].reshape(2, C).astype(jnp.float32)
            a.append(w[0])
            b.append(w[1])
            c.append(br[f"b{i}"].reshape(C).astype(jnp.float32))
        # y1*y2 = A u^2 + B uv + Cq v^2 + Dq u + E v + F   (per hidden ch)
        A = a[0] * a[1]
        B = a[0] * b[1] + b[0] * a[1]
        Cq = b[0] * b[1]
        Dq = a[0] * c[1] + c[0] * a[1]
        E = b[0] * c[1] + c[0] * b[1]
        F = c[0] * c[1]
        mono = {  # (y1*y2)*y3 expanded, per hidden channel
            "u3": A * a[2],
            "u2v": A * b[2] + B * a[2],
            "uv2": B * b[2] + Cq * a[2],
            "v3": Cq * b[2],
            "u2": A * c[2] + Dq * a[2],
            "uv": B * c[2] + Dq * b[2] + E * a[2],
            "v2": Cq * c[2] + E * b[2],
            "u": Dq * c[2] + F * a[2],
            "v": E * c[2] + F * b[2],
            "const": F * c[2],
        }
        w_out = br["w_out"].reshape(C).astype(jnp.float32)
        b_out = br["b_out"].reshape(-1).astype(jnp.float32)[0]
        coef = {k: dt * jnp.dot(w_out, v_) for k, v_ in mono.items()}
        coef["const"] = coef["const"] + dt * b_out
        k = dt * nu[eq] * inv_dx2
        center = k * 3.0 * (-5.0 / 2.0)
        coef["u" if eq == 0 else "v"] = (
            coef["u" if eq == 0 else "v"] + center)
        rows.append(jnp.stack([
            k * (4.0 / 3.0), k * (-1.0 / 12.0), coef["const"],
            coef["u"], coef["v"], coef["u2"], coef["uv"], coef["v2"],
            coef["u3"], coef["u2v"], coef["uv2"], coef["v3"],
        ]))
    return jnp.concatenate(rows)


def _width_masks(shape, W: int):
    """Static lane masks for the width-wrap blend, hoisted out of the
    per-shift helper (iota + mod + compare once per kernel body instead of
    once per shift per field)."""
    w_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1) % W
    return (w_idx < W - 1, w_idx >= 1, w_idx < W - 2, w_idx >= 2)


def _shift_w_masked(x, s: int, W: int, mask):
    a = _roll(x, s, 1)
    b = _roll(x, s - W, 1) if s > 0 else _roll(x, s + W, 1)
    return jnp.where(mask, a, b)


def _lap_sums_flat(x, W: int, masks):
    """(sum of the six +-1 neighbours, sum of the six +-2 neighbours) on
    the flat [D, H*W] layout — the stencil weights are folded into the
    packed k1/k2 scalars."""
    m1p, m1n, m2p, m2n = masks
    s1 = (_roll(x, 1, 0) + _roll(x, -1, 0)
          + _roll(x, W, 1) + _roll(x, -W, 1)
          + _shift_w_masked(x, 1, W, m1p) + _shift_w_masked(x, -1, W, m1n))
    s2 = (_roll(x, 2, 0) + _roll(x, -2, 0)
          + _roll(x, 2 * W, 1) + _roll(x, -2 * W, 1)
          + _shift_w_masked(x, 2, W, m2p) + _shift_w_masked(x, -2, W, m2n))
    return s1, s2


def _step_flat_expanded(u, v, e_ref, masks, *, W: int):
    s1u, s2u = _lap_sums_flat(u, W, masks)
    s1v, s2v = _lap_sums_flat(v, W, masks)
    u2 = u * u
    uv = u * v
    v2 = v * v
    u3 = u2 * u
    u2v = u2 * v
    uv2 = u * v2
    v3 = v2 * v

    def upd(eq, x, s1, s2):
        o = EXPANDED_ROW * eq
        return (x + e_ref[o] * s1 + e_ref[o + 1] * s2 + e_ref[o + 2]
                + e_ref[o + 3] * u + e_ref[o + 4] * v + e_ref[o + 5] * u2
                + e_ref[o + 6] * uv + e_ref[o + 7] * v2 + e_ref[o + 8] * u3
                + e_ref[o + 9] * u2v + e_ref[o + 10] * uv2
                + e_ref[o + 11] * v3)

    return upd(0, u, s1u, s2u), upd(1, v, s1v, s2v)


def _rollout3d_kernel(p_ref, init_ref, out_ref, su_ref, sv_ref, *,
                      cfg: PiCellConfig, D: int, H: int, W: int,
                      unroll: int, final_only: bool, n_iters: int,
                      expanded: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        su_ref[:, :] = init_ref[0, :, :]
        sv_ref[:, :] = init_ref[1, :, :]

    u = su_ref[:, :]
    v = sv_ref[:, :]
    if expanded:
        masks = _width_masks((D, H * W), W)
    for k in range(unroll):
        if expanded:
            u, v = _step_flat_expanded(u, v, p_ref, masks, W=W)
        else:
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
    "cfg", "n_steps", "D", "H", "W", "interpret", "unroll", "final_only",
    "expanded"))
def _fused_rollout3d_flat(packed, state0, *, cfg, n_steps, D, H, W,
                          interpret, unroll=1, final_only=False,
                          expanded=False):
    n_iters = n_steps // unroll
    kernel = functools.partial(_rollout3d_kernel, cfg=cfg, D=D, H=H, W=W,
                               unroll=unroll, final_only=final_only,
                               n_iters=n_iters, expanded=expanded)
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
    expanded: bool = True,
) -> jnp.ndarray:
    """[D, H, W, 2] -> [n_steps+1, D, H, W, 2] fused rollout (frame 0 = h0).

    Requires D % 8 == 0 and (H*W) % 128 == 0 (true for the 48^3 reference
    grid); other sizes use the jnp path.

    ``final_only=True`` returns just the final state [D, H, W, 2] without
    per-step HBM frame writes (~25% of the step cost at 48^3, round-5 probe
    runs/round5/bench3d_probe.jsonl); ``unroll`` fuses that many cell steps
    per grid iteration (amortises the grid/revisit overhead; 2 is the
    measured sweet spot).  n_steps must be divisible by unroll.

    ``expanded=True`` (default) evaluates the k=1 Pi product in its
    algebraically expanded 10-coefficient cubic form (see
    `pack_pi_expanded_3d`) — identical math reassociated, ~40% fewer VPU
    ops per step.  Set False to run the literal branch-product form.
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
    packed = (pack_pi_expanded_3d(params, cfg) if expanded
              else pack_pi_params_2d(params, cfg))
    state0 = jnp.moveaxis(h0.astype(jnp.float32), -1, 0).reshape(2, D, H * W)
    out = _fused_rollout3d_flat(
        packed, state0, cfg=cfg, n_steps=n_steps, D=D, H=H, W=W,
        interpret=interpret, unroll=unroll, final_only=final_only,
        expanded=expanded,
    )
    if final_only:
        return jnp.moveaxis(out.reshape(2, D, H, W), 0, -1)
    out = jnp.moveaxis(out.reshape(n_steps, 2, D, H, W), 1, -1)
    return jnp.concatenate([h0.astype(jnp.float32)[None], out], axis=0)
