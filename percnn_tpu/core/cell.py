"""Recurrent cells: the Pi-block model core and the Stage-3 symbolic cell.

The PeRCNN cell computes one forward-Euler step of
    h_next = h + dt * ( D_eff * Lap(h) + Pi(h) )
where Pi is the "Pi-block": N parallel conv branches combined by elementwise
product then aggregated by a 1x1 conv — expressing polynomials up to order N
in (u, v) (reference: percnn_LO_eqn.py:53-69,107-108; train_2drd.py:70-90,
115-118; train_3drd.py:85-106,133-136; rcnn_Burgers...py:108-129,172-175).

TPU-first design decisions:
- channels-last state [*, H, W, C] (C=2), stencils as roll-sums (no conv
  kernel materialisation), Pi 1x1 branches as channel matmuls;
- the step function is pure (params, h) -> h_next, composable with
  `lax.scan`, `jax.checkpoint`, `shard_map`, and replaceable 1:1 by the
  fused Pallas kernel in `percnn_tpu.ops.pallas`;
- the diffusion coefficient lives in the cell params either raw
  (percnn_LO_eqn.py:42-43) or bounded via mu_up*sigmoid(c)
  (train_2drd.py:58-62).

The Stage-3 `SymbolicCell` integrates an explicit PDE whose scalar
coefficients are learnable (fine_tuning_[5%noise...].py:123-157), with Euler
and RK4 integrators (:209-221, :159-206).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from percnn_tpu.core.init import (
    scaled_fanin_uniform,
    scaled_xavier_uniform,
    uniform_symmetric,
)
from percnn_tpu.ops.convs import conv_nd_periodic, pointwise_conv
from percnn_tpu.ops.stencils import laplacian


@dataclasses.dataclass(frozen=True)
class PiCellConfig:
    """Static configuration of a Pi-block cell (one per experiment, §2.2)."""

    ndim: int = 2                 # spatial dims (2 or 3)
    channels: int = 2             # state channels (u, v)
    hidden: int = 8               # Pi hidden channels C
    kernel_size: int = 1          # Pi branch kernel (1 or 5)
    n_branches: int = 3           # parallel branches (polynomial order)
    dt: float = 0.5
    dx: float = 0.01
    diffusion: str = "sigmoid"    # 'sigmoid' (mu_up*sigmoid(c)) | 'raw'
    mu_up: float = 3.99e-5        # diffusion upper bound (sigmoid mode)
    diff_init: float | None = None  # raw mode: constant init (the reference
                                  # forward sim sets DA=DB=0.2,
                                  # percnn_LO_eqn.py:42-43); sigmoid mode:
                                  # None => U(-1,1) logits (train_2drd.py:60-62)
    init: str = "xavier"          # 'xavier' | 'fanin'
    init_scale: float = 0.02      # the reference's c constant

    @property
    def spatial_axes(self) -> tuple:
        # axes of [..., *spatial, C]
        return tuple(range(-1 - self.ndim, -1))


def init_pi_cell(key, cfg: PiCellConfig, dtype=jnp.float32) -> dict:
    """Build the cell parameter pytree.

    Layout:
      diff: [channels] raw diffusion logits/values
      pi:   per state-channel dict with branch weights w1..wN [k.., C_in, hidden]
            (or [C_in, hidden] when kernel_size==1), biases b1..bN [hidden],
            aggregation w_out [hidden, 1] (always 1x1), b_out [1].
    """
    k_diff, key = jax.random.split(key)
    if cfg.diff_init is not None:
        diff = jnp.full((cfg.channels,), cfg.diff_init, dtype)
    else:
        diff = uniform_symmetric(k_diff, (cfg.channels,), 1.0, dtype)

    init_fn = scaled_xavier_uniform if cfg.init == "xavier" else scaled_fanin_uniform

    def branch_shape():
        if cfg.kernel_size == 1:
            return (cfg.channels, cfg.hidden)
        return (cfg.kernel_size,) * cfg.ndim + (cfg.channels, cfg.hidden)

    pi = []
    for _c in range(cfg.channels):
        keys = jax.random.split(key, cfg.n_branches + 2)
        key = keys[-1]
        branch = {}
        for i in range(cfg.n_branches):
            branch[f"w{i}"] = init_fn(keys[i], branch_shape(), cfg.init_scale, dtype)
            branch[f"b{i}"] = jnp.zeros((cfg.hidden,), dtype)
        branch["w_out"] = init_fn(keys[cfg.n_branches], (cfg.hidden, 1), cfg.init_scale, dtype)
        branch["b_out"] = jnp.zeros((1,), dtype)
        pi.append(branch)
    return {"diff": diff, "pi": pi}


def effective_diffusion(params: dict, cfg: PiCellConfig) -> jnp.ndarray:
    """[channels] diffusion coefficients after reparametrisation."""
    if cfg.diffusion == "raw":
        return params["diff"]
    return cfg.mu_up * jax.nn.sigmoid(params["diff"])


def pi_block(branch: dict, h: jnp.ndarray, cfg: PiCellConfig) -> jnp.ndarray:
    """Pi nonlinearity for one output channel: [..., C] -> [..., 1].

    product of N branch convs, then 1x1 aggregation
    (reference Wh4(Wh1(h)*Wh2(h)*Wh3(h)), train_2drd.py:115-116).
    """
    prod = None
    for i in range(cfg.n_branches):
        w, b = branch[f"w{i}"], branch[f"b{i}"]
        if cfg.kernel_size == 1:
            y = pointwise_conv(h, w, b)
        else:
            y = conv_nd_periodic(h, w, b)
        prod = y if prod is None else prod * y
    return pointwise_conv(prod, branch["w_out"], branch["b_out"])


def pi_rhs(params: dict, h: jnp.ndarray, cfg: PiCellConfig) -> jnp.ndarray:
    """dh/dt = D_eff * Lap(h) + Pi(h)  (per channel)."""
    lap = laplacian(h, cfg.dx, axes=[a % h.ndim for a in cfg.spatial_axes])
    diff = effective_diffusion(params, cfg)
    nonlin = jnp.concatenate(
        [pi_block(params["pi"][c], h, cfg) for c in range(cfg.channels)], axis=-1
    )
    return diff * lap + nonlin


def pi_cell_step(params: dict, h: jnp.ndarray, cfg: PiCellConfig) -> jnp.ndarray:
    """One forward-Euler step (reference RCNNCell.forward,
    train_2drd.py:105-123)."""
    return h + cfg.dt * pi_rhs(params, h, cfg)


def pi_cell_step_valid(params: dict, xp: jnp.ndarray, cfg: PiCellConfig,
                       *, halo: int = 2) -> jnp.ndarray:
    """One Euler step from a halo-extended block [*spatial+2*halo, C] to its
    interior [*spatial, C] — no periodic wrap, all stencils/convs VALID.

    This is the local update under domain decomposition: the halo has been
    filled by neighbour exchange (parallel/halo.py), so the global periodic
    BC lives in the device ring, not here.  It is also the exact adjoint
    template for the fused Pallas local step (ops/pallas/sharded_step2d.py):
    differentiating this function w.r.t. ``xp`` yields halo cotangents whose
    transpose rides ppermute's automatic transpose back to the neighbours.
    """
    from percnn_tpu.ops.convs import conv_nd
    from percnn_tpu.ops.stencils import laplacian_valid

    nd = cfg.ndim
    axes = tuple(range(xp.ndim - 1 - nd, xp.ndim - 1))
    interior = xp[(...,) + tuple(slice(halo, -halo) for _ in range(nd)) + (slice(None),)]
    lap = laplacian_valid(xp, cfg.dx, axes=axes)
    if cfg.kernel_size == 1:
        nonlin = jnp.concatenate(
            [pi_block(params["pi"][c], interior, cfg) for c in range(cfg.channels)],
            axis=-1,
        )
    else:
        r = cfg.kernel_size // 2
        sl = tuple(slice(halo - r, (r - halo) or None) for _ in range(nd))
        xk = xp[(...,) + sl + (slice(None),)]
        outs = []
        for c in range(cfg.channels):
            br = params["pi"][c]
            prod = None
            for i in range(cfg.n_branches):
                y = conv_nd(xk, br[f"w{i}"], br[f"b{i}"], padding="VALID")
                prod = y if prod is None else prod * y
            outs.append(jnp.einsum("...i,io->...o", prod, br["w_out"]) + br["b_out"])
        nonlin = jnp.concatenate(outs, axis=-1)
    diff = effective_diffusion(params, cfg)
    return interior + cfg.dt * (diff * lap + nonlin)


# --------------------------------------------------------------------------
# Stage-3 symbolic cell: explicit PDE with learnable scalar coefficients.
# --------------------------------------------------------------------------

# A term is a callable (h, grads) -> [..., 1] field; grads carries the
# precomputed derivative dict so terms are cheap closures over shared ops.
TermFn = Callable[[jnp.ndarray, dict], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SymbolicCellConfig:
    """Explicit-PDE cell: per-channel term lists with learnable coefficients.

    terms[c] is a sequence of term names (resolved via
    `percnn_tpu.pde.terms.TERM_REGISTRY`); the diffusion (Laplacian) term is
    separate so its coefficient can be bounded positive like the reference's
    nu (fine_tuning_[5%noise...].py:123-130).
    """

    ndim: int = 2
    channels: int = 2
    dt: float = 0.00025
    dx: float = 0.01
    terms: tuple = ()            # tuple over channels of tuples of term names
    integrator: str = "euler"    # 'euler' | 'rk4'
    diffusion: str = "raw"       # nu parametrisation: 'raw' | 'sigmoid'
    mu_up: float = 0.01

    @property
    def spatial_axes(self) -> tuple:
        return tuple(range(-1 - self.ndim, -1))


def init_symbolic_cell(
    key, cfg: SymbolicCellConfig, coef_init: Sequence[Sequence[float]] | None = None,
    nu_init: Sequence[float] | None = None, dtype=jnp.float32,
) -> dict:
    """Coefficients initialised either from Stage-2 STRidge output
    (the reference hand-pastes them, fine_tuning_[5%...].py:123-130) or
    randomly."""
    k_nu, *coef_keys = jax.random.split(key, cfg.channels + 1)
    if coef_init is not None:
        coef = [jnp.asarray(c, dtype) for c in coef_init]
    else:
        coef = [
            uniform_symmetric(coef_keys[c], (len(cfg.terms[c]),), 1.0, dtype)
            for c in range(cfg.channels)
        ]
    if nu_init is not None:
        nu = jnp.asarray(nu_init, dtype)
    else:
        nu = uniform_symmetric(k_nu, (cfg.channels,), 1.0, dtype)
    return {"nu": nu, "coef": coef}


def symbolic_rhs(params: dict, h: jnp.ndarray, cfg: SymbolicCellConfig) -> jnp.ndarray:
    """f(h) = nu * Lap(h) + sum_i coef_i * term_i(h)."""
    from percnn_tpu.pde.terms import eval_grads, TERM_REGISTRY

    axes = [a % h.ndim for a in cfg.spatial_axes]
    lap = laplacian(h, cfg.dx, axes=axes)
    nu = params["nu"] if cfg.diffusion == "raw" else cfg.mu_up * jax.nn.sigmoid(params["nu"])
    grads = eval_grads(h, cfg.dx, cfg.ndim)
    outs = []
    for c in range(cfg.channels):
        acc = nu[c] * lap[..., c]
        for coef, name in zip(params["coef"][c], cfg.terms[c]):
            acc = acc + coef * TERM_REGISTRY[name](h, grads)
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def symbolic_cell_step(params: dict, h: jnp.ndarray, cfg: SymbolicCellConfig) -> jnp.ndarray:
    """Euler (fine_tuning_[5%...].py:209-221) or RK4 (:159-206) step."""
    if cfg.integrator == "euler":
        return h + cfg.dt * symbolic_rhs(params, h, cfg)
    k1 = symbolic_rhs(params, h, cfg)
    k2 = symbolic_rhs(params, h + 0.5 * cfg.dt * k1, cfg)
    k3 = symbolic_rhs(params, h + 0.5 * cfg.dt * k2, cfg)
    k4 = symbolic_rhs(params, h + cfg.dt * k3, cfg)
    return h + (cfg.dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
