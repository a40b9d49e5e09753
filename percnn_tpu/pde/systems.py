"""The four governing systems the reference targets, as declarative specs.

Each system provides `rhs(h, dx) -> dh/dt` (used by the FD ground-truth
generator and the physics residual) with the exact coefficients of the
reference:

- lambda-omega 2D: f_u = 0.1 Lap u + (1-u^2-v^2) u + (u^2+v^2) v
                   f_v = 0.1 Lap v - (u^2+v^2) u + (1-u^2-v^2) v
  (percnn_LO_eqn.py:339-340)
- Gray-Scott 2D:   Du=2e-5, Dv=Du/4, f=1/25, k=3/50 (train_2drd.py:321-327)
- Gray-Scott 3D:   Du=0.2,  Dv=0.1,  f=0.025, k=0.055 (train_3drd.py:315-322)
- Burgers 2D:      nu=1/200; f_u = nu Lap u - u u_x - v u_y;
                   f_v = nu Lap v - u v_x - v v_y (rcnn_Burgers...py:454-458)
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from percnn_tpu.ops.stencils import laplacian, grad_x, grad_y, time_derivative_fwd


@dataclasses.dataclass(frozen=True)
class PDESystem:
    name: str
    ndim: int
    rhs: Callable  # (h [..., *spatial, 2], dx) -> dh/dt, same shape


def _lo_rhs(h: jnp.ndarray, dx: float) -> jnp.ndarray:
    axes = (h.ndim - 3, h.ndim - 2)
    lap = laplacian(h, dx, axes=axes)
    u, v = h[..., 0], h[..., 1]
    a2 = u * u + v * v
    fu = 0.1 * lap[..., 0] + (1.0 - a2) * u + a2 * v
    fv = 0.1 * lap[..., 1] - a2 * u + (1.0 - a2) * v
    return jnp.stack([fu, fv], axis=-1)


def _gs2d_rhs(h: jnp.ndarray, dx: float) -> jnp.ndarray:
    Du, Dv, f, k = 2e-5, 2e-5 / 4, 1.0 / 25.0, 3.0 / 50.0
    axes = (h.ndim - 3, h.ndim - 2)
    lap = laplacian(h, dx, axes=axes)
    u, v = h[..., 0], h[..., 1]
    uvv = u * v * v
    fu = Du * lap[..., 0] - uvv + f * (1.0 - u)
    fv = Dv * lap[..., 1] + uvv - (f + k) * v
    return jnp.stack([fu, fv], axis=-1)


def _gs3d_rhs(h: jnp.ndarray, dx: float) -> jnp.ndarray:
    Du, Dv, f, k = 0.2, 0.1, 0.025, 0.055
    axes = (h.ndim - 4, h.ndim - 3, h.ndim - 2)
    lap = laplacian(h, dx, axes=axes)
    u, v = h[..., 0], h[..., 1]
    uvv = u * v * v
    fu = Du * lap[..., 0] - uvv + f * (1.0 - u)
    fv = Dv * lap[..., 1] + uvv - (f + k) * v
    return jnp.stack([fu, fv], axis=-1)


def _burgers_rhs(h: jnp.ndarray, dx: float) -> jnp.ndarray:
    nu = 1.0 / 200.0
    axes = (h.ndim - 3, h.ndim - 2)
    lap = laplacian(h, dx, axes=axes)
    u, v = h[..., 0], h[..., 1]
    ux = grad_x(h[..., 0:1], dx)[..., 0]
    uy = grad_y(h[..., 0:1], dx)[..., 0]
    vx = grad_x(h[..., 1:2], dx)[..., 0]
    vy = grad_y(h[..., 1:2], dx)[..., 0]
    fu = nu * lap[..., 0] - u * ux - v * uy
    fv = nu * lap[..., 1] - u * vx - v * vy
    return jnp.stack([fu, fv], axis=-1)


PDE_SYSTEMS = {
    "lambda_omega": PDESystem("lambda_omega", 2, _lo_rhs),
    "gray_scott_2d": PDESystem("gray_scott_2d", 2, _gs2d_rhs),
    "gray_scott_3d": PDESystem("gray_scott_3d", 3, _gs3d_rhs),
    "burgers": PDESystem("burgers", 2, _burgers_rhs),
}


def physics_residual(system: PDESystem, rollout: jnp.ndarray, dt: float, dx: float):
    """PDE residual over a rollout [T, *spatial, C]:
    r[i] = rhs(U[i]) - (U[i+1] - U[i]) / dt,  i in [0, T-2)

    This matches the reference residual indexing: spatial terms on frames
    [0:T-2], forward-difference u_t aligned to the same frames
    (percnn_LO_eqn.py:288-341).  The reference evaluates spatial stencils on
    a periodic-padded rollout then crops — identical to our periodic
    roll-sums on the unpadded field.
    """
    dh_dt = time_derivative_fwd(rollout, dt)
    rhs = system.rhs(rollout[:-2], dx)
    return rhs - dh_dt
