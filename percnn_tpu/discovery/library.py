"""Candidate-library design matrix from a reconstructed rollout.

Mirrors the reference Stage-2 flow (PDE_FIND_u.py:217-263): take a window of
the Stage-1 high-res reconstruction, evaluate the derivative dict with the
same 4th-order periodic stencils, form the 70 columns of
{poly(u,v)} x {1, u_x, u_y, v_x, v_y, lap_u, lap_v}, flatten space-time, and
randomly subsample rows.  The reference assembles columns with Python
``eval`` over term strings (PDE_FIND_u.py:249-259); here terms come from the
explicit TERM_REGISTRY so the 70-column ordering is testable (and
must_have=5 still means 'ones*lap_u').

The derivative columns run on device (jnp); the returned matrices are
float64 numpy for the CPU lstsq solver (reference to_numpy_float64,
derivatives.py:235-238).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from percnn_tpu.ops.stencils import time_derivative_fwd
from percnn_tpu.pde.terms import TERM_REGISTRY, eval_grads, gen_library


def reconstruction_residual_mse(rollout, system, dt: float, dx: float) -> tuple:
    """Physics-residual MSE of a reconstruction per channel — the Stage-2
    entry diagnostic (reference get_residual_mse, Stage-2/derivatives.py)."""
    from percnn_tpu.pde.systems import physics_residual

    r = physics_residual(system, jnp.asarray(rollout), dt, dx)
    return float(jnp.mean(r[..., 0] ** 2)), float(jnp.mean(r[..., 1] ** 2))


def build_design_matrix(
    rollout: np.ndarray,
    dt: float,
    dx: float,
    *,
    frames: slice = slice(50, 150),
    subsample: float = 0.2,
    seed: int = 0,
    library: list[str] | None = None,
):
    """rollout: [T, H, W, 2] -> (R [n, 70], Ut [n, 1], Vt [n, 1], names).

    Spatial terms are evaluated on frames [0:-2] of the window and u_t/v_t
    with the forward difference on the same alignment, matching the
    reference's staggered residual (derivatives.py:129-199).
    """
    import jax

    names = library if library is not None else gen_library()
    # pinned to host CPU: the regression wants f64 columns (TPUs would
    # silently truncate to f32) and this is a one-off offline stage
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        win = jnp.asarray(np.asarray(rollout[frames]), jnp.float64)
        grads = eval_grads(win[:-2], dx, ndim=2)
        dhdt = time_derivative_fwd(win, dt)
        cols = [np.asarray(TERM_REGISTRY[n](win[:-2], grads)).reshape(-1) for n in names]
    R = np.stack(cols, axis=1).astype(np.float64)
    Ut = np.asarray(dhdt[..., 0]).reshape(-1, 1).astype(np.float64)
    Vt = np.asarray(dhdt[..., 1]).reshape(-1, 1).astype(np.float64)
    if subsample is not None and subsample < 1.0:
        rng = np.random.RandomState(seed)
        idx = rng.choice(R.shape[0], int(R.shape[0] * subsample), replace=False)
        R, Ut, Vt = R[idx], Ut[idx], Vt[idx]
    return R, Ut, Vt, names
