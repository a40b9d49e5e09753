"""High-order FD ground-truth generators for the four reference systems.

The reference repo does not include its datasets (Google Drive links in
readme4data.txt) nor the simulation code that produced them (README.md:38);
this module regenerates ground truth with the same discretisation family the
models assume: 4th-order central stencils on periodic grids, integrated in
time with RK4 at an oversampled dt, recorded at the experiment dt.

Grids/domains per experiment (SURVEY §2.2):
- lambda-omega 2D: 100x100, dx=0.2 (domain 20^2 centred at 0), dt=0.0125
- Gray-Scott 2D:  100x100, dx=0.01 (domain 1^2),            dt=0.5
- Gray-Scott 3D:  48^3,    dx=100/48 (domain 100^3),        dt=0.5
- Burgers 2D:     100x100, dx=0.01 (domain 1^2),            dt=0.00025
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from percnn_tpu.pde.systems import PDE_SYSTEMS


def default_ic(system: str, n: int, seed: int = 66) -> np.ndarray:
    """Canonical initial condition per system, [*spatial, 2] float64."""
    rng = np.random.RandomState(seed)
    if system == "lambda_omega":
        # spiral-wave seed on [-10, 10]^2: the classic lambda-omega one-armed
        # spiral IC; the reference instead loads a mature spectral snapshot
        # (percnn_LO_eqn.py:482-486) — we reach the same attractor by
        # integrating this seed forward (see make_dataset warmup).
        x = np.linspace(-10.0, 10.0, n, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        r = np.sqrt(X**2 + Y**2) + 1e-9
        theta = np.arctan2(Y, X)
        u = np.tanh(r) * np.cos(theta - r)
        v = np.tanh(r) * np.sin(theta - r)
        return np.stack([u, v], axis=-1)
    if system == "gray_scott_2d":
        # u=1, v=0 background with a perturbed centre square + noise
        u = np.ones((n, n))
        v = np.zeros((n, n))
        q = n // 5
        c = slice(n // 2 - q // 2, n // 2 + q // 2)
        u[c, c] = 0.5 + 0.1 * rng.rand(*u[c, c].shape)
        v[c, c] = 0.25 + 0.1 * rng.rand(*v[c, c].shape)
        return np.stack([u, v], axis=-1)
    if system == "gray_scott_3d":
        u = np.ones((n, n, n))
        v = np.zeros((n, n, n))
        q = max(2, n // 6)
        c = slice(n // 2 - q // 2, n // 2 + q // 2)
        u[c, c, c] = 0.5 + 0.1 * rng.rand(*u[c, c, c].shape)
        v[c, c, c] = 0.25 + 0.1 * rng.rand(*v[c, c, c].shape)
        return np.stack([u, v], axis=-1)
    if system == "burgers":
        # smooth random periodic field from low-wavenumber Fourier modes,
        # zero-mean: a mean velocity component would add a genuine
        # ones*u_x advection term to the governing equation, which the
        # reference's Burgers data does not contain
        def field():
            k = 4
            coef = rng.randn(2 * k + 1, 2 * k + 1) + 1j * rng.randn(2 * k + 1, 2 * k + 1)
            x = np.linspace(0, 1, n, endpoint=False)
            X, Y = np.meshgrid(x, x, indexing="ij")
            f = np.zeros((n, n))
            for i in range(-k, k + 1):
                for j in range(-k, k + 1):
                    a = coef[i + k, j + k]
                    f += (a.real * np.cos(2 * np.pi * (i * X + j * Y))
                          - a.imag * np.sin(2 * np.pi * (i * X + j * Y)))
            f -= f.mean()
            f = f / np.abs(f).max()
            return f

        return np.stack([field(), field()], axis=-1)
    raise KeyError(system)


@partial(jax.jit, static_argnames=("system", "n_record", "oversample", "dx", "dt"))
def _integrate(h0, *, system: str, n_record: int, oversample: int, dx: float, dt: float):
    rhs = PDE_SYSTEMS[system].rhs
    dts = dt / oversample

    def rk4(h, _):
        k1 = rhs(h, dx)
        k2 = rhs(h + 0.5 * dts * k1, dx)
        k3 = rhs(h + 0.5 * dts * k2, dx)
        k4 = rhs(h + dts * k3, dx)
        return h + (dts / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    def record(h, _):
        h2, _ = jax.lax.scan(rk4, h, None, length=oversample)
        return h2, h2

    _, frames = jax.lax.scan(record, h0, None, length=n_record)
    return jnp.concatenate([h0[None], frames], axis=0)


def _np_shift_sum(u, coeffs, axis):
    r = len(coeffs) // 2
    out = np.zeros_like(u)
    for k, c in enumerate(coeffs):
        if c:
            out += c * np.roll(u, -(k - r), axis=axis)
    return out


def _integrate_np(h0: np.ndarray, *, system: str, n_record: int,
                  oversample: int, dx: float, dt: float) -> np.ndarray:
    """Pure-numpy f64 RK4 (used when jax_enable_x64 is off, where jnp would
    silently truncate f64 to f32).  Same stencils/rhs as the jax path."""
    from percnn_tpu.ops.stencils import FD1_CENTRAL_1D, LAP_CROSS_1D

    ndim = h0.ndim - 1
    axes = tuple(range(ndim))

    def lap(h):
        acc = np.zeros_like(h)
        for ax in axes:
            acc += _np_shift_sum(h, LAP_CROSS_1D, ax)
        return acc / (dx * dx)

    def grad(h, ax):
        return _np_shift_sum(h, FD1_CENTRAL_1D, ax) / dx

    def rhs(h):
        u, v = h[..., 0], h[..., 1]
        L = lap(h)
        if system == "lambda_omega":
            a2 = u * u + v * v
            return np.stack([0.1 * L[..., 0] + (1 - a2) * u + a2 * v,
                             0.1 * L[..., 1] - a2 * u + (1 - a2) * v], -1)
        if system == "gray_scott_2d":
            Du, Dv, f, k = 2e-5, 5e-6, 0.04, 0.06
            uvv = u * v * v
            return np.stack([Du * L[..., 0] - uvv + f * (1 - u),
                             Dv * L[..., 1] + uvv - (f + k) * v], -1)
        if system == "gray_scott_3d":
            Du, Dv, f, k = 0.2, 0.1, 0.025, 0.055
            uvv = u * v * v
            return np.stack([Du * L[..., 0] - uvv + f * (1 - u),
                             Dv * L[..., 1] + uvv - (f + k) * v], -1)
        if system == "burgers":
            nu = 1.0 / 200.0
            ux, uy = grad(h[..., 0:1], ndim - 1)[..., 0], grad(h[..., 0:1], ndim - 2)[..., 0]
            vx, vy = grad(h[..., 1:2], ndim - 1)[..., 0], grad(h[..., 1:2], ndim - 2)[..., 0]
            return np.stack([nu * L[..., 0] - u * ux - v * uy,
                             nu * L[..., 1] - u * vx - v * vy], -1)
        raise KeyError(system)

    dts = dt / oversample
    h = np.asarray(h0, np.float64)
    frames = [h]
    for _ in range(n_record):
        for _ in range(oversample):
            k1 = rhs(h)
            k2 = rhs(h + 0.5 * dts * k1)
            k3 = rhs(h + 0.5 * dts * k2)
            k4 = rhs(h + dts * k3)
            h = h + (dts / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        frames.append(h)
    return np.stack(frames)


def simulate(
    system: str,
    h0: np.ndarray,
    n_steps: int,
    dt: float,
    dx: float,
    *,
    oversample: int = 4,
    dtype=jnp.float64,
) -> np.ndarray:
    """Integrate `system` from h0 for n_steps experiment-dt steps with RK4 at
    dt/oversample; returns [n_steps+1, *spatial, 2] (frame 0 = h0).

    Runs on the host CPU: ground-truth generation is a one-off data-pipeline
    task that wants true f64.  When f64 is requested but jax_enable_x64 is
    off (jnp would silently truncate to f32), a pure-numpy f64 RK4 path is
    used instead; otherwise the jitted jax path runs on the CPU backend.
    """
    want_f64 = dtype == jnp.float64
    if want_f64 and not jax.config.jax_enable_x64:
        return _integrate_np(np.asarray(h0, np.float64), system=system,
                             n_record=n_steps, oversample=oversample,
                             dx=dx, dt=dt)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        h0 = jnp.asarray(np.asarray(h0), dtype)
        out = _integrate(
            h0, system=system, n_record=n_steps, oversample=oversample, dx=dx, dt=dt
        )
        return np.asarray(out)
