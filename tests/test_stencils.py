"""Unit tests for the stencil operators: analytic fields, dense-conv parity,
and the reference coefficient tables."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.ops import stencils as st


def _periodic_field_2d(n, k1=2, k2=3):
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = np.sin(k1 * X) * np.cos(k2 * Y)
    lap = -(k1**2 + k2**2) * u
    ux = k1 * np.cos(k1 * X) * np.cos(k2 * Y)  # derivative along axis 0
    return u, lap, ux, x[1] - x[0]


def test_laplacian_2d_analytic():
    u, lap_true, _, dx = _periodic_field_2d(128)
    got = st.laplacian(jnp.asarray(u), dx, axes=(0, 1))
    # 4th-order scheme: error ~ dx^4 (x64 enabled in conftest)
    assert np.max(np.abs(np.asarray(got) - lap_true)) < 1e-4


def test_laplacian_2d_convergence_order():
    errs = []
    for n in (64, 128):
        u, lap_true, _, dx = _periodic_field_2d(n)
        got = st.laplacian(jnp.asarray(u), dx, axes=(0, 1))
        errs.append(np.max(np.abs(np.asarray(got) - lap_true)))
    order = np.log2(errs[0] / errs[1])
    assert order > 3.5  # 4th-order convergence


def test_grad_axis_analytic():
    u, _, ux_true, dx = _periodic_field_2d(128)
    got = st.grad_axis(jnp.asarray(u), dx, axis=0)
    assert np.max(np.abs(np.asarray(got) - ux_true)) < 1e-4


def test_laplacian_matches_dense_conv_2d():
    """Roll-based Laplacian == dense 5x5 cross-kernel conv with wrap pad
    (the reference's formulation, train_2drd.py:20-24,65-67)."""
    rng = np.random.RandomState(0)
    u = rng.randn(40, 40).astype(np.float64)
    dx = 0.17
    # reference kernel table: per-axis cross sums, centre -5 (train_2drd.py:20-24)
    k = np.zeros((5, 5))
    k[2, :] += np.array([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12])
    k[:, 2] += np.array([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12])
    assert np.isclose(k[2, 2], -5.0)
    up = np.pad(u, 2, mode="wrap")
    ref = np.zeros_like(u)
    for i in range(5):
        for j in range(5):
            ref += k[i, j] * up[i : i + 40, j : j + 40]
    ref /= dx * dx
    got = st.laplacian(jnp.asarray(u), dx, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12, atol=1e-12)


def test_laplacian_3d_matches_element_table():
    """3D Laplacian == the reference 13-point element table
    (train_3drd.py:22-39)."""
    rng = np.random.RandomState(1)
    u = rng.randn(12, 12, 12).astype(np.float64)
    dx = 0.3
    elements = [(-15 / 2, (0, 0, 0))]
    for ax in range(3):
        for off, w in [(1, 4 / 3), (-1, 4 / 3), (2, -1 / 12), (-2, -1 / 12)]:
            sh = [0, 0, 0]
            sh[ax] = off
            elements.append((w, tuple(sh)))
    ref = np.zeros_like(u)
    for w, sh in elements:
        ref += w * np.roll(u, shift=[-s for s in sh], axis=(0, 1, 2))
    ref /= dx * dx
    got = st.laplacian(jnp.asarray(u), dx, axes=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12, atol=1e-12)


def test_time_derivative_fwd():
    T = 7
    seq = np.arange(T, dtype=np.float64)[:, None] ** 2  # [T, 1]
    dt = 0.5
    got = st.time_derivative_fwd(jnp.asarray(seq), dt)
    assert got.shape == (T - 2, 1)
    # out[i] = (seq[i+1]-seq[i])/dt
    ref = (seq[1:-1] - seq[:-2]) / dt
    np.testing.assert_allclose(np.asarray(got), ref)


def test_periodic_pad_matches_wrap():
    rng = np.random.RandomState(2)
    u = rng.randn(6, 8)
    got = st.periodic_pad(jnp.asarray(u), 2, axes=(0, 1))
    ref = np.pad(u, 2, mode="wrap")
    np.testing.assert_allclose(np.asarray(got), ref)


def test_channel_last_wrappers():
    rng = np.random.RandomState(3)
    u = rng.randn(4, 10, 12, 2)  # [T,H,W,C]
    dx = 0.2
    lap = st.laplacian_2d(jnp.asarray(u), dx)
    ref = st.laplacian(jnp.asarray(u), dx, axes=(1, 2))
    np.testing.assert_allclose(np.asarray(lap), np.asarray(ref))
    gx = st.grad_x(jnp.asarray(u), dx)
    ref = st.grad_axis(jnp.asarray(u), dx, axis=2)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref))
