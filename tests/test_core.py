"""Core tests: rollout semantics, remat gradient equivalence, Pi-cell math,
ISG shape/parity, checkpoint round-trip, physics residual consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.core.cell import (
    PiCellConfig,
    SymbolicCellConfig,
    init_pi_cell,
    init_symbolic_cell,
    pi_cell_step,
    pi_block,
    symbolic_cell_step,
)
from percnn_tpu.core.rollout import rollout, rollout_final, _pick_segment
from percnn_tpu.core.isg import ISGConfig, init_isg, isg_apply
from percnn_tpu.core.checkpoint import save_checkpoint, load_checkpoint
from percnn_tpu.core import losses
from percnn_tpu.pde.systems import PDE_SYSTEMS, physics_residual
from percnn_tpu.data.simulate import default_ic, simulate


def test_pick_segment():
    assert _pick_segment(400) == 20
    assert _pick_segment(401) == 1  # prime-ish: falls back to small divisor
    assert 400 % _pick_segment(400) == 0


def test_rollout_includes_ic_and_matches_manual():
    cfg = PiCellConfig(ndim=2, hidden=4, dt=0.01, dx=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 2))
    frames = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 6, segment=2)
    assert frames.shape == (7, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(h0))
    h = h0
    for i in range(6):
        h = pi_cell_step(params, h, cfg)
        np.testing.assert_allclose(np.asarray(frames[i + 1]), np.asarray(h), rtol=1e-6, atol=1e-6)
    hf = rollout_final(lambda h: pi_cell_step(params, h, cfg), h0, 6)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(h), rtol=1e-6, atol=1e-6)


def test_rollout_prime_steps_remat():
    """Prime n_steps gets the peel-one-step treatment instead of segment=1
    (per-step checkpointing); values and grads stay exact."""
    cfg = PiCellConfig(ndim=2, hidden=4, dt=0.01, dx=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 2))
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 13, remat=False)
    got = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 13, remat=True)
    assert got.shape == (14, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)

    def loss(p, remat):
        fr = rollout(lambda h: pi_cell_step(p, h, cfg), h0, 13, remat=remat)
        return jnp.mean(fr**2)

    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, False))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        g1, g2,
    )


def test_remat_gradients_match_no_remat():
    cfg = PiCellConfig(ndim=2, hidden=4, dt=0.01, dx=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 2))

    def loss(p, remat):
        frames = rollout(lambda h: pi_cell_step(p, h, cfg), h0, 8, remat=remat, segment=4)
        return jnp.mean(frames**2)

    g1 = jax.grad(lambda p: loss(p, True))(params)
    g2 = jax.grad(lambda p: loss(p, False))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        g1, g2,
    )


def test_two_phase_bptt_matches_autodiff():
    """rollout_tp custom-VJP gradients == plain autodiff through the scan."""
    from percnn_tpu.core.rollout import rollout_tp

    cfg = PiCellConfig(ndim=2, hidden=4, dt=0.01, dx=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 2))
    step = lambda p, h: pi_cell_step(p, h, cfg)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (11, 8, 8, 2))

    def loss_tp(p, h):
        return jnp.mean((rollout_tp(step, p, h, 10, 4) - tgt) ** 2)

    def loss_ref(p, h):
        return jnp.mean((rollout(lambda x: step(p, x), h, 10, remat=False) - tgt) ** 2)

    l1 = loss_tp(params, h0)
    l2 = loss_ref(params, h0)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(loss_tp, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-8),
        g1, g2,
    )


def test_pi_block_expresses_cubic_polynomial():
    """With hand-set weights the Pi product-of-branches equals the explicit
    polynomial (u+2v)(3u)(v+1)."""
    cfg = PiCellConfig(ndim=2, hidden=1, kernel_size=1, n_branches=3)
    branch = {
        "w0": jnp.array([[1.0], [2.0]]),
        "b0": jnp.array([0.0]),
        "w1": jnp.array([[3.0], [0.0]]),
        "b1": jnp.array([0.0]),
        "w2": jnp.array([[0.0], [1.0]]),
        "b2": jnp.array([1.0]),
        "w_out": jnp.array([[1.0]]),
        "b_out": jnp.array([0.0]),
    }
    h = jax.random.normal(jax.random.PRNGKey(2), (5, 5, 2))
    u, v = h[..., 0], h[..., 1]
    want = (u + 2 * v) * (3 * u) * (v + 1)
    got = pi_block(branch, h, cfg)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_symbolic_cell_matches_true_pde_rhs():
    """SymbolicCell with truth coefficients reproduces the Burgers rhs."""
    cfg = SymbolicCellConfig(
        ndim=2, dt=0.1, dx=0.3,
        terms=(("u*u_x", "v*u_y"), ("u*v_x", "v*v_y")),
        integrator="euler",
    )
    params = init_symbolic_cell(
        jax.random.PRNGKey(0), cfg,
        coef_init=[[-1.0, -1.0], [-1.0, -1.0]],
        nu_init=[1 / 200, 1 / 200],
    )
    h = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (16, 16, 2))
    got = symbolic_cell_step(params, h, cfg)
    want = h + cfg.dt * PDE_SYSTEMS["burgers"].rhs(h, cfg.dx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_symbolic_rk4_consistency():
    cfg_e = SymbolicCellConfig(ndim=2, dt=1e-3, dx=0.3, terms=(("u",), ("v",)), integrator="euler")
    cfg_r = SymbolicCellConfig(ndim=2, dt=1e-3, dx=0.3, terms=(("u",), ("v",)), integrator="rk4")
    params = init_symbolic_cell(jax.random.PRNGKey(0), cfg_e, coef_init=[[1.0], [1.0]], nu_init=[0.0, 0.0])
    h = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 2))
    e = symbolic_cell_step(params, h, cfg_e)
    r = symbolic_cell_step(params, h, cfg_r)
    # for dh/dt = h, both approximate h*exp(dt); RK4 is closer
    exact = h * np.exp(1e-3)
    assert jnp.abs(r - exact).max() < jnp.abs(e - exact).max()


@pytest.mark.parametrize(
    "cfg,low,high",
    [
        (ISGConfig(ndim=2, hidden=8, strides=(2, 2), activation="sigmoid"), 25, 100),
        (ISGConfig(ndim=2, hidden=16, strides=(2,), activation="tanh"), 50, 100),
        (ISGConfig(ndim=3, hidden=8, strides=(2, 1), activation="sigmoid"), 24, 48),
    ],
)
def test_isg_shapes(cfg, low, high):
    params = init_isg(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1,) + (low,) * cfg.ndim + (2,), jnp.float32)
    y = isg_apply(params, x, cfg)
    assert y.shape == (1,) + (high,) * cfg.ndim + (2,)


def test_checkpoint_roundtrip(tmp_path):
    cfg = PiCellConfig()
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    tree = {"params": params, "step": np.asarray(7)}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, tree, {"best_val": 0.5})
    loaded, meta = load_checkpoint(p, tree)
    assert meta["best_val"] == 0.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), tree, loaded
    )


def test_physics_residual_vanishes_on_euler_rollout():
    """An exact forward-Euler rollout of the true PDE has ~zero residual
    under the matching forward-difference residual (design invariant of the
    reference's staggered loss)."""
    dt, dx = 0.0125, 0.2
    h0 = jnp.asarray(default_ic("lambda_omega", 32), jnp.float64)
    rhs = PDE_SYSTEMS["lambda_omega"].rhs

    def step(h):
        return h + dt * rhs(h, dx)

    frames = rollout(step, h0, 10, remat=False)
    r = physics_residual(PDE_SYSTEMS["lambda_omega"], frames, dt, dx)
    assert float(jnp.abs(r).max()) < 1e-10


def test_simulate_gray_scott_stays_bounded():
    h0 = default_ic("gray_scott_2d", 48)
    out = simulate("gray_scott_2d", h0, 50, dt=0.5, dx=0.01, oversample=2)
    assert out.shape == (51, 48, 48, 2)
    assert np.isfinite(out).all()
    assert out[..., 0].min() > -0.1 and out[..., 0].max() < 1.5


def test_data_loss_split_and_subsample():
    T, n = 41, 16
    roll = jnp.arange(T * n * n * 2, dtype=jnp.float32).reshape(T, n, n, 2)
    cfg = losses.DataLossConfig(time_stride=4, space_stride=2, val_frac=0.1)
    sub = losses.subsample(roll, cfg, 2)
    assert sub.shape == (10, 8, 8, 2)
    meas = sub + 1.0
    tr, va = losses.data_loss(roll, meas, cfg, 2)
    np.testing.assert_allclose(np.asarray(tr), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(va), 1.0, rtol=1e-6)


def test_debug_utils():
    from percnn_tpu.utils.debug import checked, assert_all_finite, nan_guard

    err, out = checked(lambda x: jnp.log(x))(jnp.array([-1.0]))
    import pytest as _pytest
    with _pytest.raises(Exception):
        err.throw()
    err2, out2 = checked(lambda x: x * 2)(jnp.array([1.0]))
    err2.throw()  # no error
    assert_all_finite({"a": jnp.ones(3)})
    with _pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.array([jnp.nan])})
    np.testing.assert_allclose(np.asarray(nan_guard(jnp.array([1.0, jnp.nan]))),
                               [1.0, 0.0])


def test_reconstruction_residual_mse():
    from percnn_tpu.discovery.library import reconstruction_residual_mse
    from percnn_tpu.data.simulate import default_ic, simulate

    roll = simulate("lambda_omega", default_ic("lambda_omega", 24), 10,
                    0.0125, 0.2, oversample=8)
    mu, mv = reconstruction_residual_mse(roll, PDE_SYSTEMS["lambda_omega"],
                                         0.0125, 0.2)
    # The staggered (forward-Euler) residual of an accurate RK4 solution is
    # floored by the Euler truncation error ~ (dt*u_tt/2)^2 ~ 4e-5 MSE for
    # lambda-omega's O(1) dynamics — small but not machine-zero.
    assert mu < 0.02 and mv < 0.02
    # an exact Euler rollout by contrast is ~machine zero (see
    # test_physics_residual_vanishes_on_euler_rollout)


def test_gradient_finite_difference_check():
    """SURVEY §4(d): jax.grad through a short rollout vs numerical FD."""
    cfg = PiCellConfig(ndim=2, hidden=2, dt=0.05, dx=0.3)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params)
    h0 = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (6, 6, 2), jnp.float64)

    def loss(p):
        frames = rollout(lambda h: pi_cell_step(p, h, cfg), h0, 5, remat=False)
        return jnp.sum(frames[-1] ** 2)

    g = jax.grad(loss)(params)
    eps = 1e-6
    # spot-check a handful of scalar coordinates across the pytree
    leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = jax.tree_util.tree_leaves(g)
    rng = np.random.RandomState(0)
    for li in [0, 1, len(leaves) // 2, len(leaves) - 1]:
        leaf = leaves[li]
        idx = tuple(rng.randint(s) for s in leaf.shape) if leaf.shape else ()
        def perturbed(sign):
            new = leaf.at[idx].add(sign * eps) if leaf.shape else leaf + sign * eps
            ls = list(leaves)
            ls[li] = new
            return float(loss(jax.tree_util.tree_unflatten(treedef, ls)))
        fd = (perturbed(+1) - perturbed(-1)) / (2 * eps)
        an = float(g_leaves[li][idx]) if leaf.shape else float(g_leaves[li])
        np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-7)


def test_numpy_integrator_matches_jax_path():
    """The pure-numpy f64 RK4 fallback (used when x64 is off) must match the
    jitted jax integrator for every system."""
    from percnn_tpu.data.simulate import _integrate, _integrate_np

    for system, n, dt, dx in [("lambda_omega", 24, 0.0125, 0.2),
                              ("gray_scott_2d", 24, 0.5, 0.01),
                              ("burgers", 24, 0.00025, 0.01),
                              ("gray_scott_3d", 8, 0.5, 100/48)]:
        h0 = default_ic(system, n if system != "gray_scott_3d" else 8, seed=3)
        a = _integrate_np(np.asarray(h0, np.float64), system=system,
                          n_record=4, oversample=2, dx=dx, dt=dt)
        b = np.asarray(_integrate(jnp.asarray(h0, jnp.float64), system=system,
                                  n_record=4, oversample=2, dx=dx, dt=dt))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
