"""Discovery pipeline tests: STRidge recovery on synthetic data, library
assembly on true PDE rollouts (Burgers & lambda-omega coefficients must be
recovered from clean simulations), symbolic extraction round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from percnn_tpu.data.simulate import default_ic, simulate
from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.discovery.stridge import STRidge, discovery_metrics, pareto_sweep
from percnn_tpu.discovery.symbolic import pi_block_expression, expression_coefficients
from percnn_tpu.pde.terms import gen_library


def test_library_ordering_and_must_have_index():
    lib = gen_library()
    assert len(lib) == 70
    assert lib[5] == "ones*lap_u"   # must_have=5 (PDE_FIND_u.py:49)
    assert lib[6] == "ones*lap_v"   # must_have=6 (PDE_FIND_v.py)
    assert lib[0] == "ones*ones"


def test_stridge_recovers_synthetic_sparse_coefficients():
    rng = np.random.RandomState(3)
    n, d = 4000, 30
    X = rng.randn(n, d)
    w_true = np.zeros((d, 1))
    w_true[[2, 7, 19]] = [[1.5], [-0.8], [0.3]]
    y = X @ w_true + 0.01 * rng.randn(n, 1)
    tr = STRidge(X, y, normalize=2, split_ratio=0.8)
    w = tr.train(maxit=50, stridge_iters=20, lam=1e-4, d_tol=2.0)
    m = discovery_metrics(w, w_true)
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert m["rel_l2"] < 0.05, m


def test_stridge_must_have_protection():
    rng = np.random.RandomState(4)
    n, d = 2000, 10
    X = rng.randn(n, d)
    w_true = np.zeros((d, 1))
    w_true[0] = 2.0
    w_true[5] = 1e-3   # tiny but must be kept
    y = X @ w_true
    tr = STRidge(X, y, normalize=2)
    w = tr.train(maxit=30, stridge_iters=20, lam=1e-5, d_tol=5.0, must_have=5)
    assert w[5] != 0.0


def test_stridge_must_have_multi_column():
    """must_have accepts a list: every forced column survives thresholding
    (the λ–Ω high-noise protocol protects [lap, linear] per equation)."""
    rng = np.random.RandomState(4)
    n, d = 2000, 10
    X = rng.randn(n, d)
    w_true = np.zeros((d, 1))
    w_true[0] = 2.0
    w_true[3] = 1e-3
    w_true[5] = 1e-3
    y = X @ w_true
    tr = STRidge(X, y, normalize=2)
    w = tr.train(maxit=30, stridge_iters=20, lam=1e-5, d_tol=5.0,
                 must_have=[3, 5])
    assert w[3] != 0.0 and w[5] != 0.0


def test_stage2_high_noise_lo_protocol():
    """run_stage2 at λ–Ω noise_pct >= 0.25 switches to the off-attractor
    weighted sweep with per-equation [lap, linear] must_have (round-5
    identifiability fix, runs/round5/lo30_v_study.jsonl): on a clean
    simulation the full true support of BOTH equations must be recovered
    with the protected columns present."""
    import dataclasses

    from percnn_tpu.experiments.configs import LO_STAGE1
    from percnn_tpu.experiments.pipeline import TRUTH_TERMS, run_stage2

    exp = dataclasses.replace(LO_STAGE1, grid=64, noise_pct=0.3)
    h0 = default_ic("lambda_omega", 64, seed=1)
    h0 = simulate("lambda_omega", h0, 40, exp.dt, exp.dx)[-1]
    roll = simulate("lambda_omega", h0, 60, exp.dt, exp.dx)
    s2 = run_stage2(exp, np.asarray(roll), frames=slice(0, 60),
                    subsample=1.0, kwargs=dict(maxit=10, stridge_iters=10))
    names = s2["names"]
    for eq in ("u", "v"):
        w = np.ravel(s2[f"w_{eq}"])
        sup = {names[i] for i in np.flatnonzero(np.abs(w) > 1e-12)}
        assert f"ones*lap_{eq}" in sup and f"{eq}*ones" in sup, (eq, sup)
        missing = set(TRUTH_TERMS["lambda_omega"][eq]) - sup
        assert not missing, (eq, missing, sup)


@pytest.mark.parametrize(
    "system,dt,dx,noise,stridge_kwargs,truth_terms",
    [
        # Burgers with 0.1% measurement noise, the reference's kappa path +
        # must_have=5 ('ones*lap_u', PDE_FIND_u.py:49).
        (
            "burgers", 0.00025, 0.01, 0.001,
            dict(maxit=50, stridge_iters=40, lam=0.01, d_tol=20, kappa=1.0,
                 must_have=5),
            {"ones*lap_u": 1 / 200, "u*u_x": -1.0, "v*u_y": -1.0},
        ),
        # lambda-omega on clean data with an explicit l0 penalty (on an
        # exact simulation the holdout error is ~FD truncation, so the
        # kappa-derived penalty would never reward pruning; the reference
        # runs Stage-2 on imperfect Stage-1 reconstructions instead).
        (
            "lambda_omega", 0.0125, 0.2, 0.0,
            dict(maxit=50, stridge_iters=40, lam=1e-4, d_tol=5,
                 l0_penalty=1e-6),
            {"u*ones": 1.0, "ones*lap_u": 0.1, "u**3*ones": -1.0,
             "u**2*v*ones": 1.0, "u*v**2*ones": -1.0, "v**3*ones": 1.0},
        ),
    ],
)
def test_discovery_on_simulation(system, dt, dx, noise, stridge_kwargs, truth_terms):
    """End-to-end Stage-2 on an FD simulation of the true PDE: STRidge must
    recover the governing u-equation with perfect precision/recall
    (reference targets, BASELINE.md)."""
    from percnn_tpu.data.noise import add_noise

    n = 64
    h0 = default_ic(system, n, seed=1)
    warm = 40 if system == "lambda_omega" else 0
    if warm:
        h0 = simulate(system, h0, warm, dt, dx)[-1]
    roll = simulate(system, h0, 60, dt, dx)
    if noise:
        roll = add_noise(roll, noise, seed=7)
    lib = gen_library()
    R, Ut, Vt, names = build_design_matrix(
        roll, dt, dx, frames=slice(0, 60), subsample=0.2, seed=0
    )
    coef_true = np.zeros((len(lib), 1))
    for t, c in truth_terms.items():
        coef_true[lib.index(t)] = c
    tr = STRidge(R, Ut, normalize=2, split_ratio=0.8)
    w = tr.train(**stridge_kwargs)
    m = discovery_metrics(w, coef_true)
    assert m["recall"] == 1.0, (m, _nonzero(w, names))
    assert m["precision"] == 1.0, (m, _nonzero(w, names))
    assert m["rel_l2"] < 0.05, (m, _nonzero(w, names))


def _nonzero(w, names):
    return {n: float(c) for n, c in zip(names, w[:, 0]) if c != 0}


def test_stage2_stability_selection_votes_and_refits():
    """run_stage2_stable on a noisy Burgers simulation: every true term
    must win every draw's vote, the refit support must equal the voted
    support, and coefficients must match truth (the per-draw subsample
    lottery documented in RESULTS.md round 4 averages out)."""
    import dataclasses

    from percnn_tpu.experiments.configs import BURGERS_STAGE1
    from percnn_tpu.experiments.pipeline import TRUTH_TERMS, run_stage2_stable

    exp = dataclasses.replace(BURGERS_STAGE1, grid=64)
    h0 = default_ic("burgers", 64, seed=1)
    roll = simulate("burgers", h0, 60, exp.dt, exp.dx)
    from percnn_tpu.data.noise import add_noise

    roll = np.asarray(add_noise(roll, 0.001, seed=7))
    s2 = run_stage2_stable(exp, roll, draws=4, frames=slice(0, 60),
                           kwargs=dict(lam=0.01, d_tol=20), seed=0)
    names = s2["names"]
    for eq in ("u", "v"):
        votes = s2[f"votes_{eq}"]
        w = np.ravel(s2[f"w_{eq}"])
        for term in TRUTH_TERMS["burgers"][eq]:
            assert votes[names.index(term)] == 1.0, (eq, term, votes)
        np.testing.assert_array_equal(np.abs(w) > 1e-12, votes >= 0.5)
        m = s2[f"metrics_{eq}"]
        assert m["recall"] == 1.0, (eq, m, _nonzero(s2[f"w_{eq}"], names))
        assert m["rel_l2"] < 0.1, (eq, m)


def test_default_stage2_frames_noise_aware():
    """LO's default regression window flips to the reference's 50:150 at
    >=20% noise (window x subsample study, RESULTS.md round 3 addendum:
    the early window inherits measurement noise at high levels while the
    reference window stays clean); Burgers always uses 50:150
    (PDE_FIND_u.py:220-222)."""
    import dataclasses

    from percnn_tpu.experiments.configs import BURGERS_STAGE1, LO_STAGE1
    from percnn_tpu.experiments.pipeline import default_stage2_frames

    assert default_stage2_frames(
        dataclasses.replace(LO_STAGE1, noise_pct=0.0)) == slice(0, 100)
    assert default_stage2_frames(
        dataclasses.replace(LO_STAGE1, noise_pct=0.1)) == slice(0, 100)
    assert default_stage2_frames(
        dataclasses.replace(LO_STAGE1, noise_pct=0.2)) == slice(50, 150)
    assert default_stage2_frames(
        dataclasses.replace(LO_STAGE1, noise_pct=0.3)) == slice(50, 150)
    for pct in (0.0, 0.3):
        assert default_stage2_frames(
            dataclasses.replace(BURGERS_STAGE1, noise_pct=pct)) == slice(50, 150)


def test_pareto_sweep_runs():
    rng = np.random.RandomState(5)
    X = rng.randn(500, 8)
    w_true = np.zeros((8, 1))
    w_true[1] = 1.0
    y = X @ w_true + 0.01 * rng.randn(500, 1)
    tr = STRidge(X, y)
    gammas, ls, l0, ws = pareto_sweep(tr, gammas=np.array([0.01, 0.1, 1.0]), maxit=10)
    assert len(ls) == 3 and (l0 >= 0).all()


def test_pareto_knee_picks_true_support():
    """On synthetic data the automatic knee of the (||w||_0, LS) front
    lands on the true 3-term support (the LO Stage-2 selection rule)."""
    from percnn_tpu.discovery.stridge import pareto_knee, pareto_select

    rng = np.random.RandomState(6)
    n, d = 3000, 20
    X = rng.randn(n, d)
    w_true = np.zeros((d, 1))
    w_true[[2, 7, 13]] = [[1.2], [-0.9], [0.5]]
    y = X @ w_true + 0.02 * rng.randn(n, 1)
    tr = STRidge(X, y)
    gammas = np.array([0.01 * 1.5**i for i in range(20)])
    w, info = pareto_select(tr, gammas=gammas, maxit=15, stridge_iters=15,
                            lam=1e-4, d_tol=2.0)
    assert int(np.count_nonzero(w)) == 3
    assert set(np.nonzero(w[:, 0])[0]) == {2, 7, 13}
    assert info["selected_gamma"] in gammas


def test_pareto_knee_degenerate_inputs():
    from percnn_tpu.discovery.stridge import pareto_knee

    # all-zero supports fall back to min loss
    i = pareto_knee(np.array([3.0, 1.0, 2.0]), np.array([0, 0, 0]))
    assert i == 1
    # flat tail: denser points only shave the loss gently; the elbow sits
    # where further sparsification explodes (5 -> 3 costs 77x) -> pick 5
    ls = np.array([2.0e-4, 1.3e-4, 1.0e-4, 1e-2])
    l0 = np.array([8, 5, 10, 3])
    assert pareto_knee(ls, l0) == 1
    # the LARGEST cliff wins: 3 -> 1 costs 1e4 vs 10 -> 3 costing 1e2,
    # so 3 terms is the knee (sparser AND already near the data's floor)
    ls = np.array([1e-6, 1e-4, 1.0])
    l0 = np.array([10, 3, 1])
    assert pareto_knee(ls, l0) == 1
    # single support level: pick it
    assert pareto_knee(np.array([1.0, 2.0]), np.array([4, 4])) == 0
    # measured lambda-omega 5%-noise front (round 3): the fixed-alpha rule
    # picked the 10-term support; the elbow lands on the true 6-term one
    ls = np.array([8.06e-5, 1.52e-4, 4.13e-4, 6.05e-3])
    l0 = np.array([48, 10, 6, 1])
    assert pareto_knee(ls, l0) == 2


def test_symbolic_extraction_roundtrip():
    """Hand-built Pi branch -> polynomial (u+1)(2u-v)(3v) expanded."""
    branch = {
        "w0": jnp.array([[1.0], [0.0]]), "b0": jnp.array([1.0]),
        "w1": jnp.array([[2.0], [-1.0]]), "b1": jnp.array([0.0]),
        "w2": jnp.array([[0.0], [3.0]]), "b2": jnp.array([0.0]),
        "w_out": jnp.array([[1.0]]), "b_out": jnp.array([0.0]),
    }
    expr = pi_block_expression(branch)
    coefs = expression_coefficients(expr)
    # (u+1)(2u-v)(3v) = 6u^2 v - 3uv^2 + 6uv - 3v^2
    want = {"u**2*v": 6.0, "u*v**2": -3.0, "u*v": 6.0, "v**2": -3.0}
    got = {k: v for k, v in coefs.items() if abs(v) > 1e-9}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
