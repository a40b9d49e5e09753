"""Stage-3 fine-tune + full pipeline + I/O + viz + CLI smoke tests."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.data.io import load_mat_uv, save_mat_uv, save_npz, load_npz
from percnn_tpu.data.simulate import default_ic, simulate
from percnn_tpu.experiments.configs import BURGERS_STAGE1
from percnn_tpu.experiments.stage3 import burgers_stage3, lambda_omega_stage3, run_stage3, show_coef
from percnn_tpu.experiments.pipeline import identified_to_symbolic
from percnn_tpu.pde.terms import gen_library


def _small_burgers():
    exp = BURGERS_STAGE1
    return dataclasses.replace(
        exp, grid=32, train_steps=40, infer_steps=40,
        data=dataclasses.replace(exp.data, time_stride=5, space_stride=2),
        noise_pct=0.01,
    )


def test_stage3_finetune_converges_to_truth_coefs(tmp_path):
    """Starting near the identified values, Stage-3 must keep/refine
    coefficients close to truth and fit the data."""
    exp = _small_burgers()
    truth = simulate("burgers", default_ic("burgers", 32, seed=1), 40,
                     exp.dt, exp.dx)
    cfg = burgers_stage3(exp, coef_init=((-0.95, -0.97), (-0.96, -0.98)),
                         nu_init=(0.0048, 0.0052))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, n_iters=150, log_every=100))
    res = run_stage3(cfg, truth, out_dir=str(tmp_path), isg_pretrain_iters=200)
    assert np.isfinite(res["history"]).all()
    assert res["history"][-1] < res["history"][0]
    assert res["rel_l2"] < 0.5
    table = res["coef_table"]
    assert "u*u_x" in table and "lap" in table
    # The advection coefficients must stay near truth.  nu (diffusion) is
    # weakly identifiable at this toy scale (nu*Lap(u) is ~1e-3 of the
    # advection magnitude over 40 steps at 32^2), so it is not asserted
    # here — the full-size parity runs check it.
    adv = {k: v for k, v in res["coef_errors"].items() if not k.startswith("nu")}
    assert max(adv.values()) < 0.15, res["coef_errors"]


def test_lambda_omega_stage3_config_shape():
    exp = _small_burgers()
    cfg = lambda_omega_stage3(exp)
    assert len(cfg.cell.terms[0]) == 5 and len(cfg.cell.terms[1]) == 5
    assert cfg.truth_coef[0]["lap"] == 0.1


def test_identified_to_symbolic_mapping():
    lib = gen_library()
    w_u = np.zeros((70, 1))
    w_v = np.zeros((70, 1))
    w_u[lib.index("ones*lap_u")] = 0.0051
    w_u[lib.index("u*u_x")] = -0.98
    w_u[lib.index("v*u_y")] = -0.99
    w_v[lib.index("ones*lap_v")] = 0.0049
    w_v[lib.index("u*v_x")] = -0.97
    cell, coef_init, nu_init = identified_to_symbolic(w_u, w_v, lib, dt=1e-3, dx=0.01)
    assert cell.terms == (("u*u_x", "v*u_y"), ("u*v_x",))
    assert coef_init == ((-0.98, -0.99), (-0.97,))
    assert nu_init == (0.0051, 0.0049)


def test_mat_roundtrip(tmp_path):
    roll = np.random.RandomState(0).randn(5, 8, 9, 2).astype(np.float32)
    p = str(tmp_path / "uv.mat")
    save_mat_uv(p, roll)
    back = load_mat_uv(p)
    np.testing.assert_allclose(back, roll)
    # reference channel-first layout too
    import scipy.io as sio
    sio.savemat(str(tmp_path / "cf.mat"), {"uv": np.moveaxis(roll, -1, 0)})
    back2 = load_mat_uv(str(tmp_path / "cf.mat"))
    np.testing.assert_allclose(back2, roll)


def test_npz_roundtrip(tmp_path):
    roll = np.random.RandomState(0).randn(3, 4, 4, 2)
    p = str(tmp_path / "uv.npz")
    save_npz(p, roll)
    np.testing.assert_allclose(load_npz(p), roll)


def test_viz_panels(tmp_path):
    pytest.importorskip("matplotlib")
    from percnn_tpu.viz.plots import comparison_panel, save_isosurface_html

    rng = np.random.RandomState(0)
    pred, truth = rng.randn(16, 16, 2), rng.randn(16, 16, 2)
    p = str(tmp_path / "panel.png")
    comparison_panel(pred, truth, p)
    assert os.path.getsize(p) > 0
    q = str(tmp_path / "iso.html")
    save_isosurface_html(rng.randn(8, 8, 8), q)
    assert os.path.exists(q) or os.path.exists(q.replace(".html", ".png"))


def test_pareto_panel(tmp_path):
    """The reference's select_gamma_u.png artifact (LO stage-2
    PDE_FIND_u.py:297-335): run_discovery_pipeline writes one per equation
    whenever the Pareto sweep ran; the viz helper must render the twin-axis
    figure with the knee marked."""
    pytest.importorskip("matplotlib")
    from percnn_tpu.viz.plots import pareto_panel

    gammas = [0.01 * 1.2 ** i for i in range(20)]
    ls = np.linspace(1e-4, 2e-3, 20)
    l0 = np.linspace(40, 5, 20).round()
    p = str(tmp_path / "select_gamma_u.png")
    pareto_panel(gammas, ls, l0, p, selected_gamma=gammas[10], eq="u")
    assert os.path.getsize(p) > 0


def test_cli_list_and_simulate(tmp_path, capsys):
    from percnn_tpu.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "forward_sim_lo" in out and "gs3d_recon" in out

    p = str(tmp_path / "gt.npz")
    assert main(["simulate", "gray_scott_2d", "--grid", "24", "--steps", "5",
                 "--dt", "0.5", "--dx", "0.01", "--out", p]) == 0
    assert load_npz(p).shape == (6, 24, 24, 2)


def test_full_discovery_pipeline_tiny(tmp_path):
    """Stage-1 -> STRidge -> Stage-3 end-to-end on a tiny Burgers problem:
    the pipeline must identify a sparse PDE whose dominant terms are the
    true advection terms, and Stage-3 must run on the identified form."""
    from percnn_tpu.experiments.pipeline import run_discovery_pipeline

    exp = _small_burgers()
    exp = dataclasses.replace(exp, isg_pretrain_iters=100, noise_pct=0.005)
    res = run_discovery_pipeline(
        exp, out_dir=str(tmp_path), cache_dir=None,
        stage1_iters=150, stage3_iters=40,
        stage2_frames=slice(0, 40),
        stage2_kwargs=dict(maxit=12, stridge_iters=15, lam=0.01, d_tol=20,
                           kappa=1.0),
    )
    names = res["stage2"]["names"]
    ident_u = {n: float(c) for n, c in zip(names, res["stage2"]["w_u"][:, 0]) if c}
    # Structural checks only: at this toy scale (400 Stage-1 iters, 32^2)
    # the reconstruction is too weak for reliable term identification —
    # discovery *quality* is asserted by test_discovery_on_simulation and
    # the full-scale pipeline runs (RESULTS.md).
    assert ident_u, "STRidge returned an all-zero model"
    assert res["symbolic_cell"].terms is not None
    assert np.isfinite(res["stage3"]["history"]).all()
    assert os.path.exists(str(tmp_path / "burgers_stage1.stage2_coefs.npz"))
    assert os.path.exists(str(tmp_path / "burgers_stage1.stage1_recon.npz"))


def test_ensemble_discovery_aggregates_and_quantifies_uncertainty(tmp_path):
    """run_ensemble_discovery on pre-saved member reconstructions (same
    underlying field, independent per-member perturbation — the model-bias
    analogue): the aggregate-mean reconstruction's Stage-2 must recover the
    true Burgers support at least as well as the average member, and the
    UQ block must report full support votes + finite coefficient spread
    for the true terms."""
    from percnn_tpu.experiments.pipeline import run_ensemble_discovery

    exp = _small_burgers()
    truth = simulate("burgers", default_ic("burgers", 32, seed=1), 80,
                     exp.dt, exp.dx)
    truth = np.asarray(truth)
    rng = np.random.RandomState(0)
    paths = []
    for k in range(4):
        sigma = 0.02 * truth.std(axis=(0, 1, 2), keepdims=True)
        member = truth + sigma * rng.randn(*truth.shape)
        p = str(tmp_path / f"member{k}.npz")
        save_npz(p, member.astype(np.float32))
        paths.append(p)

    res = run_ensemble_discovery(
        exp, 4, out_dir=str(tmp_path), cache_dir=None,
        member_recons=paths, aggregate="mean",
        stage2_frames=slice(0, 60), stage2_subsample=1.0,
        stage3_iters=30,
    )

    # aggregate Stage-2: true support fully recovered
    m_u = res["stage2"]["metrics_u"]
    assert m_u["recall"] == 1.0
    # averaging same-field members cuts the perturbation ~2x: the aggregate
    # coefficient error must not exceed the mean per-member error
    member_errs = [m["stage2"]["metrics_u"]["rel_l2"] for m in res["members"]]
    assert m_u["rel_l2"] <= np.mean(member_errs) + 1e-9, (
        m_u["rel_l2"], member_errs)

    # UQ block: true terms win every member's vote, finite spread
    names = res["uq"]["names"]
    for term in ("ones*lap_u", "u*u_x", "v*u_y"):
        i = names.index(term)
        assert res["uq"]["support_vote_u"][i] == 1.0
        assert np.isfinite(res["uq"]["coef_std_u"][i])
    assert os.path.exists(str(tmp_path / f"{exp.name}.ens_uq.npz"))
    assert os.path.exists(
        str(tmp_path / f"{exp.name}.stage1_recon.ens_mean.npz"))
    assert np.isfinite(res["stage3"]["history"]).all()


def test_ensemble_discovery_auto_aggregate_guard(tmp_path):
    """aggregate='auto' must score BOTH aggregation modes by truth-free
    member cross-validation and keep the better one (VERDICT round 4: the
    median aggregate silently destroyed Burgers-30% Stage-2, precision
    0.19 vs mean's 1.0 — 'auto' is the guard)."""
    from percnn_tpu.experiments.pipeline import run_ensemble_discovery

    exp = _small_burgers()
    truth = simulate("burgers", default_ic("burgers", 32, seed=1), 80,
                     exp.dt, exp.dx)
    truth = np.asarray(truth)
    rng = np.random.RandomState(0)
    paths = []
    for k in range(3):
        sigma = 0.02 * truth.std(axis=(0, 1, 2), keepdims=True)
        member = truth + sigma * rng.randn(*truth.shape)
        p = str(tmp_path / f"member{k}.npz")
        save_npz(p, member.astype(np.float32))
        paths.append(p)

    res = run_ensemble_discovery(
        exp, 3, out_dir=str(tmp_path), cache_dir=None,
        member_recons=paths, aggregate="auto",
        stage2_frames=slice(0, 60), stage2_subsample=1.0,
        stage3_iters=20,
    )
    cv = res["aggregate_cv"]
    assert set(cv) == {"choice", "mean", "median"}
    assert np.isfinite(cv["mean"]) and np.isfinite(cv["median"])
    assert res["aggregate"] == cv["choice"] == min(
        ("mean", "median"), key=lambda m: cv[m])
    assert os.path.exists(
        str(tmp_path / f"{exp.name}.stage1_recon.ens_{cv['choice']}.npz"))


def test_stage3_from_saved_coefs(tmp_path):
    """Stage-3-only entry (`run_stage3_from_coefs` / CLI --stage2-coefs):
    fine-tune from a saved *.stage2_coefs.npz without Stage-1/2 — the
    reference's hand-paste hand-off (fine_tuning_[5%...].py:123-130) as an
    artifact."""
    from percnn_tpu.experiments.pipeline import run_stage3_from_coefs

    exp = _small_burgers()
    names = gen_library()
    w_u = np.zeros((len(names), 1))
    w_v = np.zeros((len(names), 1))
    for n, c in (("ones*lap_u", 0.0049), ("u*u_x", -0.97), ("v*u_y", -0.96)):
        w_u[names.index(n), 0] = c
    for n, c in (("ones*lap_v", 0.0051), ("u*v_x", -0.98), ("v*v_y", -0.95)):
        w_v[names.index(n), 0] = c
    path = str(tmp_path / "coefs.npz")
    np.savez(path, w_u=w_u, w_v=w_v, names=np.asarray(names))

    res = run_stage3_from_coefs(exp, path, out_dir=str(tmp_path),
                                cache_dir=None, stage3_iters=40)
    assert res["stage1"]["reused_coefs"] == path
    # support flowed through: nu from the lap column, terms from the rest
    assert set(res["symbolic_cell"].terms[0]) == {"u*u_x", "v*u_y"}
    assert set(res["symbolic_cell"].terms[1]) == {"u*v_x", "v*v_y"}
    m = res["stage2"]["metrics_u"]
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    assert np.isfinite(res["stage3"]["history"]).all()
    assert os.path.exists(str(tmp_path / "stage3.ckpt.npz"))
