"""Ensemble (DP) training: K members in one jit, optionally mesh-sharded."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.experiments.configs import GS2D_RECON, FORWARD_SIM_LO
from percnn_tpu.experiments.ensemble import run_ensemble
from percnn_tpu.parallel.mesh import make_mesh


def _tiny(exp):
    return dataclasses.replace(
        exp,
        grid=32, train_steps=24, infer_steps=24, curriculum=(),
        cell=dataclasses.replace(exp.cell, hidden=4),
        data=dataclasses.replace(exp.data, time_stride=8, space_stride=4)
        if exp.data else None,
        train=dataclasses.replace(exp.train, n_iters=40, log_every=40),
        isg_pretrain_iters=80,
    )


def test_ensemble_data_driven(tmp_path):
    exp = _tiny(GS2D_RECON)
    res = run_ensemble(exp, 3, out_dir=str(tmp_path), cache_dir=None, seed=0)
    assert len(res["rel_l2_members"]) == 3
    assert np.isfinite(res["rel_l2_members"]).all()
    assert np.isfinite(res["history"]).all()
    # distinct seeds => members differ
    assert len(set(np.round(res["rel_l2_members"], 8))) > 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_ensemble_sharded_over_mesh(tmp_path):
    exp = _tiny(GS2D_RECON)
    mesh = make_mesh(("data",), shape=(4,), devices=jax.devices()[:4])
    res = run_ensemble(exp, 4, out_dir=str(tmp_path), cache_dir=None,
                       mesh=mesh, seed=0)
    assert len(res["rel_l2_members"]) == 4
    assert np.isfinite(res["history"]).all()


def test_ensemble_fused_path_matches_two_phase(tmp_path):
    """The fused per-member-loop path (Pallas, interpret on CPU) trains to
    the same members as vmapped two_phase — same data, seeds, iterations."""
    exp = dataclasses.replace(
        _tiny(GS2D_RECON), grid=16,
        data=dataclasses.replace(GS2D_RECON.data, time_stride=8, space_stride=2),
        train=dataclasses.replace(GS2D_RECON.train, n_iters=3, log_every=10),
        isg_pretrain_iters=5,
    )
    r_fused = run_ensemble(exp, 2, out_dir=str(tmp_path / "f"), cache_dir=None,
                           bptt="fused", seed=0)
    r_tp = run_ensemble(exp, 2, out_dir=str(tmp_path / "t"), cache_dir=None,
                        bptt="two_phase", seed=0)
    np.testing.assert_allclose(r_fused["rel_l2_members"],
                               r_tp["rel_l2_members"], rtol=1e-4)
    np.testing.assert_allclose(r_fused["history"], r_tp["history"], rtol=1e-4)


def test_ensemble_forward_sim(tmp_path):
    """Forward-sim ensemble (no ISG, physics loss only): h0 identical across
    members (IC comes from truth), model init seeds differ."""
    exp = _tiny(FORWARD_SIM_LO)
    res = run_ensemble(exp, 2, out_dir=str(tmp_path), cache_dir=None,
                       warmup=30, seed=0)
    assert len(res["rel_l2_members"]) == 2
    assert np.isfinite(res["history"]).all()


def test_ensemble_batched_modes_run(tmp_path):
    """Opt-in (M, T)-grid batched kernels train end-to-end (interpret on CPU)."""
    import dataclasses
    import jax.numpy as jnp
    from percnn_tpu.experiments.configs import GS2D_RECON
    from percnn_tpu.experiments.ensemble import run_ensemble

    exp = dataclasses.replace(
        GS2D_RECON, grid=16, train_steps=6, infer_steps=6, curriculum=(),
        train=dataclasses.replace(GS2D_RECON.train, n_iters=2, log_every=1),
        isg_pretrain_iters=5)
    for mode in ("batched", "batched_pg"):
        res = run_ensemble(exp, 2, out_dir=str(tmp_path / mode),
                           cache_dir=str(tmp_path / "cache"),
                           n_iters_override=2, isg_pretrain_override=5,
                           bptt=mode, seed=0)
        assert len(res["rel_l2_members"]) == 2
