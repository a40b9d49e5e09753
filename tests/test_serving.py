"""Serving export: StableHLO artifact roundtrip + parity with direct call."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from percnn_tpu.core.cell import (
    PiCellConfig, SymbolicCellConfig, init_pi_cell, init_symbolic_cell,
    pi_cell_step,
)
from percnn_tpu.core.isg import ISGConfig, init_isg
from percnn_tpu.core.rollout import rollout
from percnn_tpu.serving import build_serving_fn, export_model, load_model

CFG = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.5, dx=0.01,
                   diffusion="sigmoid", mu_up=3.99e-5)


def _params(key=0):
    return init_pi_cell(jax.random.PRNGKey(key), CFG)


def test_export_roundtrip_parity(tmp_path):
    params = _params()
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (16, 16, 2), jnp.float32)
    path = str(tmp_path / "model.npz")
    export_model(params, CFG, 5, h0.shape, path=path)
    fn, cfg = load_model(path)
    got = fn(h0)
    want = rollout(lambda h: pi_cell_step(params, h, CFG), h0, 5, remat=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert cfg["n_steps"] == 5 and cfg["cell_kind"] == "PiCellConfig"


def test_export_final_only(tmp_path):
    params = _params()
    h0 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (8, 8, 2), jnp.float32)
    blob = export_model(params, CFG, 7, h0.shape, final_only=True)
    fn, _ = load_model(blob)
    want = rollout(lambda h: pi_cell_step(params, h, CFG), h0, 7, remat=False)[-1]
    np.testing.assert_allclose(np.asarray(fn(h0)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_export_with_isg(tmp_path):
    isg_cfg = ISGConfig(ndim=2, hidden=4, strides=(2,), activation="tanh")
    params = {"cell": _params(), "isg": init_isg(jax.random.PRNGKey(3), isg_cfg)}
    ic_low = 0.2 * jax.random.normal(jax.random.PRNGKey(4), (8, 8, 2), jnp.float32)
    path = str(tmp_path / "isg_model.npz")
    export_model(params, CFG, 3, ic_low.shape, isg_cfg=isg_cfg, path=path)
    fn, cfg = load_model(path)
    out = np.asarray(fn(ic_low))
    assert out.shape == (4, 16, 16, 2)
    direct = build_serving_fn(params, CFG, 3, isg_cfg=isg_cfg)(ic_low)
    np.testing.assert_allclose(out, np.asarray(direct), rtol=1e-6, atol=1e-6)
    assert cfg["isg"]["strides"] == [2]


def test_export_symbolic_cell():
    cell = SymbolicCellConfig(ndim=2, dt=0.00025, dx=0.01,
                              terms=(("u*u_x", "v*u_y"), ("u*v_x", "v*v_y")),
                              integrator="rk4", diffusion="raw")
    params = init_symbolic_cell(jax.random.PRNGKey(5), cell,
                                coef_init=((-1.0, -1.0), (-1.0, -1.0)),
                                nu_init=(0.005, 0.005))
    h0 = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (12, 12, 2), jnp.float32)
    blob = export_model(params, cell, 4, h0.shape)
    fn, _ = load_model(blob)
    direct = build_serving_fn(params, cell, 4)(h0)
    np.testing.assert_allclose(np.asarray(fn(h0)), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)


def test_cli_import_pt_and_export(tmp_path):
    """CLI chain: reference .pt -> framework ckpt -> StableHLO artifact."""
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not present")
    from percnn_tpu.__main__ import main

    ckpt = str(tmp_path / "imported.ckpt.npz")
    art = str(tmp_path / "model.stablehlo.npz")
    assert main(["import-pt",
                 "/root/reference/DataDrivenModeling/2d_gs_rd/model/checkpoint.pt",
                 "--out", ckpt]) == 0
    assert main(["export", "gs2d_recon", "--ckpt", ckpt, "--steps", "3",
                 "--out", art, "--cpu"]) == 0
    fn, cfg = load_model(art)
    ic = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (25, 25, 2), jnp.float32)
    out = np.asarray(fn(ic))
    assert out.shape == (4, 100, 100, 2) and np.isfinite(out).all()
