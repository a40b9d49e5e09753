"""Multi-device tests on the 8-virtual-CPU-device mesh: halo-exchange
rollout parity vs single-device, GSPMD train step, DP batching."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
from percnn_tpu.core.rollout import rollout
from percnn_tpu.parallel.mesh import factor_devices, make_mesh
from percnn_tpu.parallel.sharded import (
    sharded_rollout_nd,
    shard_array,
    replicate,
    make_train_step_spmd,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")


def test_factor_devices():
    assert factor_devices(8, 2) == (4, 2)
    assert factor_devices(8, 3) == (2, 2, 2)
    assert factor_devices(7, 2) == (7, 1)
    assert factor_devices(1, 2) == (1, 1)


def _cfg(k=1):
    return PiCellConfig(ndim=2, hidden=4, kernel_size=k, dt=0.01, dx=0.1,
                        diffusion="raw", diff_init=0.05, init_scale=0.1)


@pytest.mark.parametrize("kernel_size", [1, 5])
def test_sharded_rollout_matches_single_device(kernel_size):
    cfg = _cfg(kernel_size)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (16, 32, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 5, remat=False)
    mesh = make_mesh(("x", "y"), shape=(2, 4))
    got = sharded_rollout_nd(params, h0, cfg, 5, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sharded_rollout_uneven_mesh():
    cfg = _cfg(1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (24, 16, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 4, remat=False)
    mesh = make_mesh(("x", "y"), shape=(4, 2))
    got = sharded_rollout_nd(params, h0, cfg, 4, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_gspmd_train_step_matches_single_device():
    """One Adam step under GSPMD spatial sharding == the unsharded step."""
    cfg = _cfg(1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (16, 16, 2), jnp.float32)
    target = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (5, 16, 16, 2), jnp.float32)

    def loss_fn(p, batch):
        h, tgt = batch
        frames = rollout(lambda x: pi_cell_step(p, x, cfg), h, 5, remat=False)
        l = jnp.mean((frames[1:] - tgt) ** 2)
        return l, {"l": l}

    tx = optax.scale_by_adam()
    # single device reference
    opt0 = tx.init(params)
    (l_ref, _), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params, (h0, target))

    mesh = make_mesh(("x", "y"), shape=(2, 4))
    h0_s = shard_array(h0, mesh, P("x", "y", None))
    tgt_s = shard_array(target, mesh, P(None, "x", "y", None))
    params_s = replicate(params, mesh)
    step = make_train_step_spmd(loss_fn, tx, mesh)
    p2, o2, l2, aux2 = step(params_s, tx.init(params_s), (h0_s, tgt_s), 1e-3)
    np.testing.assert_allclose(float(l2), float(l_ref), rtol=1e-5)
    # apply same update on host for one leaf and compare
    upd, _ = tx.update(g_ref, opt0, params)
    ref_leaf = params["pi"][0]["w0"] - 1e-3 * upd["pi"][0]["w0"]
    np.testing.assert_allclose(np.asarray(p2["pi"][0]["w0"]), np.asarray(ref_leaf),
                               rtol=1e-4, atol=1e-6)


def test_data_parallel_vmap_rollout():
    """DP: vmap over a batch of ICs sharded on a 'data' axis."""
    cfg = _cfg(1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    batch = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (8, 8, 16, 2), jnp.float32)
    mesh = make_mesh(("data",), shape=(8,))
    batch_s = shard_array(batch, mesh, P("data", None, None, None))

    @jax.jit
    def run(p, b):
        return jax.vmap(lambda h: rollout(lambda x: pi_cell_step(p, x, cfg), h, 3,
                                          remat=False))(b)

    out = run(replicate(params, mesh), batch_s)
    assert out.shape == (8, 4, 8, 16, 2)
    ref0 = rollout(lambda x: pi_cell_step(params, x, cfg), batch[0], 3, remat=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref0), rtol=1e-5, atol=1e-6)

@pytest.mark.parametrize("kernel_size", [1, 5])
def test_sharded_rollout_3d_matches_single_device(kernel_size):
    """3D domain decomposition on a (2,2,2) mesh == single-device rollout."""
    cfg = PiCellConfig(ndim=3, hidden=4, kernel_size=kernel_size, dt=0.01,
                       dx=0.1, diffusion="raw", diff_init=0.05, init_scale=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (8, 12, 16, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 3, remat=False)
    mesh = make_mesh(("x", "y", "z"), shape=(2, 2, 2))
    got = sharded_rollout_nd(params, h0, cfg, 3, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sharded_rollout_nd_axis_names_default_from_mesh():
    """axis_names defaults to the first ndim mesh axes; extra axes ignored."""
    cfg = _cfg(1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (16, 16, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 3, remat=False)
    mesh = make_mesh(("x", "y"), shape=(2, 4))
    got = sharded_rollout_nd(params, h0, cfg, 3, mesh, axis_names=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kernel_size", [1, 5])
def test_sharded_rollout_pallas_impl_matches(kernel_size):
    """Halo exchange (ppermute) + local fused Pallas step == single device."""
    cfg = _cfg(kernel_size)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (16, 32, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 4, remat=False)
    mesh = make_mesh(("x", "y"), shape=(2, 4))
    got = sharded_rollout_nd(params, h0, cfg, 4, mesh, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Gradient flow through the explicit ppermute halo path (SURVEY §2.3: the
# TPU-native equivalent of the reference's periodic-pad layer lives inside
# the *training* graph, train_2drd.py:108-109 — so BPTT must cross the halo
# exchange).  The transpose of ppermute is ppermute with the inverted
# permutation; these tests pin that the whole reverse sweep (remat scan +
# halo exchange + VALID stencils) matches single-device autodiff.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel_size,impl", [(1, "jnp"), (5, "jnp"),
                                              (1, "pallas"), (5, "pallas")])
def test_sharded_rollout_grad_matches_2d(kernel_size, impl):
    """BPTT through the ppermute halo path == single-device autodiff.

    impl='pallas' exercises the custom-VJP fused local step
    (ops/pallas/sharded_step2d.py): Pallas forward, jnp valid-region
    adjoint — the multi-chip *training* production path."""
    cfg = _cfg(kernel_size)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (16, 32, 2), jnp.float32)
    tgt = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (6, 16, 32, 2), jnp.float32)
    mesh = make_mesh(("x", "y"), shape=(2, 4))

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 5)
        return jnp.mean((fr - tgt) ** 2)

    def loss_halo(p, h):
        fr = sharded_rollout_nd(p, h, cfg, 5, mesh, impl=impl)
        return jnp.mean((fr - tgt) ** 2)

    (l1, g1) = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))(params, h0)
    (l2, g2) = jax.jit(jax.value_and_grad(loss_halo, argnums=(0, 1)))(params, h0)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-7),
        g2, g1,
    )


def test_sharded_rollout_grad_matches_3d():
    cfg = PiCellConfig(ndim=3, hidden=4, kernel_size=1, dt=0.01, dx=0.1,
                       diffusion="raw", diff_init=0.05, init_scale=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (8, 12, 16, 2), jnp.float32)
    tgt = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (4, 8, 12, 16, 2),
                                  jnp.float32)
    mesh = make_mesh(("x", "y", "z"), shape=(2, 2, 2))

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 3)
        return jnp.mean((fr - tgt) ** 2)

    def loss_halo(p, h):
        fr = sharded_rollout_nd(p, h, cfg, 3, mesh)
        return jnp.mean((fr - tgt) ** 2)

    (l1, g1) = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))(params, h0)
    (l2, g2) = jax.jit(jax.value_and_grad(loss_halo, argnums=(0, 1)))(params, h0)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-7),
        g2, g1,
    )


def test_halo_train_step_matches_single_device():
    """One Adam step whose rollout is the explicit shard_map halo path ==
    the unsharded step (multi-chip *training* over ICI, not just GSPMD)."""
    cfg = _cfg(1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (16, 16, 2), jnp.float32)
    target = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (5, 16, 16, 2),
                                     jnp.float32)
    mesh = make_mesh(("x", "y"), shape=(2, 4))

    def loss_single(p, batch):
        h, tgt = batch
        frames = rollout(lambda x: pi_cell_step(p, x, cfg), h, 5, remat=False)
        l = jnp.mean((frames[1:] - tgt) ** 2)
        return l, {"l": l}

    def loss_halo(p, batch):
        h, tgt = batch
        frames = sharded_rollout_nd(p, h, cfg, 5, mesh)
        l = jnp.mean((frames[1:] - tgt) ** 2)
        return l, {"l": l}

    tx = optax.scale_by_adam()
    (l_ref, _), g_ref = jax.value_and_grad(loss_single, has_aux=True)(
        params, (h0, target))
    upd, _ = tx.update(g_ref, tx.init(params), params)
    ref_leaf = params["pi"][0]["w0"] - 1e-3 * upd["pi"][0]["w0"]

    h0_s = shard_array(h0, mesh, P("x", "y", None))
    tgt_s = shard_array(target, mesh, P(None, "x", "y", None))
    params_s = replicate(params, mesh)
    step = make_train_step_spmd(loss_halo, tx, mesh)
    p2, o2, l2, aux2 = step(params_s, tx.init(params_s), (h0_s, tgt_s), 1e-3)
    np.testing.assert_allclose(float(l2), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2["pi"][0]["w0"]),
                               np.asarray(ref_leaf), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Multi-chip training through the PUBLIC experiment API (run_experiment
# mesh=...): the full data -> train -> eval pipeline spatially sharded, not
# just a hand-built train step.  Mirrors `python -m percnn_tpu run <exp>
# --mesh 2,4`.
# ---------------------------------------------------------------------------


def _small_forward_exp():
    import dataclasses
    from percnn_tpu.experiments import FORWARD_SIM_LO

    return dataclasses.replace(
        FORWARD_SIM_LO, grid=48, train_steps=16, infer_steps=24,
        train=dataclasses.replace(FORWARD_SIM_LO.train, n_iters=30,
                                  log_every=1000),
    )


@pytest.mark.parametrize("impl", ["halo", "gspmd"])
def test_run_experiment_mesh_matches_single_device(impl, tmp_path):
    from percnn_tpu.experiments.runner import run_experiment

    exp = _small_forward_exp()
    kw = dict(cache_dir=str(tmp_path / "cache"), warmup=40, seed=0)
    ref = run_experiment(exp, out_dir=str(tmp_path / "single"), **kw)
    mesh = make_mesh(("x", "y"), shape=(2, 4))
    got = run_experiment(exp, out_dir=str(tmp_path / impl), mesh=mesh,
                         parallel_impl=impl, **kw)
    # the sharded reverse sweep is a different (but parity-tested) gradient
    # path; trajectories agree closely early and stay in the same basin
    np.testing.assert_allclose(got["history"][:5], ref["history"][:5],
                               rtol=1e-4)
    assert abs(got["rel_l2"] - ref["rel_l2"]) < 2e-2
    assert got["rel_l2"] < 0.6  # training moved (init is ~O(1))


def test_run_experiment_mesh_data_driven(tmp_path):
    """ISG + data/ic losses under the halo mesh: the reconstruction
    workload (train_2drd.py) trains spatially sharded end-to-end."""
    import dataclasses
    from percnn_tpu.experiments import GS2D_RECON
    from percnn_tpu.experiments.runner import run_experiment

    exp = dataclasses.replace(
        GS2D_RECON, grid=32, train_steps=16, infer_steps=16, curriculum=(),
        isg_pretrain_iters=40,
        train=dataclasses.replace(GS2D_RECON.train, n_iters=20,
                                  log_every=1000),
    )
    mesh = make_mesh(("x", "y"), shape=(2, 4))
    res = run_experiment(exp, out_dir=str(tmp_path / "out"),
                         cache_dir=str(tmp_path / "cache"), warmup=0,
                         seed=0, mesh=mesh)
    assert np.isfinite(res["history"]).all()
    assert np.isfinite(res["rel_l2"])


def test_ensemble_dp_spatial_3axis_mesh(tmp_path):
    """Full 3-axis mesh (DP members x spatial domain decomposition) through
    the public ensemble API: each member is spatially partitioned via GSPMD
    (spatial_axes) while the member axis shards as DP.  Per-member rel-L2
    must match the unsharded ensemble (same seeds, same two_phase path)."""
    import dataclasses
    from percnn_tpu.experiments import GS2D_RECON
    from percnn_tpu.experiments.ensemble import run_ensemble

    exp = dataclasses.replace(
        GS2D_RECON, grid=16, train_steps=6, infer_steps=6, curriculum=(),
        isg_pretrain_iters=5,
        train=dataclasses.replace(GS2D_RECON.train, n_iters=4, log_every=100))
    kw = dict(cache_dir=str(tmp_path / "cache"), n_iters_override=4,
              isg_pretrain_override=5, bptt="two_phase", seed=0)
    ref = run_ensemble(exp, 2, out_dir=str(tmp_path / "single"), **kw)
    mesh = make_mesh(("data", "x", "y"), shape=(2, 2, 2))
    got = run_ensemble(exp, 2, out_dir=str(tmp_path / "mesh3"), mesh=mesh,
                       spatial_axes=("x", "y"), **kw)
    np.testing.assert_allclose(got["rel_l2_members"], ref["rel_l2_members"],
                               rtol=1e-3)
    np.testing.assert_allclose(got["history"], ref["history"], rtol=1e-3)
