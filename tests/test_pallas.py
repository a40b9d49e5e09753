"""Pallas fused-kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
from percnn_tpu.core.rollout import rollout
from percnn_tpu.ops.pallas.cell2d import fused_rollout_2d, pad_state_2d, padded_dims


def test_padded_dims():
    assert padded_dims(100, 100) == (104, 128)
    assert padded_dims(4, 4) == (8, 128)


def test_pad_state_halos():
    h0 = jnp.arange(4 * 6 * 2, dtype=jnp.float32).reshape(4, 6, 2)
    s = pad_state_2d(h0)  # [2, Hp, Wp] channel-first
    np.testing.assert_allclose(np.asarray(s[:, 2:6, 2:8]), np.asarray(jnp.moveaxis(h0, -1, 0)))
    # top halo == bottom interior rows
    np.testing.assert_allclose(np.asarray(s[:, 0:2, 2:8]), np.asarray(jnp.moveaxis(h0[2:4], -1, 0)))
    # left halo == right interior cols
    np.testing.assert_allclose(np.asarray(s[:, 2:6, 0:2]), np.asarray(jnp.moveaxis(h0[:, 4:6], -1, 0)))


def _parity(cfg, H, W, steps, atol):
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, steps, remat=False)
    got = fused_rollout_2d(params, h0, cfg, steps, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=atol)


def test_fused_rollout_matches_jnp_gs_cfg():
    cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                       diffusion="sigmoid", mu_up=3.99e-5, init_scale=0.02)
    _parity(cfg, 20, 24, 7, atol=1e-5)


def test_fused_rollout_matches_jnp_lo_cfg():
    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.0125, dx=0.2,
                       diffusion="raw", diff_init=0.2, init="fanin", init_scale=0.5)
    _parity(cfg, 16, 16, 9, atol=1e-5)


def test_fused_rollout_nonaligned_100():
    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.1, dx=0.2,
                       diffusion="raw", diff_init=0.05, init="fanin", init_scale=0.1)
    _parity(cfg, 25, 33, 3, atol=1e-5)


def test_fused_rollout_matches_jnp_burgers_k5_cfg():
    """Burgers/LO Stage-1 shape: 5x5 Pi branches consume the in-state halo
    (incl. the periodically-wrapped corners)."""
    cfg = PiCellConfig(ndim=2, hidden=6, kernel_size=5, dt=0.00025, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.02)
    _parity(cfg, 12, 20, 4, atol=1e-5)


def test_fused_rollout_matches_jnp_k3():
    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=3, dt=0.01, dx=0.1,
                       diffusion="raw", diff_init=0.05, init_scale=0.1)
    _parity(cfg, 10, 14, 4, atol=1e-5)


@pytest.mark.parametrize("diffusion", ["sigmoid", "raw"])
def test_fused_trainable_rollout_k5_gradients_match(diffusion):
    """Fused fwd + hoisted-ys phase-1 backward + direct conv-vjp parameter
    gradients == autodiff for 5x5 cells (both diffusion reparams)."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

    cfg = PiCellConfig(ndim=2, hidden=3, kernel_size=5, dt=0.01, dx=0.1,
                       diffusion=diffusion, mu_up=0.1, init_scale=0.1,
                       diff_init=0.05 if diffusion == "raw" else None)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (10, 12, 2), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (5, 10, 12, 2), jnp.float32)

    def loss_fused(p, h):
        return jnp.mean((fused_rollout_tp_2d(p, h, cfg, 4) - tgt) ** 2)

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 4, remat=False)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_fused(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_fused_rollout_3d_matches_jnp():
    from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.08,
                       diffusion="sigmoid", mu_up=0.274, init_scale=0.01)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 2), jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 5, remat=False)
    got = fused_rollout_3d(params, h0, cfg, 5, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_fused_rollout_3d_final_only_and_unroll():
    """final_only/unroll variants (the bench's no-frame-writes path) must
    agree with the frames path: unrolled frames land in the right slots and
    the final state matches."""
    from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.08,
                       diffusion="sigmoid", mu_up=0.274, init_scale=0.01)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 2),
                                 jnp.float32)
    ref = np.asarray(fused_rollout_3d(params, h0, cfg, 6, interpret=True))
    fr2 = np.asarray(fused_rollout_3d(params, h0, cfg, 6, unroll=2,
                                      interpret=True))
    np.testing.assert_allclose(fr2, ref, rtol=2e-4, atol=1e-5)
    fin = np.asarray(fused_rollout_3d(params, h0, cfg, 6, final_only=True,
                                      interpret=True))
    np.testing.assert_allclose(fin, ref[-1], rtol=2e-4, atol=1e-5)
    fin2 = np.asarray(fused_rollout_3d(params, h0, cfg, 6, final_only=True,
                                       unroll=2, interpret=True))
    np.testing.assert_allclose(fin2, ref[-1], rtol=2e-4, atol=1e-5)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fused_rollout_3d(params, h0, cfg, 5, unroll=2, interpret=True)


def test_fused_rollout_3d_expanded_matches_literal():
    """The expanded-cubic fast path (pack_pi_expanded_3d) is the same math
    reassociated: it must agree with both the literal branch-product kernel
    and the jnp cell step, for the real experiment width (hidden=8)."""
    from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d

    cfg = PiCellConfig(ndim=3, hidden=8, kernel_size=1, dt=0.5, dx=2.08,
                       diffusion="sigmoid", mu_up=0.274, init_scale=0.01)
    params = init_pi_cell(jax.random.PRNGKey(2), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 2),
                                 jnp.float32)
    ref = rollout(lambda h: pi_cell_step(params, h, cfg), h0, 5, remat=False)
    lit = fused_rollout_3d(params, h0, cfg, 5, interpret=True, expanded=False)
    exp = fused_rollout_3d(params, h0, cfg, 5, interpret=True, expanded=True)
    np.testing.assert_allclose(np.asarray(exp), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(exp), np.asarray(lit),
                               rtol=2e-4, atol=1e-5)


def test_fused_rollout_3d_rejects_unaligned():
    from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=2.08)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = jnp.zeros((7, 8, 16, 2), jnp.float32)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fused_rollout_3d(params, h0, cfg, 2, interpret=True)


def test_fused_trainable_rollout_gradients_match():
    """fused fwd+bwd kernels == plain autodiff through the jnp cell."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.05, dx=0.2,
                       diffusion="sigmoid", mu_up=0.1, init_scale=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (12, 20, 2), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (7, 12, 20, 2), jnp.float32)

    def loss_fused(p, h):
        return jnp.mean((fused_rollout_tp_2d(p, h, cfg, 6) - tgt) ** 2)

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 6, remat=False)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_fused(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_fused_trainable_rollout_3d_gradients_match():
    from percnn_tpu.ops.pallas.backward3d import fused_rollout_tp_3d

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.2, dx=1.0,
                       diffusion="sigmoid", mu_up=0.274, init_scale=0.05)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 2), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (6, 8, 8, 16, 2), jnp.float32)

    def loss_fused(p, h):
        return jnp.mean((fused_rollout_tp_3d(p, h, cfg, 5) - tgt) ** 2)

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 5, remat=False)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_fused(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


@pytest.mark.parametrize("kernel_size", [1, 5])
def test_batched_fused_rollout_matches_per_member(kernel_size):
    """(M, T)-grid batched kernels == per-member rollouts, values AND grads."""
    from percnn_tpu.ops.pallas.batched2d import fused_rollout_tp_2d_batched

    cfg = PiCellConfig(ndim=2, hidden=3, kernel_size=kernel_size, dt=0.01,
                       dx=0.1, diffusion="sigmoid", mu_up=0.1, init_scale=0.1)
    M = 3
    ps = [init_pi_cell(jax.random.PRNGKey(i), cfg) for i in range(M)]
    params = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(9), (M, 10, 12, 2), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(10), (M, 4, 10, 12, 2), jnp.float32)

    frames = fused_rollout_tp_2d_batched(params, h0, cfg, 4)
    for m in range(M):
        ref = rollout(lambda h: pi_cell_step(ps[m], h, cfg), h0[m], 4, remat=False)
        np.testing.assert_allclose(np.asarray(frames[m]), np.asarray(ref),
                                   rtol=2e-4, atol=1e-5)

    def loss_b(p, h):
        fr = fused_rollout_tp_2d_batched(p, h, cfg, 4)
        return jnp.mean((fr[:, 1:] - tgt) ** 2)

    def loss_ref(p, h):
        def one(pi, hi, ti):
            fr = rollout(lambda x: pi_cell_step(pi, x, cfg), hi, 4, remat=False)
            return jnp.mean((fr[1:] - ti) ** 2)
        return jnp.mean(jax.vmap(one)(p, h, tgt))

    g1 = jax.grad(loss_b, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_fused_final_matches_full_rollout():
    from percnn_tpu.ops.pallas.cell2d import fused_rollout_final_2d

    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.05, dx=0.2,
                       diffusion="sigmoid", mu_up=0.1, init_scale=0.1)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (12, 20, 2), jnp.float32)
    full = fused_rollout_2d(params, h0, cfg, 6, interpret=True)
    last = fused_rollout_final_2d(params, h0, cfg, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(last), np.asarray(full[-1]),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("diffusion", ["sigmoid", "raw"])
def test_fully_fused_pg_gradients_match(diffusion):
    """In-kernel parameter-gradient accumulation (no XLA phase-2) == autodiff
    for 1x1-Pi cells, both diffusion reparametrisations."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d_pg

    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.05, dx=0.2,
                       diffusion=diffusion, mu_up=0.1,
                       diff_init=0.05 if diffusion == "raw" else None,
                       init_scale=0.3)
    params = init_pi_cell(jax.random.PRNGKey(3), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (10, 12, 2), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(5), (7, 10, 12, 2), jnp.float32)

    def loss_pg(p, h):
        return jnp.mean((fused_rollout_tp_2d_pg(p, h, cfg, 6) - tgt) ** 2)

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 6, remat=False)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_pg(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_pg, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_fully_fused_pg_intermediate_frame_cotangents():
    """Cotangents arriving on intermediate frames (data loss hits every
    frame, not just the last) flow correctly through the fused-pg path."""
    from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d_pg

    cfg = PiCellConfig(ndim=2, hidden=3, kernel_size=1, dt=0.05, dx=0.2,
                       diffusion="sigmoid", mu_up=0.1, init_scale=0.3)
    params = init_pi_cell(jax.random.PRNGKey(6), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (8, 8, 2), jnp.float32)

    def loss_pg(p, h):
        fr = fused_rollout_tp_2d_pg(p, h, cfg, 5)
        return jnp.mean(fr[::2] ** 2) + jnp.sum(fr[1] * fr[3])

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 5, remat=False)
        return jnp.mean(fr[::2] ** 2) + jnp.sum(fr[1] * fr[3])

    g1 = jax.grad(loss_pg, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_batched_fully_fused_pg_gradients_match():
    """Member-batched in-kernel parameter gradients == per-member autodiff."""
    from percnn_tpu.ops.pallas.batched2d import fused_rollout_tp_2d_batched_pg

    cfg = PiCellConfig(ndim=2, hidden=3, kernel_size=1, dt=0.05, dx=0.2,
                       diffusion="sigmoid", mu_up=0.1, init_scale=0.3)
    M = 3
    params = jax.vmap(lambda k: init_pi_cell(k, cfg))(
        jax.random.split(jax.random.PRNGKey(8), M))
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(9), (M, 8, 10, 2),
                                 jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(10), (M, 5, 8, 10, 2),
                            jnp.float32)

    def loss_pg(p, h):
        return jnp.mean((fused_rollout_tp_2d_batched_pg(p, h, cfg, 4) - tgt) ** 2)

    def loss_ref(p, h):
        fr = jax.vmap(lambda pp, hh: rollout(
            lambda x: pi_cell_step(pp, x, cfg), hh, 4, remat=False))(p, h)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_pg(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_pg, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_fully_fused_pg_3d_gradients_match():
    """3D in-kernel parameter gradients == autodiff (flat-layout cell)."""
    from percnn_tpu.ops.pallas.backward3d import fused_rollout_tp_3d_pg

    cfg = PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.05, dx=2.08,
                       diffusion="sigmoid", mu_up=0.3, init_scale=0.3)
    params = init_pi_cell(jax.random.PRNGKey(11), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(12), (8, 8, 16, 2),
                                 jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(13), (5, 8, 8, 16, 2),
                            jnp.float32)

    def loss_pg(p, h):
        return jnp.mean((fused_rollout_tp_3d_pg(p, h, cfg, 4) - tgt) ** 2)

    def loss_ref(p, h):
        fr = rollout(lambda x: pi_cell_step(p, x, cfg), h, 4, remat=False)
        return jnp.mean((fr - tgt) ** 2)

    np.testing.assert_allclose(float(loss_pg(params, h0)),
                               float(loss_ref(params, h0)), rtol=1e-5)
    g1 = jax.grad(loss_pg, argnums=(0, 1))(params, h0)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, h0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-6),
        g1, g2,
    )


def test_mxu_and_vpu_k5_paths_agree():
    """The im2col+dot_general (MXU) forward/backward and the unrolled-FMA
    (VPU) fallback compute the same rollout and the same gradients — both
    toggles must stay correct since the auto path picks per-toolchain."""
    import percnn_tpu.ops.pallas.cell2d as C2
    from percnn_tpu.ops.pallas import backward2d as B

    cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.5,
                       init="fanin")
    params = init_pi_cell(jax.random.PRNGKey(2), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (16, 24, 2),
                                 jnp.float32)

    def loss(p, h):
        fr = B.fused_rollout_tp_2d(p, h, cfg, 5)
        return jnp.mean(fr[1:] ** 2)

    results = {}
    try:
        for mode in ("mxu", "vpu"):
            C2.MXU_FWD_ENABLED = B.MXU_BWD_ENABLED = mode == "mxu"
            fr = fused_rollout_2d(params, h0, cfg, 5)
            g = jax.grad(loss, argnums=(0, 1))(params, h0)
            results[mode] = (fr, g)
    finally:
        C2.MXU_FWD_ENABLED = B.MXU_BWD_ENABLED = True
    np.testing.assert_allclose(np.asarray(results["mxu"][0]),
                               np.asarray(results["vpu"][0]), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        results["mxu"][1], results["vpu"][1])


def test_fused_rollout_matches_jnp_k3_cfg():
    """k=3 exercises the MXU im2col path at a tap count other than 25."""
    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=3, dt=0.01, dx=0.1,
                       diffusion="sigmoid", mu_up=0.05, init_scale=0.1)
    _parity(cfg, 12, 20, 4, atol=1e-5)


def test_vmem_guards_reject_large_grids():
    """Every k>1 kernel-dispatch guard must turn itself off on grids whose
    scratch exceeds VMEM (the paths then fall back to the few-plane VPU /
    in-kernel-recompute kernels instead of failing Mosaic compilation)."""
    from percnn_tpu.core.cell import PiCellConfig
    from percnn_tpu.ops.pallas.backward2d import (
        mxu_bwd_fits_vmem, ys_bwd_fits_vmem,
    )
    from percnn_tpu.ops.pallas.cell2d import mxu_fwd_fits_vmem

    cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=1e-4, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01)
    # the reference Stage-1 workload (100^2) must stay on the fast paths
    assert mxu_fwd_fits_vmem(cfg, (100, 100))
    assert mxu_bwd_fits_vmem(cfg, 100, 100)
    assert ys_bwd_fits_vmem(cfg, 100, 100)
    # a ~800^2 grid exceeds the 90MB scratch budget on every path
    assert not mxu_fwd_fits_vmem(cfg, (800, 800))
    assert not mxu_bwd_fits_vmem(cfg, 800, 800)
    assert not ys_bwd_fits_vmem(cfg, 800, 800)


def test_trainable_forward_vpu_fallback_when_guard_rejects(monkeypatch):
    """When the VMEM guard rejects the MXU forward, fused_rollout_tp_2d must
    fall back to the few-plane VPU kernel and still match the jnp cell
    (a large grid must degrade, not fail Mosaic compilation)."""
    import jax

    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell, pi_cell_step
    from percnn_tpu.ops.pallas import backward2d as B
    from percnn_tpu.ops.pallas import cell2d

    monkeypatch.setattr(cell2d, "mxu_fwd_fits_vmem", lambda cfg, shape: False)
    cfg = PiCellConfig(ndim=2, hidden=4, kernel_size=5, dt=1e-4, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.1,
                       init="fanin")
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (24, 24, 2))
    frames = B.fused_rollout_tp_2d(params, h0, cfg, 3)
    h = h0.astype(jnp.float32)
    for _ in range(3):
        h = pi_cell_step(params, h, cfg)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(h),
                               rtol=2e-4, atol=2e-5)
