"""Sharded execution: explicit shard_map rollout + GSPMD training helpers.

Two complementary paths (SURVEY §2.3):

1. `sharded_rollout_nd` — explicit domain decomposition: `shard_map` over a
   spatial mesh (('x','y') in 2D, ('x','y','z') in 3D), each device scans
   its block locally, exchanging a 2-cell halo per step via `lax.ppermute`
   over ICI (parallel/halo.py).
   Deterministic communication schedule, used for large-grid inference and
   as the template for the multi-chip Pallas kernel.

2. `make_train_step_spmd` / `shard_array` — GSPMD: the existing jnp model
   runs under jit with NamedSharding'd inputs; XLA auto-partitions the
   rolls/slices (inserting collective-permutes) and the psum for the loss
   reduction.  This covers full training steps (ISG + rollout + losses +
   BPTT) with zero model changes — the idiomatic JAX scaling recipe.

Data parallelism composes on top: vmap the rollout/loss over a leading
batch axis and shard that axis over a 'data' mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from percnn_tpu.core.cell import PiCellConfig, pi_cell_step_valid
from percnn_tpu.core.rollout import rollout
from percnn_tpu.parallel.halo import halo_exchange

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=check_rep)


def pi_cell_step_haloed(
    params: dict,
    block: jnp.ndarray,
    cfg: PiCellConfig,
    *,
    axis_names: tuple,
    axis_sizes: tuple,
    impl: str = "jnp",
) -> jnp.ndarray:
    """One Euler step on a local block [*local_spatial, C] with halo
    exchange.  Works for 1x1 Pi cells (pointwise) and 5x5 Pi cells (the
    exchanged corners make the haloed block valid for full kernels).

    impl='pallas' (2D): halo exchange over ICI then the fused local Pallas
    step (ops/pallas/sharded_step2d.py) — the multi-chip production path.
    Trainable: the Pallas step carries a custom VJP whose adjoint is the
    exact jnp valid-region step, so BPTT crosses the halo exchange."""
    nd = cfg.ndim
    axes = tuple(range(nd))
    xp = halo_exchange(block, halo=2, axis_names=axis_names,
                       axis_sizes=axis_sizes, array_axes=axes)
    if impl == "pallas":
        from percnn_tpu.ops.pallas.sharded_step2d import pallas_step_haloed

        return pallas_step_haloed(params, xp, cfg)
    return pi_cell_step_valid(params, xp, cfg)


def sharded_rollout_nd(
    params: dict,
    h0: jnp.ndarray,
    cfg: PiCellConfig,
    n_steps: int,
    mesh: Mesh,
    *,
    axis_names: tuple | None = None,
    remat: bool = True,
    impl: str = "jnp",
) -> jnp.ndarray:
    """Domain-decomposed rollout: h0 [*spatial, C] (sharded or global) ->
    frames [n_steps+1, *spatial, C] sharded over the mesh's spatial axes.

    Works for any spatial rank matching ``cfg.ndim`` (2D over ('x','y'),
    3D over ('x','y','z'), ...).  ``axis_names`` defaults to the first
    ``cfg.ndim`` mesh axis names.

    impl='pallas' runs each device's local step as the fused Pallas kernel
    (2D k=1 only; halo exchange stays on the XLA side via ppermute)."""
    if axis_names is None:
        axis_names = tuple(mesh.axis_names)[: cfg.ndim]
    if len(axis_names) != cfg.ndim:
        raise ValueError(
            f"need {cfg.ndim} mesh axes for a {cfg.ndim}D rollout, got {axis_names}"
        )
    sizes = tuple(mesh.shape[a] for a in axis_names)
    state_spec = P(*axis_names, None)

    def run(p, block):
        step = lambda h: pi_cell_step_haloed(
            p, h, cfg, axis_names=axis_names, axis_sizes=sizes, impl=impl
        )
        return rollout(step, block, n_steps, remat=remat)

    fn = shard_map(
        run, mesh,
        in_specs=(P(), state_spec),
        out_specs=P(None, *axis_names, None),
    )
    return fn(params, h0)


def shard_array(x: jnp.ndarray, mesh: Mesh, spec: P) -> jnp.ndarray:
    """Place an array with a NamedSharding (GSPMD input annotation)."""
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def make_train_step_spmd(loss_fn, tx, mesh: Mesh, *, param_spec: P = P()):
    """Jitted SPMD (GSPMD-partitioned) train step.

    Batch-array shardings propagate from the inputs; params, grads and
    optimizer state are explicitly pinned to ``param_spec`` (replicated by
    default) via sharding constraints, so correctness does not depend on
    propagation even when params are donated or re-created inside jit.

    loss_fn(params, batch) -> (loss, aux); batch arrays carry NamedShardings.
    """
    p_sharding = NamedSharding(mesh, param_spec)

    def pin(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, p_sharding)
            if hasattr(x, "ndim") else x,
            tree,
        )

    @jax.jit
    def step(params, opt_state, batch, lr):
        params = pin(params)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        grads = pin(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = pin(jax.tree_util.tree_map(lambda p, u: p + u, params, updates))
        return params, pin(opt_state), total, aux

    return step
