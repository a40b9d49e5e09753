"""Ensemble training: K independent PeRCNN fits in one jitted computation.

The reference trains a single model per script on one GPU; quantifying
sensitivity to the measurement-noise realisation or the init seed requires
K sequential runs.  TPU-first version: stack K members on a leading axis,
vmap the loss, and train all members simultaneously — the member axis is
the data-parallel axis and shards over a mesh ('data') with zero code
change (SURVEY §2.3 DP).

Adam is elementwise, so optimising mean_k loss_k trains each member exactly
as it would train alone (the 1/K grad scale cancels in Adam's m/sqrt(v)).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from percnn_tpu.core.train import TrainConfig, pretrain_isg, train
from percnn_tpu.data.noise import add_noise
from percnn_tpu.experiments.configs import ExperimentConfig
from percnn_tpu.experiments.runner import (
    Problem,
    build_isg_pretrain_loss,
    build_loss_fn,
    evaluate,
    init_model,
    make_dataset,
    setup_problem,
)
from percnn_tpu.utils.metrics import MetricsLogger


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _member(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def run_ensemble(
    exp: ExperimentConfig,
    n_members: int,
    *,
    out_dir: str = "runs/ensemble",
    cache_dir: str | None = "data_cache",
    dtype=jnp.float32,
    n_iters_override: int | None = None,
    isg_pretrain_override: int | None = None,
    steps_per_call: int | None = None,
    mesh=None,
    member_axis: str = "data",
    spatial_axes: tuple = (),
    warmup: int | None = None,
    bptt: str = "auto",
    seed: int = 0,
) -> dict:
    """Train `n_members` models (distinct init + noise seeds) in parallel.

    mesh: optional jax Mesh — the member axis of every stacked array/param
    is sharded over `member_axis` (pure DP; each member stays whole).
    spatial_axes: optional mesh axis names for the field dimensions — with
    e.g. mesh ('data','x','y') and spatial_axes=('x','y'), each member is
    ALSO spatially partitioned (3-axis DP x domain decomposition; GSPMD
    inserts the halo collectives).  Params stay member-sharded/spatially
    replicated.  Use bptt='two_phase' (the Pallas paths need whole members).
    bptt: 'auto' picks, for fusable 2D cells on one TPU, a static
    per-member loop of single fused rollouts inside one jit (measured
    fastest: each member runs at single-model fused cost with zero extra
    dispatches — 41 ms vs 64 ms for the (M, T)-grid batched kernel and
    81 ms for vmapped two_phase at M=4, T=800, GS2D shape); otherwise the
    vmapped two-phase path.  Explicit choices: 'fused', 'fused_pg'
    (in-kernel parameter gradients, k=1), 'batched' / 'batched_pg' (the
    (M, T)-grid kernels from ops/pallas/batched2d.py), 'two_phase'.
    Returns per-member and aggregate rel-L2.
    """
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, f"{exp.name}.ens.metrics.jsonl"),
                           echo_every=exp.train.log_every)
    if warmup is None:
        warmup = 100 if exp.system == "lambda_omega" else 0
    truth = make_dataset(exp, warmup=warmup, cache_dir=cache_dir)

    problems = []
    params_list = []
    for k in range(n_members):
        exp_k = dataclasses.replace(exp, seed=exp.seed + k)
        problems.append(setup_problem(exp_k, truth, dtype))
        params_list.append(init_model(exp, jax.random.PRNGKey(seed + k), dtype))
    params = _stack_trees(params_list)

    # stack the per-member device data into one Problem of batched arrays
    def stack_field(name):
        vals = [getattr(p, name) for p in problems]
        return None if vals[0] is None else jnp.stack(vals)

    batched = Problem(exp, truth, stack_field("h0"), stack_field("ic_low"),
                      stack_field("measurement"))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sp, nd = tuple(spatial_axes), exp.cell.ndim

        def put(t, spatial=False):
            def one(x):
                if x is None:
                    return None
                dims = x.shape[x.ndim - 1 - nd:x.ndim - 1]
                fits = all(d % mesh.shape[a] == 0 for d, a in zip(dims, sp))
                if spatial and sp and fits:
                    # member data is [M, ..., *spatial(nd dims), C]: the
                    # spatial dims always sit just before the channel dim
                    # (leading extras: time for measurements, batch for ICs)
                    pad = (None,) * (x.ndim - 2 - nd)
                    spec = P(member_axis, *pad, *sp, None)
                else:
                    # e.g. an odd low-res IC grid: keep it member-sharded,
                    # spatially replicated (GSPMD reshards at the ISG)
                    spec = P(member_axis)
                return jax.device_put(x, NamedSharding(mesh, spec))

            return jax.tree_util.tree_map(one, t)

        params = put(params)  # member-sharded, spatially replicated
        batched = Problem(
            exp, truth,
            put(batched.h0, spatial=True),
            put(batched.ic_low, spatial=True),
            put(batched.measurement, spatial=True))

    arrays = (batched.h0, batched.ic_low, batched.measurement)

    if exp.isg is not None:
        n_pre = (isg_pretrain_override if isg_pretrain_override is not None
                 else exp.isg_pretrain_iters)

        def ens_isg_loss(isg_params):
            def one(isg_p, ic_low):
                prob_i = Problem(exp, truth, None, ic_low, None)
                return build_isg_pretrain_loss(prob_i)(isg_p)

            return jnp.mean(jax.vmap(one)(isg_params, batched.ic_low))

        params["isg"] = pretrain_isg(ens_isg_loss, params["isg"],
                                     n_iters=n_pre, logger=logger)

    if bptt == "auto":
        # the member-batched fused kernels need whole members on one chip
        fusable = (mesh is None and exp.cell.ndim == 2
                   and exp.cell.kernel_size in (1, 3, 5)
                   and dtype == jnp.float32
                   and jax.default_backend() == "tpu")
        from percnn_tpu.ops.pallas.backward2d import pg_fits_vmem

        bptt = ("fused_pg" if fusable and exp.cell.kernel_size == 1
                and pg_fits_vmem(exp.cell, (exp.grid,) * exp.cell.ndim + (2,))
                else "fused" if fusable else "two_phase")

    if bptt not in ("fused", "fused_pg", "batched", "batched_pg", "two_phase"):
        raise ValueError(f"unknown bptt mode {bptt!r}")

    def _member_problem(m):
        return Problem(
            exp, truth,
            None if batched.h0 is None else batched.h0[m],
            None if batched.ic_low is None else batched.ic_low[m],
            None if batched.measurement is None else batched.measurement[m],
        )

    def _combine(params, steps, frames_for):
        """Per-member composite losses from precomputed frames, averaged —
        the one place the ensemble loss is composed (all fused/batched
        modes share it)."""
        totals, auxs = [], []
        for m in range(n_members):
            t_m, a_m = build_loss_fn(
                _member_problem(m), steps,
                rollout_fn=lambda _p, f=frames_for(m): f)(_member(params, m))
            totals.append(t_m)
            auxs.append(a_m)
        aux = {k: jnp.mean(jnp.stack([a[k] for a in auxs])) for k in auxs[0]}
        return jnp.mean(jnp.stack(totals)), aux

    stages = list(exp.curriculum) + [exp.train_steps]
    n_total = n_iters_override if n_iters_override is not None else exp.train.n_iters
    per_stage = max(1, n_total // len(stages))
    arr_axes = tuple(0 if a is not None else None for a in arrays)
    history = []
    for i, steps in enumerate(stages):
        if bptt in ("fused", "fused_pg"):
            from percnn_tpu.core.isg import isg_apply
            from percnn_tpu.ops.pallas.backward2d import (
                fused_rollout_tp_2d, fused_rollout_tp_2d_pg,
            )
            roll = (fused_rollout_tp_2d_pg if bptt == "fused_pg"
                    else fused_rollout_tp_2d)

            def ens_loss(params, steps=steps, roll=roll):
                # static per-member loop of fused rollouts, all inside ONE
                # jitted update: measured faster than both the (M, T)-grid
                # batched kernel (41 vs 64 ms at M=4, T=800, GS2D shape)
                # and vmapped two_phase (81 ms) — each member runs at the
                # single-model fused cost with zero extra dispatches.
                def frames_for(m):
                    p_m = _member(params, m)
                    h0_m = (isg_apply(p_m["isg"], batched.ic_low[m], exp.isg)[0]
                            if exp.isg is not None else batched.h0[m])
                    return roll(p_m["cell"], h0_m, exp.cell, steps)

                return _combine(params, steps, frames_for)
        elif bptt in ("batched", "batched_pg"):
            # the (M, T)-grid kernels: one pallas_call for ALL members
            from percnn_tpu.core.isg import isg_apply
            from percnn_tpu.ops.pallas.batched2d import (
                fused_rollout_tp_2d_batched, fused_rollout_tp_2d_batched_pg,
            )
            broll = (fused_rollout_tp_2d_batched_pg if bptt == "batched_pg"
                     else fused_rollout_tp_2d_batched)

            def ens_loss(params, steps=steps, broll=broll):
                if exp.isg is not None:
                    h0_all = jax.vmap(
                        lambda p, ic: isg_apply(p, ic, exp.isg)[0]
                    )(params["isg"], batched.ic_low)
                else:
                    h0_all = batched.h0
                frames_all = broll(params["cell"], h0_all, exp.cell, steps)
                return _combine(params, steps, lambda m: frames_all[m])
        else:  # two_phase
            def ens_loss(params, steps=steps):
                def one(p, h0, ic_low, meas):
                    prob_i = Problem(exp, truth, h0, ic_low, meas)
                    # two_phase plays cleanly under vmap
                    return build_loss_fn(prob_i, steps, bptt="two_phase")(p)

                totals, auxs = jax.vmap(one, in_axes=(0,) + arr_axes)(
                    params, *arrays)
                return jnp.mean(totals), {k: jnp.mean(v) for k, v in auxs.items()}

        tcfg = dataclasses.replace(
            exp.train,
            n_iters=per_stage if i < len(stages) - 1 else n_total - per_stage * (len(stages) - 1),
            ckpt_path=os.path.join(out_dir, f"{exp.name}.ens.ckpt.npz"),
            **({"steps_per_call": steps_per_call} if steps_per_call else {}),
        )
        params, h = train(ens_loss, params, tcfg, logger=logger)
        history.extend(h)

    rel = []
    n_eval = min(exp.infer_steps, truth.shape[0] - 1)
    for k in range(n_members):
        m = evaluate(_member(params, k), problems[k], n_eval)
        rel.append(m["rel_l2"])
    rel = np.asarray(rel)
    result = {
        "params": params,
        "history": history,
        "rel_l2_members": rel.tolist(),
        "rel_l2_mean": float(rel.mean()),
        "rel_l2_std": float(rel.std()),
    }
    logger.log(n_total, rel_l2_mean=result["rel_l2_mean"],
               rel_l2_std=result["rel_l2_std"])
    logger.close()
    return result
