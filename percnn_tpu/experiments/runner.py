"""Experiment runner: composes data, model, losses and trainer per config.

Call stacks mirror the reference entry points (SURVEY §3) but share one
implementation:
- forward sim  : truth IC -> PiCell rollout -> physics loss      (§3.1)
- data-driven  : noisy low-res IC -> ISG -> rollout -> data+ic   (§3.2)
- stage-3      : same but SymbolicCell with Stage-2 coefficients (§3.3)
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from percnn_tpu.core.cell import (
    PiCellConfig,
    SymbolicCellConfig,
    init_pi_cell,
    init_symbolic_cell,
    pi_cell_step,
    symbolic_cell_step,
)
from percnn_tpu.core.isg import init_isg, isg_apply
from percnn_tpu.core.losses import DataLossConfig, data_loss, ic_loss, phys_loss, mse
from percnn_tpu.core.rollout import rollout, rollout_tp
from percnn_tpu.core.train import TrainConfig, pretrain_isg, train
from percnn_tpu.data.noise import add_noise
from percnn_tpu.data.simulate import default_ic, simulate
from percnn_tpu.experiments.configs import ExperimentConfig
from percnn_tpu.ops.interp import resize_align_corners
from percnn_tpu.pde.systems import PDE_SYSTEMS
from percnn_tpu.utils.metrics import MetricsLogger, rel_l2


def make_dataset(exp: ExperimentConfig, *, n_frames: int | None = None,
                 warmup: int = 0, oversample: int = 4, cache_dir: str | None = None):
    """Ground-truth rollout [T+1, *spatial, 2] for the experiment's system.

    warmup: extra initial steps discarded (lets lambda-omega reach its
    spiral attractor the way the reference uses snapshot #100 of its
    dataset as IC, percnn_LO_eqn.py:483-486).
    """
    n = exp.grid
    n_frames = n_frames if n_frames is not None else max(exp.train_steps, exp.infer_steps)
    cache = None
    if cache_dir:
        # v2: burgers ICs became zero-mean (data/simulate.py); key carries
        # every input that changes the trajectory
        cache = os.path.join(
            cache_dir,
            f"{exp.system}_{n}_{n_frames}_{warmup}_{oversample}"
            f"_dt{exp.dt}_dx{round(exp.dx, 8)}_s{exp.seed}_v2.npz",
        )
        if os.path.exists(cache):
            try:
                return np.load(cache)["truth"]
            except Exception:  # half-written cache (killed mid-save): rebuild
                os.remove(cache)
    h0 = default_ic(exp.system, n, seed=exp.seed)
    if warmup:
        h0 = simulate(exp.system, h0, warmup, exp.dt, exp.dx, oversample=oversample)[-1]
    truth = simulate(exp.system, h0, n_frames, exp.dt, exp.dx, oversample=oversample)
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache + f".tmp{os.getpid()}.npz"  # .npz: savez won't re-suffix
        np.savez_compressed(tmp, truth=truth)
        os.replace(tmp, cache)  # atomic: readers never see a partial file
    return truth


@dataclasses.dataclass
class Problem:
    """Everything the loss needs, device-resident."""

    exp: ExperimentConfig
    truth: np.ndarray          # [T+1, *spatial, 2] clean (for eval)
    h0: jnp.ndarray | None     # full-res IC (forward sim) or None
    ic_low: jnp.ndarray | None # low-res noisy IC (data-driven) or None
    measurement: jnp.ndarray | None  # subsampled noisy truth or None


def setup_problem(exp: ExperimentConfig, truth: np.ndarray, dtype=jnp.float32) -> Problem:
    noisy = add_noise(truth, exp.noise_pct, seed=exp.seed)
    nd = exp.cell.ndim
    if exp.isg is None:
        return Problem(exp, truth, jnp.asarray(truth[0], dtype), None, None)
    scale = exp.isg.scale
    down = (slice(None, None, scale),) * nd
    ic_low = jnp.asarray(noisy[0][down], dtype)[None]  # [1, *low, 2]
    meas = None
    if exp.data is not None:
        t_sl = slice(0, -1 if exp.data.drop_last_frame else None, exp.data.time_stride)
        idx = (t_sl,) + (slice(None, None, exp.data.space_stride),) * nd
        meas = jnp.asarray(noisy[: exp.train_steps + 1][idx], dtype)
    return Problem(exp, truth, None, ic_low, meas)


def init_model(exp: ExperimentConfig, key, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    params = {"cell": init_pi_cell(k1, exp.cell, dtype)}
    if exp.isg is not None:
        params["isg"] = init_isg(k2, exp.isg, dtype)
    return params


def forward_rollout(params: dict, prob: Problem, n_steps: int, *, remat=True,
                    bptt: str = "auto", ic_low=None, h0=None):
    """ISG (if present) then rollout; returns frames [n_steps+1, *spatial, 2].

    ic_low/h0 override the Problem's device arrays — used when the data is
    passed through jit as an argument instead of a baked constant.

    bptt:
      'auto'      — where the Pallas kernels apply (f32 on TPU; 2D any
                    odd k<=5, 3D k=1 tile-aligned): 'fused_pg' for k=1
                    cells whose gradient accumulators fit VMEM, else
                    'fused'; otherwise 'two_phase';
      'fused'     — Pallas forward + Pallas reverse-sweep backward,
                    XLA phase-2 parameter gradients (backward2d/3d.py);
      'fused_pg'  — fully fused: parameter gradients also accumulate
                    inside the backward kernel (k=1 cells, 2D + aligned
                    3D — no XLA phase-2);
      'two_phase' — jnp forward + custom-VJP backward (core/rollout.py);
      'remat'     — segmented jax.checkpoint through the scan.
    """
    exp = prob.exp
    if exp.isg is not None:
        ic_low = prob.ic_low if ic_low is None else ic_low
        h0 = isg_apply(params["isg"], ic_low, exp.isg)[0]
    elif h0 is None:
        h0 = prob.h0
    cell = exp.cell
    if bptt == "auto":
        aligned3d = (cell.ndim == 3 and h0.shape[0] % 8 == 0
                     and (h0.shape[1] * h0.shape[2]) % 128 == 0)
        # 2D kernels fuse any odd Pi kernel with radius <= the in-state halo
        # (1x1 and the Burgers/LO 5x5); 3D fusion is k=1 only.
        fusable_k = (cell.kernel_size % 2 == 1 and cell.kernel_size <= 5
                     if cell.ndim == 2 else cell.kernel_size == 1)
        fused_ok = (fusable_k and h0.dtype == jnp.float32
                    and jax.default_backend() == "tpu"
                    and (cell.ndim == 2 or aligned3d))
        # fused_pg preferred for k=1 cells (2D and aligned 3D): in-kernel
        # f32 VPU gradient accumulation measures 5e-6 worst-leaf vs f64
        # truth where TPU autodiff's bf16-multiply matmul path measures
        # 3e-3 (examples/debug_pg.py), and removing the XLA phase-2 is
        # also faster — 5.2x for the GS3D workload (10.6 vs 54.9 ms/iter,
        # T=300 48^3).  Large grids whose accumulator planes exceed the
        # kernel VMEM budget keep the hybrid path.
        from percnn_tpu.ops.pallas.backward2d import pg_fits_vmem

        bptt = ("fused_pg" if fused_ok and cell.kernel_size == 1
                and pg_fits_vmem(cell, h0.shape)
                else "fused" if fused_ok else "two_phase")
    if bptt == "fused_pg":
        if cell.ndim == 2:
            from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d_pg

            return fused_rollout_tp_2d_pg(params["cell"], h0, cell, n_steps)
        from percnn_tpu.ops.pallas.backward3d import fused_rollout_tp_3d_pg

        return fused_rollout_tp_3d_pg(params["cell"], h0, cell, n_steps)
    if bptt == "fused":
        if cell.ndim == 2:
            from percnn_tpu.ops.pallas.backward2d import fused_rollout_tp_2d

            return fused_rollout_tp_2d(params["cell"], h0, cell, n_steps)
        from percnn_tpu.ops.pallas.backward3d import fused_rollout_tp_3d

        return fused_rollout_tp_3d(params["cell"], h0, cell, n_steps)
    if bptt == "two_phase":
        return rollout_tp(_cell_step_for(cell), params["cell"], h0, n_steps)
    step = lambda h: pi_cell_step(params["cell"], h, cell)
    return rollout(step, h0, n_steps, remat=remat)


@functools.lru_cache(maxsize=None)
def _cell_step_for(cell_cfg):
    """Stable (hashable-config-keyed) step closure so custom_vjp/jit caches
    hit across trainer steps."""
    return lambda p, h: pi_cell_step(p, h, cell_cfg)


def problem_data(prob: Problem) -> dict:
    """The Problem's device arrays as a pytree suitable for passing through
    jit as an ARGUMENT (train(..., loss_args=(problem_data(prob),))).
    Keeps the compiled training step independent of the dataset / noise
    draw, so the persistent compilation cache hits across runs that share
    an experiment shape (each noise level of the 0-30% matrix would
    otherwise recompile a fresh ~10-min step with the measurements baked
    in as HLO constants)."""
    return {k: v for k, v in (("h0", prob.h0), ("ic_low", prob.ic_low),
                              ("meas", prob.measurement)) if v is not None}


def build_loss_fn(prob: Problem, n_steps: int, *, bptt: str = "auto",
                  rollout_fn=None):
    """Composite loss per the experiment's weights; aux carries every
    component plus 'val' (holdout data MSE) and 'phy' (residual metric).

    The returned loss_fn(params, data=None) optionally takes the
    ``problem_data(prob)`` pytree as a jit argument; with data=None the
    Problem's arrays are closed over (baked into the graph as constants —
    fine for one-off runs, recompiles per dataset).

    rollout_fn(params) -> frames overrides forward_rollout (used by the
    ensemble trainer to inject the member-batched fused rollout and by the
    mesh paths; those close over their own data)."""
    exp = prob.exp
    w = exp.loss_weights
    system = PDE_SYSTEMS[exp.system]
    nd = exp.cell.ndim

    if "data" in w and prob.measurement is None:
        raise ValueError(
            f"experiment {exp.name!r} weights the data loss but the problem "
            "has no measurement (no data config / ISG-free setup)")

    def loss_fn(params, data=None):
        d = data or {}
        ic_low = d.get("ic_low", prob.ic_low)
        frames = (rollout_fn(params) if rollout_fn is not None
                  else forward_rollout(params, prob, n_steps, bptt=bptt,
                                       ic_low=d.get("ic_low"),
                                       h0=d.get("h0")))
        total = jnp.zeros((), frames.dtype)
        aux = {}
        if prob.measurement is not None:
            # measurement covers train_steps+1 frames; during curriculum the
            # rollout is shorter — subsample measurement to match.
            meas = d.get("meas", prob.measurement)
            tr, va = data_loss(frames, meas[: _n_meas(frames.shape[0], exp.data)],
                               exp.data, nd)
            aux["data"] = tr
            aux["val"] = va
            if "data" in w:
                total = total + w["data"] * tr
        if exp.isg is not None:
            out = isg_apply(params["isg"], ic_low, exp.isg)
            icl = ic_loss(out, ic_low, nd, exp.interp_method,
                          align_corners=exp.interp_align_corners,
                          periodic_extend=exp.interp_periodic_extend)
            aux["ic"] = icl
            if "ic" in w:
                total = total + w["ic"] * icl
        pl = phys_loss(system, frames, exp.dt, exp.dx)
        aux["phy"] = pl  # always computed: validation metric (train_2drd.py:404-406)
        if "phy" in w:
            total = total + w["phy"] * pl
            aux.setdefault("val", pl)
        return total, aux

    return loss_fn


def make_mesh_rollout_fn(prob: Problem, n_steps: int, mesh, *,
                         impl: str = "halo"):
    """Spatial-parallel rollout override for ``build_loss_fn`` — multi-chip
    *training* through the public experiment API (SURVEY §2.3: the
    TPU-native equivalent of the reference's periodic-pad layer,
    train_2drd.py:108-109, lives inside the training graph).

    impl:
      'halo'  — explicit domain decomposition: shard_map over the mesh's
                spatial axes, 2-cell halo per step via lax.ppermute over
                ICI (parallel/sharded.py); BPTT crosses the exchange
                (ppermute's transpose is ppermute — gradient-parity-tested
                in tests/test_parallel.py).
      'gspmd' — the jnp model under sharding constraints; XLA partitions
                the periodic rolls into collective-permutes and the loss
                reduction into a psum.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from percnn_tpu.parallel.sharded import sharded_rollout_nd

    exp = prob.exp
    nd = exp.cell.ndim
    axis_names = tuple(mesh.axis_names)[:nd]
    if len(axis_names) != nd:
        raise ValueError(
            f"mesh {tuple(mesh.axis_names)} has fewer axes than the "
            f"{nd}D experiment {exp.name!r}")
    spatial = prob.truth.shape[1:1 + nd]
    for n, a in zip(spatial, axis_names):
        if n % mesh.shape[a]:
            raise ValueError(
                f"grid axis {a}={n} not divisible by mesh axis "
                f"{a}={mesh.shape[a]} for experiment {exp.name!r}")

    def initial_state(params):
        if exp.isg is not None:
            return isg_apply(params["isg"], prob.ic_low, exp.isg)[0]
        return prob.h0

    if impl == "halo":
        def rollout_fn(params):
            return sharded_rollout_nd(params["cell"], initial_state(params),
                                      exp.cell, n_steps, mesh,
                                      axis_names=axis_names)
    elif impl == "gspmd":
        state_s = NamedSharding(mesh, P(*axis_names, None))
        frames_s = NamedSharding(mesh, P(None, *axis_names, None))

        def rollout_fn(params):
            h0 = jax.lax.with_sharding_constraint(initial_state(params),
                                                  state_s)
            step = lambda h: pi_cell_step(params["cell"], h, exp.cell)
            frames = rollout(step, h0, n_steps, remat=True)
            return jax.lax.with_sharding_constraint(frames, frames_s)
    else:
        raise ValueError(f"unknown parallel impl {impl!r} "
                         "(expected 'halo' or 'gspmd')")
    return rollout_fn


def _n_meas(n_frames: int, dcfg: DataLossConfig) -> int:
    t = list(range(n_frames))[slice(0, -1 if dcfg.drop_last_frame else None, dcfg.time_stride)]
    return len(t)


def build_isg_pretrain_loss(prob: Problem):
    exp = prob.exp

    def loss_fn(isg_params):
        out = isg_apply(isg_params, prob.ic_low, exp.isg)
        return ic_loss(out, prob.ic_low, exp.cell.ndim, exp.interp_method,
                       align_corners=exp.interp_align_corners,
                       periodic_extend=exp.interp_periodic_extend)

    return loss_fn


def inference_rollout(params: dict, prob: Problem, n_steps: int) -> jnp.ndarray:
    """Fastest inference path: the fused Pallas kernel when the cell shape
    supports it (kernel_size=1, 2D any size / 3D tile-aligned), else the
    jnp scan."""
    exp = prob.exp
    if exp.isg is not None:
        h0 = isg_apply(params["isg"], prob.ic_low, exp.isg)[0]
    else:
        h0 = prob.h0
    cell = exp.cell
    if h0.dtype == jnp.float32:
        try:
            if cell.ndim == 2:
                from percnn_tpu.ops.pallas.cell2d import fused_rollout_2d
                return fused_rollout_2d(params["cell"], h0, cell, n_steps)
            if cell.ndim == 3 and cell.kernel_size == 1:
                from percnn_tpu.ops.pallas.cell3d import fused_rollout_3d
                return fused_rollout_3d(params["cell"], h0, cell, n_steps)
        except (ValueError, NotImplementedError):
            pass
    step = lambda h: pi_cell_step(params["cell"], h, cell)
    return rollout(step, h0, n_steps, remat=False)


def make_stability_probe(prob: Problem, n_steps: int):
    """Stability probe over the full inference horizon (train(probe=...)).

    Rolls the model out autonomously for ``n_steps`` (the evaluation
    horizon, not the training segment) and returns the measurement
    data-fit MSE if every frame is finite, else +inf.  Selection is
    truth-free: only the noisy measurements the model trains on are
    consulted.  Catches the failure mode the reference's watchdog cannot
    (train_3drd.py:427-434 watches training loss only): params that are
    stable over 300-step training segments but blow up over the 1000-step
    inference rollout (GS3D seed 4, RESULTS.md round 4)."""
    exp = prob.exp
    nd = exp.cell.ndim

    @jax.jit
    def _metrics(params):
        frames = inference_rollout(params, prob, n_steps)
        finite = jnp.isfinite(frames).all()
        tr, va = data_loss(frames[: exp.train_steps + 1], prob.measurement,
                           exp.data, nd)
        return finite, tr + va

    def probe(params) -> float:
        finite, fit = _metrics(params)
        return float(fit) if bool(finite) else float("inf")

    return probe


def select_stable_candidate(params: dict, prob: Problem, ckpt_path: str,
                            probe) -> tuple[dict, dict]:
    """Post-training candidate selection: among the trainer-returned params
    ('best'), the latest checkpoint and the probe's '.stable' checkpoint,
    keep the one with the lowest finite probe score.

    Extends the watchdog past training: the '.best'-by-training-loss params
    can diverge at inference while a mid-training iterate is fine (GS3D
    seed 4: .best diverges at frame ~731 of 1000, runs/round4/gs3d_seed4/
    reval.json).  If no candidate probes stable, the trainer's params are
    kept and evaluate() reports the divergence honestly.  Returns
    (chosen_params, report dict)."""
    from percnn_tpu.core.checkpoint import load_checkpoint_tree

    candidates = {"best": params}
    for tag, suffix in (("latest", ""), ("stable", ".stable")):
        path = ckpt_path + suffix
        if os.path.exists(path):
            try:
                candidates[tag] = load_checkpoint_tree(path)[0]["params"]
            except Exception:
                pass
    scores = {tag: float(probe(p)) for tag, p in candidates.items()}
    stable = {t: s for t, s in scores.items() if np.isfinite(s)}
    choice = min(stable, key=stable.get) if stable else "best"
    return candidates[choice], {"candidate": choice, "probe_scores": scores}


def evaluate(params: dict, prob: Problem, n_steps: int) -> dict:
    """Inference rollout + rel-L2 vs clean truth (the reference's headline
    accuracy metric).

    Divergence-aware: if the autonomous rollout goes non-finite (an
    unstable iterate can train to finite loss on 300-step segments yet
    blow up over the 1000-step eval horizon — GS3D seed 4, RESULTS.md
    round 4), the HEADLINE ``rel_l2*`` keys stay NaN — a diverged model
    has no finite full-horizon accuracy, and a finite-looking headline
    number would read as comparable to healthy rows (ADVICE round 4).
    The finite-prefix accuracy is always available under the
    ``rel_l2*_stable`` keys, alongside ``stable_frames`` (frames before
    the first non-finite one) and ``diverged``.  The reference's scripts
    print nan in this case with no prefix diagnostics at all
    (train_3drd.py:540-558 has no finite guard)."""
    frames = np.asarray(inference_rollout(params, prob, n_steps))
    t = min(frames.shape[0], prob.truth.shape[0])
    finite = np.isfinite(frames[:t]).all(axis=tuple(range(1, frames.ndim)))
    bad = np.flatnonzero(~finite)
    stable = int(bad[0]) if bad.size else t
    s = max(stable, 1)  # frame 0 is the IC; keep metrics well-defined
    diff = (frames[:s] - prob.truth[:s]).reshape(s, -1).astype(np.float64)
    ref = prob.truth[:s].reshape(s, -1).astype(np.float64)
    per_frame = np.linalg.norm(diff, axis=1) / np.maximum(
        np.linalg.norm(ref, axis=1), 1e-30)
    diverged = stable < t
    prefix = {
        "rel_l2_stable": rel_l2(frames[:s], prob.truth[:s]),
        "rel_l2_u_stable": rel_l2(frames[:s, ..., 0], prob.truth[:s, ..., 0]),
        "rel_l2_v_stable": rel_l2(frames[:s, ..., 1], prob.truth[:s, ..., 1]),
    }
    return {
        "rel_l2": np.nan if diverged else prefix["rel_l2_stable"],
        "rel_l2_u": np.nan if diverged else prefix["rel_l2_u_stable"],
        "rel_l2_v": np.nan if diverged else prefix["rel_l2_v_stable"],
        **prefix,
        "rel_l2_per_frame": per_frame,  # error-accumulation curve (prefix)
        "stable_frames": stable,        # == t when the rollout stays finite
        "diverged": diverged,
        "frames": frames,
    }


def _export_viz(exp, prob, params, metrics, truth, out_dir):
    """Reference-parity postprocessing artifacts (SURVEY L8):
    - 2x3 panel incl. the noisy-measurement column (train_2drd.py:445-521),
    - every-N-steps uv_comparison image series (percnn_LO_eqn.py:526-543),
    - u AND v isosurfaces for pred and truth in 3D (Plot3D.py:6-29),
    - ISG-vs-target-vs-measurement IC diagnostic (rcnn_Burgers...py:489-578).
    """
    from percnn_tpu.viz.plots import (comparison_panel, frame_series,
                                      ic_panel, isosurface_pair,
                                      measurement_panel)

    frames = metrics["frames"]
    mid = frames.shape[0] // 2
    if exp.cell.ndim == 3:
        isosurface_pair(frames[mid], np.asarray(truth[mid]),
                        os.path.join(out_dir, f"{exp.name}.iso"))
        comparison_panel(frames[mid][frames.shape[1] // 2],
                         np.asarray(truth[mid][truth.shape[1] // 2]),
                         os.path.join(out_dir, f"{exp.name}.panel.png"),
                         title=f"{exp.name} t={mid} (mid-depth slice)")
        return
    if prob.measurement is not None:
        meas = np.asarray(prob.measurement)
        tm = meas.shape[0] // 2
        t_frame = min(tm * exp.data.time_stride, frames.shape[0] - 1)
        measurement_panel(frames[t_frame], np.asarray(truth[t_frame]),
                          meas[tm],
                          os.path.join(out_dir, f"{exp.name}.panel.png"),
                          title=f"{exp.name} t={t_frame}")
    else:
        comparison_panel(frames[mid], np.asarray(truth[mid]),
                         os.path.join(out_dir, f"{exp.name}.panel.png"),
                         title=f"{exp.name} t={mid}")
    frame_series(frames, np.asarray(truth[: frames.shape[0]]),
                 os.path.join(out_dir, f"{exp.name}_frames"), name=exp.name)
    if exp.isg is not None:
        from percnn_tpu.core.isg import isg_apply
        from percnn_tpu.core.losses import ic_target

        out = np.asarray(isg_apply(params["isg"], prob.ic_low, exp.isg)[0])
        tgt = np.asarray(ic_target(prob.ic_low, out.shape[:-1], 2,
                                   exp.interp_method,
                                   align_corners=exp.interp_align_corners,
                                   periodic_extend=exp.interp_periodic_extend)[0])
        ic_panel(out, tgt, os.path.join(out_dir, f"{exp.name}.ic_panel.png"),
                 low_res=np.asarray(prob.ic_low[0]))


def run_experiment(
    exp: ExperimentConfig,
    *,
    out_dir: str = "runs",
    cache_dir: str | None = "data_cache",
    dtype=jnp.float32,
    n_iters_override: int | None = None,
    isg_pretrain_override: int | None = None,
    warmup: int | None = None,
    steps_per_call: int | None = None,
    resume: bool = False,
    seed: int = 0,
    mesh=None,
    parallel_impl: str = "halo",
    isg_params_path: str | None = None,
) -> dict:
    """Full pipeline: data -> (ISG pretrain) -> curriculum train -> eval.

    resume=True reloads params/optimizer from the experiment checkpoint and
    continues (the reference's cont/restart flag, train_2drd.py:432-439);
    the ISG pretrain is skipped on resume.  The checkpoint metadata records
    the curriculum stage index, so a resumed multi-stage run re-enters the
    stage it died in (at its saved iteration) instead of repeating stage 0.

    mesh: a jax.sharding.Mesh over the spatial axes — training runs
    spatially sharded across its devices (parallel_impl 'halo' for the
    explicit ppermute halo-exchange path, 'gspmd' for sharding-constraint
    auto-partitioning; see make_mesh_rollout_fn).
    """
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, f"{exp.name}.metrics.jsonl"),
                           echo_every=exp.train.log_every)
    if warmup is None:
        warmup = 100 if exp.system == "lambda_omega" else 0
    truth = make_dataset(exp, warmup=warmup, cache_dir=cache_dir)
    prob = setup_problem(exp, truth, dtype)
    params = init_model(exp, jax.random.PRNGKey(seed), dtype)

    if exp.isg is not None and not resume:
        if isg_params_path is not None and os.path.exists(isg_params_path):
            # shared ISG pretrain: the ISG upsampler sees only the (seeded)
            # noisy IC, so variants of the same experiment/seed (e.g. the
            # single vs halo multi-chip validations) can reuse one pretrain
            # instead of repeating the costliest CPU stage per variant.
            from percnn_tpu.core.checkpoint import load_checkpoint

            params["isg"] = load_checkpoint(isg_params_path,
                                            params["isg"])[0]
        else:
            n_pre = isg_pretrain_override if isg_pretrain_override is not None else exp.isg_pretrain_iters
            params["isg"] = pretrain_isg(
                build_isg_pretrain_loss(prob), params["isg"], n_iters=n_pre, logger=logger
            )
            if isg_params_path is not None:
                from percnn_tpu.core.checkpoint import save_checkpoint

                save_checkpoint(isg_params_path, params["isg"],
                                {"experiment": exp.name, "seed": seed})

    stages = list(exp.curriculum) + [exp.train_steps]
    n_total = n_iters_override if n_iters_override is not None else exp.train.n_iters
    per_stage = max(1, n_total // len(stages))
    ckpt_path = os.path.join(out_dir, f"{exp.name}.ckpt.npz")
    start_stage = 0
    if resume and os.path.exists(ckpt_path):
        from percnn_tpu.core.checkpoint import peek_meta

        start_stage = min(int(peek_meta(ckpt_path).get("stage", 0)),
                          len(stages) - 1)
    probe = None
    if (exp.train.probe_every > 0 and prob.measurement is not None
            and mesh is None):
        probe = make_stability_probe(
            prob, min(exp.infer_steps, truth.shape[0] - 1))
        if not resume and os.path.exists(ckpt_path + ".stable"):
            os.remove(ckpt_path + ".stable")  # stale: another run's params
    history = []
    for i, steps in enumerate(stages):
        if i < start_stage:
            continue
        tcfg = dataclasses.replace(
            exp.train,
            n_iters=per_stage if i < len(stages) - 1 else n_total - per_stage * (len(stages) - 1),
            ckpt_path=ckpt_path,
            log_path=None,
            **({"steps_per_call": steps_per_call} if steps_per_call else {}),
        )
        loss_fn = build_loss_fn(
            prob, steps,
            rollout_fn=(make_mesh_rollout_fn(prob, steps, mesh,
                                             impl=parallel_impl)
                        if mesh is not None else None))
        # single-device path: measurements/ICs ride through jit as
        # arguments so the compiled step is dataset-independent (cache
        # hits across noise levels); the mesh rollout closes over its
        # own sharded data and keeps the constant-based path.
        largs = (problem_data(prob),) if mesh is None else ()
        params, h = train(loss_fn, params, tcfg, logger=logger,
                          resume=resume and i == start_stage,
                          extra_meta={"stage": i}, loss_args=largs,
                          probe=probe)
        history.extend(h)
        last_stage_history = h

    if mesh is not None:
        # detach from the mesh so single-device inference/eval (and the
        # Pallas fast path) see ordinary committed-to-default arrays
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), params)
    selection = {}
    if probe is not None:
        params, selection = select_stable_candidate(params, prob, ckpt_path,
                                                    probe)
        logger.log(n_total, candidate=selection["candidate"],
                   **{f"probe_{t}": s
                      for t, s in selection["probe_scores"].items()})
    metrics = evaluate(params, prob, min(exp.infer_steps, truth.shape[0] - 1))
    logger.log(n_total, final_rel_l2=metrics["rel_l2"],
               **({"stable_frames": metrics["stable_frames"],
                   "rel_l2_stable": metrics["rel_l2_stable"],
                   "diverged": True} if metrics["diverged"] else {}))
    logger.close()
    try:
        _export_viz(exp, prob, params, metrics, truth, out_dir)
    except Exception:
        pass
    result = {"params": params, "history": history, **metrics, **selection}
    if exp.cell.kernel_size == 1:
        # closed-form polynomial the trained Pi-block represents (reference
        # get_expression, train_3drd.py:442-468)
        try:
            from percnn_tpu.discovery.symbolic import pi_block_expression

            result["pi_expressions"] = [
                str(pi_block_expression(params["cell"]["pi"][c]))
                for c in range(exp.cell.channels)
            ]
        except Exception:
            pass
    # truth-free convergence telemetry for restart gating: the minimum
    # training loss reached in the FINAL curriculum stage (loss scales are
    # only comparable within a stage).  GS3D healthy inits reach ~1.6e-3;
    # bad-basin inits plateau at 3e-3+ (rounds 3-5 robustness table).
    finite_tail = [x for x in (last_stage_history if history else [])
                   if math.isfinite(x)]
    result["final_stage_min_loss"] = min(finite_tail) if finite_tail else None
    return result


def run_experiment_with_restarts(
    exp: ExperimentConfig,
    *,
    out_dir: str = "runs",
    seed: int = 0,
    max_restarts: int = 2,
    seed_stride: int = 1000,
    loss_gate: float | None = None,
    **kw,
) -> dict:
    """run_experiment with automatic restart on TRUTH-FREE failure signals.

    The GS3D workload is init-fragile: with the measurement noise fixed
    (exp.seed), roughly half the parameter inits land in basins whose
    300-step training loss plateaus 2-4x above the healthy band and whose
    1000-step rollout is (near-)unstable — the reference's own workload is
    exactly this NaN-prone (train_3drd.py:427-434), and its users rerun
    failed seeds by hand.  This wraps that practice as a failure-recovery
    policy: an attempt is retried with the init seed shifted by
    ``seed_stride`` (data/noise untouched) when any truth-free gate trips:

    - training aborted (watchdog exhausted, metrics log `aborted` event /
      FloatingPointError under abort_policy="raise"),
    - the selected candidate's inference rollout diverged
      (evaluate()'s finiteness scan — no ground truth involved), or
    - ``loss_gate`` is set and the final curriculum stage never reached a
      training loss below it (noisy-measurement loss, truth-free; GS3D
      healthy band ~1.6e-3 vs 3e-3+ for bad basins).

    Among completed attempts the one with the LOWEST final-stage training
    loss is returned, with the attempt log under ``result["attempts"]``
    (every attempt keeps its artifacts in ``<out_dir>.retryN``).
    """
    attempts = []
    best = None
    for attempt in range(max_restarts + 1):
        s = seed + attempt * seed_stride
        d = out_dir if attempt == 0 else f"{out_dir}.retry{attempt}"
        rec = {"attempt": attempt, "init_seed": s, "out_dir": d}
        # crash-resume: an interrupted attempt left a checkpoint in its
        # own dir — pick the run back up instead of restarting from init
        # (resume is only passed when the checkpoint exists, because
        # run_experiment skips the ISG pretrain whenever resume=True)
        akw = kw
        if "resume" not in kw and os.path.exists(
                os.path.join(d, f"{exp.name}.ckpt.npz")):
            akw = dict(kw, resume=True)
        try:
            res = run_experiment(exp, out_dir=d, seed=s, **akw)
        except FloatingPointError as e:
            rec.update(error=str(e)[:200])
            attempts.append(rec)
            continue
        ml = res.get("final_stage_min_loss")
        rec.update(rel_l2=res.get("rel_l2"), diverged=res.get("diverged"),
                   final_stage_min_loss=ml,
                   candidate=res.get("candidate"))
        attempts.append(rec)
        best_ml = (best or {}).get("final_stage_min_loss")
        if best is None or (ml is not None and
                            ml < (math.inf if best_ml is None else best_ml)):
            best = res
        # a missing final-stage loss (e.g. a resumed run whose training
        # already finished) can only trip the gate when a loss_gate is in
        # use — otherwise a clean, non-diverged run would be retried
        gated = (res.get("diverged")
                 or (loss_gate is not None and (ml is None
                                                or ml > loss_gate)))
        if not gated:
            break
    if best is None:
        raise FloatingPointError(
            f"all {max_restarts + 1} attempts aborted: {attempts}")
    best["attempts"] = attempts
    return best
