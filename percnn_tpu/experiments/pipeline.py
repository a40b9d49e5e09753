"""The full three-stage discovery pipeline:

  Stage-1  data-driven reconstruction (Pi-cell + ISG)  -> high-res rollout
  Stage-2  STRidge sparse regression over the 70-term library -> sparse PDE
  Stage-3  symbolic fine-tune of the identified coefficients

The reference runs these as three separate scripts with a .mat artifact
handoff and hand-pasted coefficients (SURVEY §3.3); here one call chains
them, with the artifacts still written out for inspection/compat.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from percnn_tpu.core.cell import SymbolicCellConfig
from percnn_tpu.core.train import TrainConfig
from percnn_tpu.data.io import save_npz
from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.discovery.stridge import STRidge, discovery_metrics, pareto_select
from percnn_tpu.experiments.configs import ExperimentConfig
from percnn_tpu.experiments.runner import make_dataset, run_experiment
from percnn_tpu.experiments.stage3 import Stage3Config, run_stage3


def identified_to_symbolic(
    w_u: np.ndarray,
    w_v: np.ndarray,
    names: list[str],
    *,
    dt: float,
    dx: float,
    integrator: str = "euler",
) -> tuple[SymbolicCellConfig, tuple, tuple]:
    """STRidge outputs -> (SymbolicCellConfig, coef_init, nu_init).

    The pure-diffusion columns ('ones*lap_u' for eq u, 'ones*lap_v' for
    eq v) become the cell's nu; every other nonzero column becomes a term
    with its coefficient as init — the reference does this by hand
    (fine_tuning_[5%...].py:123-130)."""
    def split(w, lap_name):
        terms, coefs, nu = [], [], 0.0
        for n, c in zip(names, np.asarray(w).ravel()):
            if c == 0.0:
                continue
            if n == lap_name:
                nu = float(c)
            else:
                terms.append(n)
                coefs.append(float(c))
        return tuple(terms), tuple(coefs), nu

    tu, cu, nu_u = split(w_u, "ones*lap_u")
    tv, cv, nu_v = split(w_v, "ones*lap_v")
    cell = SymbolicCellConfig(ndim=2, dt=dt, dx=dx, terms=(tu, tv),
                              integrator=integrator, diffusion="raw")
    return cell, (cu, cv), (nu_u, nu_v)


# Known governing-equation term tables for discovery metrics (BASELINE.md
# truth rows).
TRUTH_TERMS = {
    "burgers": {
        "u": {"ones*lap_u": 1 / 200, "u*u_x": -1.0, "v*u_y": -1.0},
        "v": {"ones*lap_v": 1 / 200, "u*v_x": -1.0, "v*v_y": -1.0},
    },
    "lambda_omega": {
        "u": {"ones*lap_u": 0.1, "u*ones": 1.0, "u**3*ones": -1.0,
              "u**2*v*ones": 1.0, "u*v**2*ones": -1.0, "v**3*ones": 1.0},
        "v": {"ones*lap_v": 0.1, "v*ones": 1.0, "v**3*ones": -1.0,
              "u**3*ones": -1.0, "u*v**2*ones": -1.0, "u**2*v*ones": -1.0},
    },
}


def default_stage2_frames(exp: ExperimentConfig) -> slice:
    """Per-system default Stage-2 regression window.

    The reference regresses on frames 50:150 (PDE_FIND_u.py:220-222).
    For lambda-omega the on-attractor (A^2 ~ 1) collinearity of the cubic
    library interacts badly with accumulated reconstruction error, so at
    low noise the early window — where the reconstruction is closest to
    the measurements — recovers the clean 6-term equation (precision
    0.56 -> 0.86, coef rel-L2 0.73 -> 0.06; RESULTS.md round 3).  The
    trade-off inverts with noise: at >=20% the early window inherits the
    measurement noise while the reference window stays clean (window x
    subsample study over every saved LO reconstruction,
    runs/round3/lo20_stage2_study.jsonl), so the default is noise-aware.
    """
    if exp.system == "lambda_omega" and exp.noise_pct < 0.2:
        return slice(0, 100)
    return slice(50, 150)


def _resolve_frames(exp: ExperimentConfig, recon: np.ndarray,
                    frames: slice | None) -> slice:
    """Default + clamp logic shared by every Stage-2 entry point: clip the
    window's END to the reconstruction, keeping its start — replacing the
    whole window would silently change the protocol."""
    if frames is None:
        frames = default_stage2_frames(exp)
    if frames.stop > recon.shape[0]:
        clipped = slice(frames.start or 0, recon.shape[0])
        if clipped.start >= clipped.stop:
            raise ValueError(
                f"stage2 frames {frames} lies beyond the "
                f"{recon.shape[0]}-frame reconstruction")
        frames = clipped
    return frames


def run_stage2(
    exp: ExperimentConfig,
    recon: np.ndarray,
    *,
    frames: slice | None = None,
    subsample: float = 0.2,
    kwargs: dict | None = None,
    seed: int = 0,
    truth_terms: dict | None = None,
) -> dict:
    """Stage-2 sparse regression on a reconstruction [T, *grid, 2].

    The reference's per-system protocol in one call: Burgers protects the
    diffusion column with must_have (PDE_FIND_u.py:49) at fixed kappa;
    lambda-omega runs the no-must-have Pareto-front gamma sweep with an
    automated knee (LO stage-2 PDE_FIND_u.py:297-335).  Returns the s2
    dict {w_u, w_v, names, [pareto_u/v], [metrics_u/v]}."""
    kw = dict(maxit=50, stridge_iters=40, lam=1e-4, d_tol=5.0, kappa=1.0)
    kw.update(kwargs or {})
    frames = _resolve_frames(exp, recon, frames)
    high_noise_lo = exp.system == "lambda_omega" and exp.noise_pct >= 0.25
    if high_noise_lo:
        # part of the high-noise protocol below: the 20%-row subsample
        # discards the sparse off-attractor rows that carry all of the
        # v-equation's identifiability, so regress the full design matrix
        # (cheap with the Gram solver).  On the saved 30% ensemble recon
        # this is the difference between v precision 0.75 (one extra
        # u^2*lap_u term) and 0.86 — the published answer's exact support
        # (6 true terms + the reference's own spurious u at ~-0.19).
        subsample = 1.0
    # subsample=0.2 matches the reference's 20% row subsample
    # (PDE_FIND_u.py:246-247); 1.0 regresses the full matrix (cheap with
    # the Gram-matrix solver, sharper at 0% noise).
    R, Ut, Vt, names = build_design_matrix(recon, exp.dt, exp.dx, frames=frames,
                                           subsample=subsample, seed=seed)
    if exp.system == "lambda_omega":
        sweep_kw = dict(maxit=kw["maxit"], stridge_iters=kw["stridge_iters"],
                        lam=kw["lam"], d_tol=kw["d_tol"])
        yu, yv, mh = Ut, Vt, {"u": None, "v": None}
        if high_noise_lo:
            # High-noise λ–Ω identifiability fix (round-5 study,
            # runs/round5/lo30_v_study.jsonl + lo30_v_diag.jsonl): on the
            # limit cycle A² = u²+v² ≈ 1 the terms {v, u²v, v³} collapse to
            # v·(1−A²) ≈ 0 and −u·A² onto −u, so at 30% noise a wrong
            # cross-Laplacian support fits the v-equation *better* than the
            # truth and no (residual, L0) sweep can visit it.  Reweighting
            # rows by the off-attractor distance √|1−A²| restores
            # identifiability, and protecting the diffusion + linear
            # columns (the reference's must_have analog, PDE_FIND_u.py:49)
            # anchors the search.  Recovers the published 30% answer shape
            # — 6 true terms + the reference's own spurious u at ≈−0.19
            # (LO stage-2 PDE_FIND_v.py 30% row).
            iu, iv = names.index("u*ones"), names.index("v*ones")
            amp2 = R[:, iu: iu + 1] ** 2 + R[:, iv: iv + 1] ** 2
            sw = np.sqrt(np.abs(1.0 - amp2) + 1e-3)
            R, yu, yv = R * sw, Ut * sw, Vt * sw
            mh = {"u": [names.index("ones*lap_u"), iu],
                  "v": [names.index("ones*lap_v"), iv]}
        w_u, pareto_u = pareto_select(STRidge(R, yu), must_have=mh["u"],
                                      **sweep_kw)
        w_v, pareto_v = pareto_select(STRidge(R, yv), must_have=mh["v"],
                                      **sweep_kw)
        s2 = {"w_u": w_u, "w_v": w_v, "names": names,
              "pareto_u": pareto_u, "pareto_v": pareto_v}
    else:
        w_u = STRidge(R, Ut).train(must_have=5, **kw)
        w_v = STRidge(R, Vt).train(must_have=6, **kw)
        s2 = {"w_u": w_u, "w_v": w_v, "names": names}
    _attach_support_metrics(s2, names, exp.system, truth_terms)
    return s2


def run_stage2_stable(
    exp: ExperimentConfig,
    recon: np.ndarray,
    *,
    draws: int = 8,
    vote: float = 0.5,
    frames: slice | None = None,
    subsample: float = 0.2,
    kwargs: dict | None = None,
    seed: int = 0,
    truth_terms: dict | None = None,
) -> dict:
    """Stability-selection Stage-2 (Meinshausen & Buhlmann 2010 applied to
    the reference's STRidge protocol).

    The reference's 20% row subsample (PDE_FIND_u.py:246-247) makes the
    recovered support a draw lottery once reconstruction bias is
    noise-level: on the same 10%-noise Burgers reconstruction, three
    subsample seeds give three different supports (RESULTS.md round 4).
    Fix: run the per-system protocol over `draws` independent subsample
    draws, keep each term whose inclusion fraction is >= `vote`, and refit
    the voted support by exact lstsq on the FULL design matrix.  Returns
    an s2 dict like `run_stage2` plus per-term vote fractions."""
    votes = {}
    for k in range(draws):
        s2_k = run_stage2(exp, recon, frames=frames, subsample=subsample,
                          kwargs=kwargs, seed=seed + k,
                          truth_terms=truth_terms)
        names = s2_k["names"]
        for eq in ("u", "v"):
            w = np.ravel(np.asarray(s2_k[f"w_{eq}"]))
            votes.setdefault(eq, np.zeros(len(names)))
            votes[eq] += (np.abs(w) > 1e-8).astype(float)
    # one full-matrix build for the voted-support refit
    frames = _resolve_frames(exp, recon, frames)
    R, Ut, Vt, names = build_design_matrix(recon, exp.dt, exp.dx,
                                           frames=frames, subsample=1.0,
                                           seed=seed)
    s2 = {"names": names}
    for eq, col in (("u", Ut), ("v", Vt)):
        frac = votes[eq] / draws
        support = np.flatnonzero(frac >= vote)
        w = np.zeros((len(names), 1))
        if support.size:
            w[support] = np.linalg.lstsq(R[:, support], col, rcond=None)[0]
        s2[f"w_{eq}"] = w
        s2[f"votes_{eq}"] = frac
    _attach_support_metrics(s2, names, exp.system, truth_terms)
    return s2


def run_discovery_pipeline(
    exp: ExperimentConfig,
    *,
    out_dir: str = "runs/pipeline",
    cache_dir: str | None = "data_cache",
    stage1_iters: int | None = None,
    stage2_frames: slice | None = None,
    stage2_kwargs: dict | None = None,
    stage2_subsample: float = 0.2,
    stage2_draws: int | None = None,
    stage3_iters: int | None = None,
    truth_terms: dict | None = None,
    dtype=None,
    steps_per_call: int | None = None,
    stage1_recon: str | None = None,
    seed: int = 0,
) -> dict:
    """Stage-1 -> Stage-2 -> Stage-3 on one experiment config.

    stage1_recon: path to a saved Stage-1 reconstruction .npz — skips the
    Stage-1 training and regresses on that artifact instead (the
    reference's own workflow: its Stage-2 scripts load the .mat a separate
    Stage-1 run saved, PDE_FIND_u.py:220-222).
    stage2_draws: if set, Stage-2 uses stability selection over that many
    subsample draws (run_stage2_stable) instead of a single draw."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    os.makedirs(out_dir, exist_ok=True)

    # ---- Stage 1: reconstruction --------------------------------------
    if stage1_recon is not None:
        from percnn_tpu.data.io import load_npz

        recon = load_npz(stage1_recon)
        want = (exp.grid,) * exp.cell.ndim + (2,)
        if recon.ndim != len(want) + 1 or tuple(recon.shape[1:]) != want:
            raise ValueError(
                f"stage1_recon {stage1_recon!r} has shape {recon.shape}, "
                f"expected [T, {', '.join(map(str, want))}] for experiment "
                f"{exp.name!r} (grid {exp.grid}^{exp.cell.ndim})")
        s1 = {"rel_l2": None, "frames": recon, "reused": stage1_recon}
    else:
        s1 = run_experiment(exp, out_dir=out_dir, cache_dir=cache_dir,
                            dtype=dtype, n_iters_override=stage1_iters,
                            steps_per_call=steps_per_call, seed=seed)
        recon = s1["frames"]  # [T+1, H, W, 2]
        save_npz(os.path.join(out_dir, f"{exp.name}.stage1_recon.npz"), recon)

    # ---- Stage 2: sparse regression -----------------------------------
    if stage2_draws:
        s2 = run_stage2_stable(exp, recon, draws=stage2_draws,
                               frames=stage2_frames,
                               subsample=stage2_subsample,
                               kwargs=stage2_kwargs, seed=seed,
                               truth_terms=truth_terms)
    else:
        s2 = run_stage2(exp, recon, frames=stage2_frames,
                        subsample=stage2_subsample, kwargs=stage2_kwargs,
                        seed=seed, truth_terms=truth_terms)
    w_u, w_v = s2["w_u"], s2["w_v"]
    extra = {}
    for eq in ("u", "v"):
        pr = s2.get(f"pareto_{eq}")
        if pr:
            extra.update({f"pareto_gammas_{eq}": pr["gammas"],
                          f"pareto_ls_{eq}": pr["ls_loss"],
                          f"pareto_l0_{eq}": pr["l0_count"],
                          f"pareto_gamma_{eq}": pr["selected_gamma"]})
            try:
                from percnn_tpu.viz.plots import pareto_panel

                pareto_panel(pr["gammas"], pr["ls_loss"], pr["l0_count"],
                             os.path.join(out_dir, f"select_gamma_{eq}.png"),
                             selected_gamma=pr["selected_gamma"], eq=eq)
            except Exception:
                pass  # viz is best-effort, like runner._export_viz
    np.savez(os.path.join(out_dir, f"{exp.name}.stage2_coefs.npz"),
             w_u=w_u, w_v=w_v, names=np.asarray(s2["names"]), **extra)

    # ---- Stage 3: symbolic fine-tune ----------------------------------
    s3, cell = _finish_stage3(exp, s2, out_dir=out_dir, cache_dir=cache_dir,
                              stage3_iters=stage3_iters, dtype=dtype,
                              seed=seed)
    return {"stage1": s1, "stage2": s2, "stage3": s3, "symbolic_cell": cell}


def _attach_support_metrics(s2, names, system, truth_terms):
    """Precision/recall/coef-rel-L2 of a Stage-2 support vs the known
    governing equation (BASELINE.md truth rows)."""
    if truth_terms is None:
        truth_terms = TRUTH_TERMS.get(system)
    if not truth_terms:
        return
    for eq, w in (("u", s2["w_u"]), ("v", s2["w_v"])):
        coef_true = np.zeros((len(names), 1))
        for t, c in truth_terms.get(eq, {}).items():
            coef_true[names.index(t)] = c
        s2[f"metrics_{eq}"] = discovery_metrics(w, coef_true)


def _finish_stage3(exp, s2, *, out_dir, cache_dir, stage3_iters, dtype, seed):
    """Stage-2 support -> symbolic cell -> fine-tune (the common tail of
    the full pipeline and the Stage-3-only entry point)."""
    cell, coef_init, nu_init = identified_to_symbolic(
        s2["w_u"], s2["w_v"], s2["names"], dt=exp.dt, dx=exp.dx
    )
    s3cfg = Stage3Config(
        base=exp, cell=cell, coef_init=coef_init, nu_init=nu_init,
        truth_coef=None,
        train=TrainConfig(n_iters=stage3_iters or 1000, lr=5e-4, lr_step=100,
                          lr_gamma=0.95, best_val=True),
    )
    truth = make_dataset(exp, warmup=100 if exp.system == "lambda_omega" else 0,
                         cache_dir=cache_dir)
    s3 = run_stage3(s3cfg, truth, out_dir=out_dir, dtype=dtype,
                    n_iters_override=stage3_iters, seed=seed)
    return s3, cell


def run_stage3_from_coefs(
    exp: ExperimentConfig,
    stage2_coefs: str,
    *,
    out_dir: str = "runs/pipeline",
    cache_dir: str | None = "data_cache",
    stage3_iters: int | None = None,
    truth_terms: dict | None = None,
    dtype=None,
    seed: int = 0,
) -> dict:
    """Stage-3-only entry: fine-tune from a saved `*.stage2_coefs.npz`.

    Pairs with `run_discovery_pipeline(stage1_recon=...)` the way the
    reference's script hand-offs do, but at the Stage-2 -> Stage-3 boundary
    (the reference hand-pastes the discovered coefficients into the
    fine-tuning script, fine_tuning_[5%noise,41x51x51].py:123-130; here the
    support rides the npz artifact every pipeline run writes)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    os.makedirs(out_dir, exist_ok=True)
    with np.load(stage2_coefs, allow_pickle=False) as z:
        s2 = {"w_u": z["w_u"], "w_v": z["w_v"],
              "names": [str(n) for n in z["names"]]}
    _attach_support_metrics(s2, s2["names"], exp.system, truth_terms)
    s3, cell = _finish_stage3(exp, s2, out_dir=out_dir, cache_dir=cache_dir,
                              stage3_iters=stage3_iters, dtype=dtype,
                              seed=seed)
    return {"stage1": {"reused_coefs": stage2_coefs}, "stage2": s2,
            "stage3": s3, "symbolic_cell": cell}


def run_ensemble_discovery(
    exp: ExperimentConfig,
    n_members: int,
    *,
    out_dir: str = "runs/ensemble_discovery",
    cache_dir: str | None = "data_cache",
    stage1_iters: int | None = None,
    aggregate: str = "mean",
    member_recons: list[str] | None = None,
    stage2_frames: slice | None = None,
    stage2_subsample: float = 0.2,
    stage2_kwargs: dict | None = None,
    stage2_draws: int | None = None,
    stage3_iters: int | None = None,
    truth_terms: dict | None = None,
    dtype=None,
    steps_per_call: int | None = None,
    seed: int = 0,
) -> dict:
    """Ensemble-rescued discovery: same measurement, init-seed ensemble.

    High-noise Stage-2 degradation is dominated by Stage-1 reconstruction
    bias, and that bias depends on the optimization path (RESULTS.md
    protocol-ceiling check): train `n_members` Stage-1 models on the SAME
    noisy measurements (`exp.seed` fixes the noise draw,
    runner.setup_problem) with different init seeds (`seed + k`), aggregate
    their reconstructions (mean or median over the member axis), and run
    Stage-2 -> Stage-3 on the aggregate.  Init-seed variance averages out
    of the design matrix; the measurement bias common to all members stays.
    This differs from `run_ensemble` (experiments/ensemble.py), which
    varies the noise draw per member to quantify seed sensitivity.

    member_recons: optional paths to already-saved Stage-1 reconstructions
    (e.g. from prior noise-matrix runs) used for the first members; only
    the remaining ones train here.

    aggregate: 'mean' (default, recommended), 'median', or 'auto'.  MEAN is
    the documented default: the per-pixel median over few members can
    destroy phase alignment in advective systems — round-4 Burgers-30%:
    the median aggregate scored Stage-2 precision 0.43/0.19 (u/v) while
    mean scored 1.0/1.0 and every individual member >= 0.5.  'auto' runs
    Stage-2 on BOTH aggregates and keeps the one whose identified equation
    better fits the individual member reconstructions (truth-free
    cross-validation; see _aggregate_cv_score) — the guard against an
    aggregation mode silently degrading the discovery.

    Also reports per-coefficient uncertainty: Stage-2 is run on each
    member's own reconstruction and the returned dict's "uq" entry carries,
    per equation, the coefficient mean/std across members and each term's
    support vote fraction — the reference offers no uncertainty estimate
    at all (single fit per script).
    """
    import jax.numpy as jnp

    if aggregate not in ("mean", "median", "auto"):
        raise ValueError(
            f"aggregate must be 'mean', 'median' or 'auto', got {aggregate!r}")
    dtype = dtype or jnp.float32
    os.makedirs(out_dir, exist_ok=True)
    from percnn_tpu.data.io import load_npz

    recons, members = [], []
    for k in range(n_members):
        if member_recons is not None and k < len(member_recons):
            recon = load_npz(member_recons[k])
            m = {"member": k, "recon": member_recons[k]}
        else:
            d = os.path.join(out_dir, f"member{k}")
            s1 = run_experiment(exp, out_dir=d, cache_dir=cache_dir,
                                dtype=dtype, n_iters_override=stage1_iters,
                                steps_per_call=steps_per_call, seed=seed + k)
            recon = np.asarray(s1["frames"])
            path = os.path.join(d, f"{exp.name}.stage1_recon.npz")
            save_npz(path, recon)
            m = {"member": k, "recon": path, "stage1_rel_l2": s1["rel_l2"]}
        s2_k = run_stage2(exp, recon, frames=stage2_frames,
                          subsample=stage2_subsample, kwargs=stage2_kwargs,
                          seed=seed, truth_terms=truth_terms)
        m["stage2"] = s2_k
        members.append(m)
        recons.append(recon)

    # ---- per-coefficient uncertainty across members --------------------
    names = members[0]["stage2"]["names"]
    uq = {"names": names, "n_members": n_members}
    for eq in ("u", "v"):
        W = np.stack([np.ravel(np.asarray(m["stage2"][f"w_{eq}"]))
                      for m in members])  # [E, n_terms]
        uq[f"coef_mean_{eq}"] = W.mean(axis=0)
        uq[f"coef_std_{eq}"] = W.std(axis=0)
        uq[f"support_vote_{eq}"] = (np.abs(W) > 1e-8).mean(axis=0)

    # ---- aggregate reconstruction -> Stage-2/3 via the full pipeline ----
    stack = np.stack(recons)
    agg_cv = None
    if aggregate == "auto":
        aggregate, agg_cv = _select_aggregate(
            exp, stack, recons, frames=stage2_frames,
            subsample=stage2_subsample, kwargs=stage2_kwargs, seed=seed,
            truth_terms=truth_terms)
    agg = (stack.mean(axis=0) if aggregate == "mean"
           else np.median(stack, axis=0)).astype(stack.dtype)
    agg_path = os.path.join(out_dir, f"{exp.name}.stage1_recon.ens_{aggregate}.npz")
    save_npz(agg_path, agg)
    res = run_discovery_pipeline(
        exp, out_dir=out_dir, cache_dir=cache_dir,
        stage2_frames=stage2_frames, stage2_kwargs=stage2_kwargs,
        stage2_subsample=stage2_subsample, stage2_draws=stage2_draws,
        stage3_iters=stage3_iters,
        truth_terms=truth_terms, dtype=dtype, steps_per_call=steps_per_call,
        stage1_recon=agg_path, seed=seed)
    np.savez(os.path.join(out_dir, f"{exp.name}.ens_uq.npz"),
             names=np.asarray(names),
             **{k: v for k, v in uq.items() if isinstance(v, np.ndarray)})
    res.update({"members": members, "uq": uq, "aggregate": aggregate,
                "aggregate_recon": agg_path,
                **({"aggregate_cv": agg_cv} if agg_cv else {})})
    return res


def _aggregate_cv_score(w_u, w_v, member_mats) -> float:
    """Truth-free generalization score of an identified (w_u, w_v): mean
    relative residual of the equation over the individual MEMBER design
    matrices.  The members are independent of the aggregation mode, so an
    aggregate whose artifacts (e.g. median phase destruction) leak into the
    identified support scores visibly worse here.  Lower is better."""
    scores = []
    for R, Ut, Vt in member_mats:
        for w, y in ((w_u, Ut), (w_v, Vt)):
            r = y - R @ np.asarray(w).reshape(-1, 1)
            scores.append(float((r ** 2).mean() / max((y ** 2).mean(), 1e-30)))
    return float(np.mean(scores))


def _select_aggregate(exp, stack, recons, *, frames, subsample, kwargs,
                      seed, truth_terms):
    """aggregate='auto': run Stage-2 on the mean AND median aggregate and
    keep the mode whose identified equation cross-validates better on the
    member reconstructions (VERDICT round 4: per-pixel median destroyed
    Burgers-30% discovery, precision 0.19, while mean scored 1.0 — no
    shipped mode should silently do that)."""
    win = _resolve_frames(exp, recons[0], frames)
    member_mats = [build_design_matrix(r, exp.dt, exp.dx, frames=win,
                                       subsample=min(subsample, 0.2),
                                       seed=seed)[:3] for r in recons]
    cv = {}
    for mode in ("mean", "median"):
        agg = (stack.mean(axis=0) if mode == "mean"
               else np.median(stack, axis=0)).astype(stack.dtype)
        s2 = run_stage2(exp, agg, frames=frames, subsample=subsample,
                        kwargs=kwargs, seed=seed, truth_terms=truth_terms)
        cv[mode] = _aggregate_cv_score(s2["w_u"], s2["w_v"], member_mats)
    choice = min(cv, key=cv.get)
    return choice, {"choice": choice, **cv}
