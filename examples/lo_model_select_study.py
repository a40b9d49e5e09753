"""Model-selection study for the LO Stage-2 gamma ladder: can a principled
selector beat the reference's (eyeballed) Pareto knee and kill the spurious
v-equation `u` term that the reference's own published 20/30% rows keep
(LO stage-2 PDE_FIND_v.py:293-294)?

Selectors compared, on every saved LO reconstruction:
  knee  — the shipped pareto_knee elbow (reference protocol analog)
  bic   — n*ln(RSS/n) + k*ln(n) on the fit rows (expected to overfit: the
          ~1e6 regression rows are spatially correlated, so the ln(n)
          penalty is far too weak relative to the information content)
  aic   — same with 2k penalty (weaker still)
  cv    — refit-free held-out-window validation: the gamma ladder's
          supports are fit (STRidge + lstsq refit) on the protocol window;
          score each support's coefficients by relative residual on the
          COMPLEMENT window of the same reconstruction, pick the support
          minimizing it, break near-ties (<=2% relative) toward sparser.
          A term that models window-local reconstruction bias does not
          generalize across windows; a true term does.

Writes runs/round5/lo_model_select_study.jsonl and prints a table.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.discovery.stridge import (STRidge, discovery_metrics,
                                          pareto_knee, pareto_sweep)
from percnn_tpu.experiments import EXPERIMENTS
from percnn_tpu.experiments.pipeline import (TRUTH_TERMS,
                                             default_stage2_frames)

OUT = "runs/round5/lo_model_select_study.jsonl"

CASES = [
    ("lo0_full", "runs/round3/noise_lo_stage1_0_full/lo_stage1.stage1_recon.npz", 0.0),
    ("lo20_r5", "runs/round5/lo20_row/lo_stage1.stage1_recon.npz", 0.2),
    ("lo30_ens", "runs/round5/ens_lo30_fix/lo_stage1.stage1_recon.ens_mean.npz", 0.3),
    ("lo30_s0", "runs/round4/ens_lo30_s0/lo_stage1.stage1_recon.npz", 0.3),
    ("lo30_s1", "runs/round4/ens_lo30_s1/lo_stage1.stage1_recon.npz", 0.3),
    ("lo30_s2", "runs/round4/ens_lo30_s2/lo_stage1.stage1_recon.npz", 0.3),
    ("lo30_s3", "runs/round4/ens_lo30_s3/lo_stage1.stage1_recon.npz", 0.3),
    ("lo30_mean_r4", "runs/round4/ens_lo30_mean/lo_stage1.stage1_recon.npz", 0.3),
]

SWEEP_KW = dict(maxit=50, stridge_iters=40, lam=1e-4, d_tol=5.0)


def _protocol_matrix(exp, recon, frames, subsample, seed=0):
    """Design matrix + targets with the run_stage2 lambda-omega weighting."""
    R, Ut, Vt, names = build_design_matrix(recon, exp.dt, exp.dx,
                                           frames=frames,
                                           subsample=subsample, seed=seed)
    mh = {"u": None, "v": None}
    if exp.noise_pct >= 0.25:
        iu, iv = names.index("u*ones"), names.index("v*ones")
        amp2 = R[:, iu: iu + 1] ** 2 + R[:, iv: iv + 1] ** 2
        sw = np.sqrt(np.abs(1.0 - amp2) + 1e-3)
        R, Ut, Vt = R * sw, Ut * sw, Vt * sw
        mh = {"u": [names.index("ones*lap_u"), iu],
              "v": [names.index("ones*lap_v"), iv]}
    return R, Ut, Vt, names, mh


def _complement_window(fit: slice, n_frames: int) -> slice:
    """Held-out window: the half of the reconstruction the fit never saw,
    preferring early frames (least accumulated reconstruction error)."""
    if (fit.start or 0) >= 50:
        return slice(0, fit.start)
    return slice(fit.stop, min(n_frames, fit.stop + 100))


def _truth_vec(names, eq):
    coef_true = np.zeros((len(names), 1))
    for t, c in TRUTH_TERMS["lambda_omega"][eq].items():
        coef_true[names.index(t)] = c
    return coef_true


def _levels(ls, l0, ws):
    """Pareto-efficient distinct support sizes -> best index (as in
    pareto_knee), densest first."""
    eff = []
    for i in range(len(ls)):
        if l0[i] == 0:
            continue
        dominated = np.any((ls <= ls[i]) & (l0 <= l0[i])
                           & ((ls < ls[i]) | (l0 < l0[i])) & (l0 > 0))
        if not dominated:
            eff.append(i)
    levels = {}
    for i in eff:
        k = int(l0[i])
        if k not in levels or ls[i] < ls[levels[k]]:
            levels[k] = i
    return levels


def run_case(tag, path, noise):
    exp = dataclasses.replace(EXPERIMENTS["lo_stage1"], noise_pct=noise)
    recon = np.load(path)["uv"]
    fit = default_stage2_frames(exp)
    fit = slice(fit.start, min(fit.stop, recon.shape[0]))
    subsample = 1.0 if noise >= 0.25 else 0.2
    R, Ut, Vt, names, mh = _protocol_matrix(exp, recon, fit, subsample)
    val_w = _complement_window(fit, recon.shape[0])
    Rv, Uv, Vv, _, _ = _protocol_matrix(exp, recon, val_w, 1.0)

    row = {"tag": tag, "noise": noise, "fit": f"{fit.start}:{fit.stop}",
           "val": f"{val_w.start}:{val_w.stop}"}
    for eq, y, yv in (("u", Ut, Uv), ("v", Vt, Vv)):
        trainer = STRidge(R, y)
        gammas, ls, l0, ws = pareto_sweep(trainer, must_have=mh[eq],
                                          **SWEEP_KW)
        levels = _levels(ls, l0, ws)
        idx_of = {k: i for k, i in levels.items()}
        n = R.shape[0]
        crit = {}
        for k, i in idx_of.items():
            rss_fit = ls[i]
            resid_val = yv - Rv @ ws[i]
            rel_val = float(np.linalg.norm(resid_val)
                            / max(np.linalg.norm(yv), 1e-300))
            crit[k] = {
                "bic": n * np.log(max(rss_fit, 1e-300)) + k * np.log(n),
                "aic": n * np.log(max(rss_fit, 1e-300)) + 2 * k,
                "cv": rel_val,
                "ls": float(rss_fit),
                "idx": i,
            }
        picks = {"knee": int(l0[pareto_knee(ls, l0)])}
        picks["bic"] = min(crit, key=lambda k: crit[k]["bic"])
        picks["aic"] = min(crit, key=lambda k: crit[k]["aic"])
        # cv with a sparsity-biased near-tie rule
        best_cv = min(c["cv"] for c in crit.values())
        picks["cv"] = min(k for k, c in crit.items()
                          if c["cv"] <= best_cv * 1.02)
        truth = _truth_vec(names, eq)
        for sel, k in picks.items():
            w = ws[crit[k]["idx"]] if k in crit else ws[pareto_knee(ls, l0)]
            m = discovery_metrics(w, truth)
            row[f"{eq}_{sel}"] = {
                "k": k, "precision": round(m["precision"], 3),
                "recall": round(m["recall"], 3),
                "rel_l2": round(m["rel_l2"], 4),
                **({"cv_resid": round(crit[k]["cv"], 5)} if k in crit else {}),
            }
        row[f"{eq}_ladder"] = {str(k): round(c["cv"], 5)
                               for k, c in sorted(crit.items())}
    return row


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rows = []
    for tag, path, noise in CASES:
        if not os.path.exists(path):
            print(f"skip {tag}: {path} missing")
            continue
        r = run_case(tag, path, noise)
        rows.append(r)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        for eq in ("u", "v"):
            print(f"{tag:14s} {eq}: " + "  ".join(
                f"{sel}=k{r[f'{eq}_{sel}']['k']} "
                f"p{r[f'{eq}_{sel}']['precision']:.2f}/"
                f"r{r[f'{eq}_{sel}']['recall']:.2f}"
                for sel in ("knee", "bic", "aic", "cv")), flush=True)


if __name__ == "__main__":
    main()
