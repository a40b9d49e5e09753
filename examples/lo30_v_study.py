"""LO 30%-noise Stage-2 v-equation diagnosis (round-5, VERDICT item 2).

Round-4 state: with the reference window 50:150 the u-equation is solid
(precision 0.86-1.0, coef rel-L2 0.11) but the v-equation support is wrong
everywhere (recall 0.33, precision 0.13-0.67) — while the published
reference recovers all 6 true v terms at 30% noise (LO stage-2
PDE_FIND_v.py).  Stage-1 recon rel-L2 is healthy (0.068-0.077), so this is
a Stage-2 protocol problem.

This script loads the SAVED round-4 reconstructions (committed npz
artifacts, no TPU needed) and maps the failure:
 1. dump the full Pareto front for v per recon/window: is the true 6-term
    support ON the front (knee-selection problem) or absent (STRidge path
    problem)?
 2. sweep the protocol levers: window x subsample x stability draws x
    must_have(lap_v).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo nice -n 5 python examples/lo30_v_study.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from percnn_tpu.data.io import load_npz
from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.discovery.stridge import (STRidge, discovery_metrics,
                                          pareto_knee, pareto_sweep)
from percnn_tpu.experiments.configs import LO_STAGE1
from percnn_tpu.experiments.pipeline import TRUTH_TERMS

OUT = "runs/round5"
os.makedirs(OUT, exist_ok=True)
LOG = os.path.join(OUT, "lo30_v_study.jsonl")

exp = dataclasses.replace(LO_STAGE1, noise_pct=0.3)
TRUE_V = TRUTH_TERMS["lambda_omega"]["v"]
TRUE_U = TRUTH_TERMS["lambda_omega"]["u"]

RECONS = {
    "mean": "runs/round4/ens_lo30_mean/lo_stage1.stage1_recon.npz",
    "s0": "runs/round4/ens_lo30_s0/lo_stage1.stage1_recon.npz",
    "s2": "runs/round4/ens_lo30_s2/lo_stage1.stage1_recon.npz",
}


def record(row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row, default=float) + "\n")
    print(json.dumps(row, default=float), flush=True)


def truth_vec(names, table):
    v = np.zeros((len(names), 1))
    for t, c in table.items():
        v[names.index(t)] = c
    return v


def support_str(names, w):
    return ",".join(f"{names[i]}:{w[i,0]:+.3f}"
                    for i in np.flatnonzero(np.abs(w[:, 0]) > 1e-12))


def main():
    for tag, path in RECONS.items():
        recon = load_npz(path)
        for win_name, win in (("50:150", slice(50, 150)),
                              ("0:100", slice(0, 100)),
                              ("50:250", slice(50, 250))):
            for sub in (0.2, 1.0):
                R, Ut, Vt, names = build_design_matrix(
                    recon, exp.dt, exp.dx, frames=win, subsample=sub, seed=0)
                tv = truth_vec(names, TRUE_V)
                true_idx = sorted(np.flatnonzero(tv[:, 0]))
                lapv = names.index("ones*lap_v")
                for mh_name, mh in (("none", None), ("lap_v", lapv)):
                    trainer = STRidge(R, Vt)
                    gam, ls, l0, ws = pareto_sweep(
                        trainer, maxit=20, stridge_iters=20, lam=1e-4,
                        d_tol=5.0, must_have=mh)
                    ki = pareto_knee(ls, l0)
                    # is the true support anywhere on the sweep?
                    on_sweep = None
                    for i, w in enumerate(ws):
                        sup = sorted(np.flatnonzero(np.abs(w[:, 0]) > 1e-12))
                        if sup == true_idx:
                            on_sweep = i
                            break
                    m = discovery_metrics(ws[ki], tv)
                    record({
                        "tag": f"{tag}_{win_name}_sub{sub}_mh{mh_name}",
                        "eq": "v", "knee_gamma": float(gam[ki]),
                        "knee_l0": int(l0[ki]),
                        "true_support_on_sweep": on_sweep is not None,
                        "true_support_gamma": (float(gam[on_sweep])
                                               if on_sweep is not None else None),
                        **{f"v_{k}": v for k, v in m.items()},
                        "knee_support": support_str(names, ws[ki]),
                        "sweep_l0": [int(x) for x in l0],
                    })
    print("study done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
