"""Stage-2 regression-window study over the LO noise-matrix recons.

Motivated by the degraded LO 20% row (u: 1 spurious + inflated coefs,
v: recall 0.67) while the reference's committed run reports all 6 terms
with 0-1 spurious (2D_Lambda_Omega_eqn/stage-2/PDE_FIND_{u,v}.py:293).
Stage-2 is seconds on CPU with the Gram solver, so sweep the
protocol-adjacent axes on the SAME saved reconstructions: regression
window (our 0:100 default vs the reference's 50:150), row subsample
(protocol 0.2 vs full), and report the Pareto-knee gamma each variant
selects.  Measured on the 20% recon: the reference window rescues the
row (u 6/6 exact rel-L2 0.11; v 6/6 + the same single spurious the
reference's own 20% v row has) — the early window inherits measurement
noise, the late window is on-attractor-smooth; the opposite of the 0%
trade-off recorded in RESULTS.md round-3.

PYTHONPATH=/root/repo python examples/lo20_stage2_study.py [run_dir ...]
(default: every noise_lo_stage1_* run dir with a saved reconstruction)
Appends one JSON line per variant to runs/round3/lo20_stage2_study.jsonl;
already-done (run, window, subsample) keys are skipped on rerun.
"""
import glob
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from percnn_tpu.data.io import load_npz  # noqa: E402
from percnn_tpu.discovery.library import build_design_matrix  # noqa: E402
from percnn_tpu.discovery.stridge import (  # noqa: E402
    STRidge, discovery_metrics, pareto_select,
)
from percnn_tpu.experiments import EXPERIMENTS  # noqa: E402
from percnn_tpu.experiments.pipeline import TRUTH_TERMS  # noqa: E402
from percnn_tpu.pde.terms import gen_library  # noqa: E402

RUNS = sys.argv[1:] or sorted(
    d for d in glob.glob("runs/round3/noise_lo_stage1_*")
    if os.path.exists(os.path.join(d, "lo_stage1.stage1_recon.npz")))
OUT = "runs/round3/lo20_stage2_study.jsonl"


def truth_vec(lib, eq):
    coef = np.zeros((len(lib), 1))
    for t, c in TRUTH_TERMS["lambda_omega"].get(eq, {}).items():
        coef[lib.index(t)] = c
    return coef


def done_keys():
    keys = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            r = json.loads(line)
            keys.add((r.get("run", "runs/round3/noise_lo_stage1_20"),
                      r["frames"], r["subsample"]))
    return keys


def main():
    exp = EXPERIMENTS["lo_stage1"]
    lib = gen_library()
    done = done_keys()
    recons = {}  # per run dir — the npz load is the expensive part
    for run, frames, sub in ((run, frames, sub) for run in RUNS
                             for frames in (slice(0, 100), slice(50, 150))
                             for sub in (0.2, 1.0)):
        fr = f"{frames.start}:{frames.stop}"
        if (run, fr, sub) in done:
            continue
        if run not in recons:
            recons[run] = load_npz(
                os.path.join(run, "lo_stage1.stage1_recon.npz"))
        recon = recons[run]
        R, Ut, Vt, names = build_design_matrix(
            recon, exp.dt, exp.dx, frames=frames, subsample=sub, seed=0)
        row = {"run": run, "frames": fr, "subsample": sub}
        for eq, col in (("u", Ut), ("v", Vt)):
            w, pareto = pareto_select(STRidge(R, col), maxit=50,
                                      stridge_iters=40, lam=1e-4,
                                      d_tol=5.0)
            m = discovery_metrics(w, truth_vec(lib, eq))
            nz = [(names[i], float(np.ravel(w)[i]))
                  for i in range(len(names))
                  if abs(float(np.ravel(w)[i])) > 1e-8]
            row[f"{eq}_gamma"] = float(pareto["selected_gamma"])
            row[f"{eq}_rel_l2"] = float(m["rel_l2"])
            row[f"{eq}_precision"] = float(m["precision"])
            row[f"{eq}_recall"] = float(m["recall"])
            row[f"{eq}_terms"] = nz
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print({k: v for k, v in row.items() if not k.endswith("terms")},
              flush=True)


if __name__ == "__main__":
    main()
