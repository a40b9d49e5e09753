"""Stage-2-only full-design-matrix refinement pass over the noise-matrix
reconstructions (CPU; seconds per system with the Gram-matrix solver).

The queue's noise runs follow the reference protocol: 20% row subsample
(PDE_FIND_u.py:246-247).  At low noise the lambda-omega cubic library is
so collinear on-attractor that the subsampled regression keeps small
spurious terms; the FULL matrix recovers the clean equation (measured:
0% noise precision 0.6 -> 1.0).  This script re-regresses every completed
noise run at subsample=1.0 and appends to
runs/round3/queue_results_fullmatrix.jsonl for the report generator.

Run AFTER the queue: PYTHONPATH=/root/repo python examples/stage2_fullmatrix.py
Optional argv[1] = row subsample (default 1.0); results land in
queue_results_sub<pct>.jsonl (1.0 keeps the historical _fullmatrix name).
"""
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

OUT = "runs/round3"
RESULTS = os.path.join(OUT, "queue_results.jsonl")
SUBSAMPLE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
FULL = os.path.join(
    OUT, "queue_results_fullmatrix.jsonl" if SUBSAMPLE == 1.0
    else f"queue_results_sub{int(SUBSAMPLE * 100)}.jsonl")


def truth_vec(lib, system, eq):
    coef = np.zeros((len(lib), 1))
    for t, c in TRUTH_TERMS[system].get(eq, {}).items():
        coef[lib.index(t)] = c
    return coef


def main():
    lib = gen_library()
    done = set()
    if os.path.exists(FULL):
        for line in open(FULL):
            done.add(json.loads(line)["tag"])
    todo = []
    for line in open(RESULTS):
        row = json.loads(line)
        tag = row.get("tag", "")
        if row.get("ok") and tag.startswith("noise_") and tag not in done:
            todo.append(row)
    for row in todo:
        tag = row["tag"]
        name = row["system"]
        exp = EXPERIMENTS[name]
        recon_path = os.path.join(OUT, tag, f"{exp.name}.stage1_recon.npz")
        if not os.path.exists(recon_path):
            print(f"{tag}: no recon at {recon_path}; skipping")
            continue
        recon = load_npz(recon_path)
        frames = (slice(0, 100) if exp.system == "lambda_omega"
                  else slice(50, 150))
        R, Ut, Vt, names = build_design_matrix(
            recon, exp.dt, exp.dx, frames=frames, subsample=SUBSAMPLE,
            seed=row.get("seed", 0))
        out = {"tag": tag, "system": name, "noise_pct": row["noise_pct"],
               "subsample": SUBSAMPLE}
        for eq, col in (("u", Ut), ("v", Vt)):
            if exp.system == "lambda_omega":
                w, pareto = pareto_select(STRidge(R, col), maxit=50,
                                          stridge_iters=40, lam=1e-4,
                                          d_tol=5.0)
                out[f"s2_{eq}_gamma"] = float(pareto["selected_gamma"])
            else:
                w = STRidge(R, col).train(
                    must_have=5 if eq == "u" else 6, maxit=50,
                    stridge_iters=40, lam=1e-4, d_tol=5.0, kappa=1.0)
            m = discovery_metrics(w, truth_vec(lib, exp.system, eq))
            out[f"s2_{eq}_rel_l2"] = float(m["rel_l2"])
            out[f"s2_{eq}_precision"] = float(m["precision"])
            out[f"s2_{eq}_recall"] = float(m["recall"])
            out[f"s2_{eq}_terms"] = [
                (names[i], float(np.ravel(w)[i])) for i in range(len(names))
                if abs(float(np.ravel(w)[i])) > 1e-8]
        with open(FULL, "a") as f:
            f.write(json.dumps(out) + "\n")
        print(f"{tag}: u prec={out['s2_u_precision']:.2f} "
              f"rel={out['s2_u_rel_l2']:.4f}; "
              f"v prec={out['s2_v_precision']:.2f} "
              f"rel={out['s2_v_rel_l2']:.4f}", flush=True)


if __name__ == "__main__":
    main()
