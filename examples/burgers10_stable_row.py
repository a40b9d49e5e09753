"""Supersede the canonical Burgers-10% noise-matrix row with the
stability-selection Stage-2 result on the SAME saved reference-budget
reconstruction.

The `noise_burgers_stage1_10_full` row carries the protocol draw's
v-equation lottery failure (precision 0.50); the stability-selection
sweep already showed u AND v exact on the same recon
(runs/round4/stage2_stable.jsonl, RESULTS.md round 4).  This reruns
Stage-2 (8 draws, voted support, full-matrix refit) + Stage-3 through the
pipeline and appends the superseding `noise_burgers_stage1_10_stable`
row (later-line-wins in noise_matrix_report).

Run (CPU): PYTHONPATH=/root/repo python examples/burgers10_stable_row.py
"""
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

RECON = "runs/round3/noise_burgers_stage1_10_full/burgers_stage1.stage1_recon.npz"
ROW_PATH = "runs/round3/queue_results.jsonl"
OUT = "runs/round5/burgers10_stable"


def main():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_discovery_pipeline

    exp = dataclasses.replace(EXPERIMENTS["burgers_stage1"], noise_pct=0.10)
    res = run_discovery_pipeline(
        exp, out_dir=OUT, cache_dir="data_cache", stage1_recon=RECON,
        stage2_draws=8, steps_per_call=20)

    row = {"tag": "noise_burgers_stage1_10_stable", "time": time.time(),
           "ok": True, "system": "burgers_stage1", "noise_pct": 0.10,
           # same reconstruction as the _full row it supersedes
           "stage1_rel_l2": 0.0653,
           "stage3_rel_l2": res["stage3"].get("rel_l2")}
    s2 = res["stage2"]
    names = s2["names"]
    for eq in ("u", "v"):
        m = s2.get(f"metrics_{eq}") or {}
        w = np.ravel(np.asarray(s2[f"w_{eq}"]))
        row[f"s2_{eq}_rel_l2"] = m.get("rel_l2")
        row[f"s2_{eq}_precision"] = m.get("precision")
        row[f"s2_{eq}_recall"] = m.get("recall")
        row[f"s2_{eq}_terms"] = [(names[i], float(w[i]))
                                 for i in range(len(names))
                                 if abs(w[i]) > 1e-8]
    with open(ROW_PATH, "a") as f:
        f.write(json.dumps(row, default=float) + "\n")
    print(json.dumps({k: v for k, v in row.items() if "terms" not in k},
                     default=float))


if __name__ == "__main__":
    main()
