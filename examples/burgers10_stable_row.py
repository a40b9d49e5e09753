"""Supersede a canonical Burgers noise-matrix row with the
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
With `30` as argv[1]: the 30% variant on the round-4 3-member ensemble
MEAN aggregate reconstruction (tag noise_burgers_stage1_30_ens,
stage1_rel_l2 recomputed vs clean truth) — run on the TPU; the reference's
own 30% u-row degrades to 8 spurious terms (PDE_FIND_u.py:298) while the
ensemble recon recovers both equations exactly.
"""
import dataclasses
import json
import os
import sys
import time

import jax

PCT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
if PCT == 10:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

if PCT == 10:
    RECON = "runs/round3/noise_burgers_stage1_10_full/burgers_stage1.stage1_recon.npz"
    TAG, S1 = "noise_burgers_stage1_10_stable", 0.0653
else:
    RECON = "runs/round4/ens_burgers30_mean/burgers_stage1.stage1_recon.npz"
    TAG, S1 = "noise_burgers_stage1_30_ens", None
ROW_PATH = "runs/round3/queue_results.jsonl"
OUT = f"runs/round5/burgers{PCT}_stable"


def main():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_discovery_pipeline

    exp = dataclasses.replace(EXPERIMENTS["burgers_stage1"], noise_pct=PCT / 100)
    res = run_discovery_pipeline(
        exp, out_dir=OUT, cache_dir="data_cache", stage1_recon=RECON,
        stage2_draws=8, steps_per_call=20)

    s1 = S1
    if s1 is None:
        from percnn_tpu.data.io import load_npz
        from percnn_tpu.experiments.runner import make_dataset
        from percnn_tpu.utils.metrics import rel_l2

        truth = make_dataset(exp, warmup=0, cache_dir="data_cache")
        agg = load_npz(RECON)
        t = min(truth.shape[0], agg.shape[0])
        s1 = float(rel_l2(agg[:t], truth[:t]))
    row = {"tag": TAG, "time": time.time(),
           "ok": True, "system": "burgers_stage1", "noise_pct": PCT / 100,
           # stage-1 number is the (aggregate) reconstruction vs clean truth
           "stage1_rel_l2": s1,
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
