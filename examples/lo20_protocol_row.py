"""Rerun the canonical LO 20%-noise row under the CURRENT Stage-2 protocol.

The round-3 `noise_lo_stage1_20` row predates the noise-aware default
regression window (pipeline.default_stage2_frames: lambda-omega at >=20%
noise regresses the reference's 50:150 window instead of 0:100) and
carries v precision 0.80 / recall 0.67.  The window study on the same
(since-erased) reconstruction showed the 50:150 window recovers the
reference's own 20% v-row support shape — 6 true terms + 1 spurious,
recall 1.0 (runs/round3/lo20_stage2_study.jsonl).  The reconstruction
artifact is gone, so this reruns Stage-1 at the reference budget (15000
iters, TPU) and Stage-2/3 with the current default protocol, then appends
the superseding `noise_lo_stage1_20_r5` row (later-line-wins in
noise_matrix_report).

Also logs (non-canonically) the round-5 high-noise reweighted Stage-2 on
the same fresh reconstruction, to place the 20% row on the
identifiability curve (runs/round5/lo20_protocol_study.jsonl).

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python \
       examples/lo20_protocol_row.py > runs/round5/lo20_row.log 2>&1 &
"""
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402

ROW_PATH = "runs/round3/queue_results.jsonl"
STUDY = "runs/round5/lo20_protocol_study.jsonl"
OUT = "runs/round5/lo20_row"
TAG = "noise_lo_stage1_20_r5"


def _s2_fields(s2):
    names = s2["names"]
    row = {}
    for eq in ("u", "v"):
        m = s2.get(f"metrics_{eq}") or {}
        w = np.ravel(np.asarray(s2[f"w_{eq}"]))
        row[f"s2_{eq}_rel_l2"] = m.get("rel_l2")
        row[f"s2_{eq}_precision"] = m.get("precision")
        row[f"s2_{eq}_recall"] = m.get("recall")
        row[f"s2_{eq}_terms"] = [(names[i], float(w[i]))
                                 for i in range(len(names))
                                 if abs(w[i]) > 1e-8]
    return row


def main():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import (run_discovery_pipeline,
                                                 run_stage2)

    exp = dataclasses.replace(EXPERIMENTS["lo_stage1"], noise_pct=0.2)
    res = run_discovery_pipeline(exp, out_dir=OUT, cache_dir="data_cache",
                                 steps_per_call=20)

    row = {"tag": TAG, "time": time.time(), "ok": True,
           "system": "lo_stage1", "noise_pct": 0.2,
           "stage1_rel_l2": res["stage1"].get("rel_l2"),
           "stage3_rel_l2": res["stage3"].get("rel_l2"),
           **_s2_fields(res["stage2"])}
    with open(ROW_PATH, "a") as f:
        f.write(json.dumps(row, default=float) + "\n")
    print(json.dumps({k: v for k, v in row.items() if "terms" not in k},
                     default=float), flush=True)

    # study line: the >=25% off-attractor reweighting applied at 20%
    hn = dataclasses.replace(exp, noise_pct=0.3)  # trip the high-noise path
    recon = res["stage1"]["frames"]
    s2_hn = run_stage2(hn, np.asarray(recon))
    with open(STUDY, "a") as f:
        f.write(json.dumps({"variant": "reweighted_at_20",
                            **_s2_fields(s2_hn)}, default=float) + "\n")
    print("study:", json.dumps({k: v for k, v in _s2_fields(s2_hn).items()
                                if "terms" not in k}, default=float))


if __name__ == "__main__":
    main()
