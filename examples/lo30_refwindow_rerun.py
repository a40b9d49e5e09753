"""LO 30%-noise Stage-2 rerun under the noise-aware window default.

The round-4 lo30 ensemble aggregate rows (runs/round4/ensemble_discovery
.jsonl: lo30_ens_mean u-precision 0.375, lo30_ens_median 0.75) were
regressed on LO's old always-0:100 window.  The round-3 window study
(runs/round3/lo20_stage2_study.jsonl, RESULTS.md round-3 addendum) showed
the trade-off inverts at >=20% noise: the early window inherits the
measurement noise while the reference's 50:150 window (PDE_FIND_u.py:
220-222) stays clean.  `pipeline.default_stage2_frames` is now
noise-aware; this script reruns Stage-2 on the SAVED lo30 reconstructions
(members + mean/median aggregates — no retraining, CPU-only) under the
new default and appends `lo30_refwin_*` rows next to the old-window rows.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python examples/lo30_refwindow_rerun.py
"""
import dataclasses
import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
from percnn_tpu.data.io import load_npz  # noqa: E402
from percnn_tpu.experiments import EXPERIMENTS  # noqa: E402
from percnn_tpu.experiments.pipeline import (  # noqa: E402
    default_stage2_frames, run_stage2, run_stage2_stable,
)

OUT = "runs/round4"
RESULTS = os.path.join(OUT, "ensemble_discovery.jsonl")


def record(row):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row, default=float) + "\n")
    print({k: v for k, v in row.items() if not str(k).endswith("terms")},
          flush=True)


def flatten(s2):
    names = s2["names"]
    out = {}
    for eq in ("u", "v"):
        m = s2[f"metrics_{eq}"]
        w = np.ravel(np.asarray(s2[f"w_{eq}"]))
        out[f"s2_{eq}_rel_l2"] = float(m["rel_l2"])
        out[f"s2_{eq}_precision"] = float(m["precision"])
        out[f"s2_{eq}_recall"] = float(m["recall"])
        out[f"s2_{eq}_terms"] = [(names[i], float(w[i]))
                                 for i in range(len(names)) if abs(w[i]) > 1e-8]
    return out


def main():
    exp = dataclasses.replace(EXPERIMENTS["lo_stage1"], noise_pct=0.3)
    win = default_stage2_frames(exp)
    assert win == slice(50, 150), win  # the noise-aware default kicked in

    paths = {f"s{k}": os.path.join(OUT, f"ens_lo30_s{k}",
                                   "lo_stage1.stage1_recon.npz")
             for k in range(4)}
    paths["mean"] = os.path.join(OUT, "ens_lo30_mean",
                                 "lo_stage1.stage1_recon.npz")
    paths["median"] = os.path.join(OUT, "ens_lo30_median",
                                   "lo_stage1.stage1_recon.npz")

    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            done = {json.loads(line).get("tag") for line in f if line.strip()}

    for key, path in paths.items():
        if f"lo30_refwin_{key}" in done:
            print(f"skip {key}: already recorded", flush=True)
            continue
        if not os.path.exists(path):
            print(f"skip {key}: {path} missing", flush=True)
            continue
        recon = load_npz(path)
        t0 = time.time()
        if key in ("mean", "median"):
            # aggregates get the headline protocol: stability selection
            s2 = run_stage2_stable(exp, recon, draws=8, seed=0)
        else:
            s2 = run_stage2(exp, recon, seed=0)
        row = {"tag": f"lo30_refwin_{key}", "window": "50:150",
               "minutes": (time.time() - t0) / 60, **flatten(s2)}
        record(row)

    try:
        subprocess.run(["git", "add", "-f", RESULTS], cwd="/root/repo",
                       check=True)
        subprocess.run(["git", "commit", "-q", "-m",
                        "lo30 Stage-2 rerun on the saved recons under the "
                        "noise-aware reference window"],
                       cwd="/root/repo", check=False)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
