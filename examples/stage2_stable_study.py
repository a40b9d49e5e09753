"""Stability-selection Stage-2 pass over every saved reconstruction.

Motivated by the burgers 10%-full row: on the SAME reconstruction, three
subsample seeds give three different supports (one breaks u, one breaks v,
one is exact — RESULTS.md round 4).  `run_stage2_stable` majority-votes
the support over 8 independent draws and refits it on the full design
matrix, turning the draw lottery into a deterministic answer.

Scans runs/round3/noise_* and runs/round4/ens_* run dirs for saved
`*.stage1_recon.npz` artifacts (plus any dirs given as argv) and appends
one row per recon to runs/round4/stage2_stable.jsonl (resumable by tag).

Run: PYTHONPATH=/root/repo python examples/stage2_stable_study.py [dir ...]
"""
import glob
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from percnn_tpu.data.io import load_npz  # noqa: E402
from percnn_tpu.experiments import EXPERIMENTS  # noqa: E402
from percnn_tpu.experiments.pipeline import run_stage2_stable  # noqa: E402

OUT = "runs/round4"
RESULTS = os.path.join(OUT, "stage2_stable.jsonl")
DRAWS = 8


def find_recons():
    hits = []
    dirs = sys.argv[1:] or (sorted(glob.glob("runs/round3/noise_*"))
                            + sorted(glob.glob("runs/round4/ens_*")))
    for d in dirs:
        for name in ("burgers_stage1", "lo_stage1"):
            p = os.path.join(d, f"{name}.stage1_recon.npz")
            if os.path.exists(p):
                hits.append((os.path.basename(d.rstrip("/")), name, p))
    return hits


def main():
    os.makedirs(OUT, exist_ok=True)
    done = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            done.add(json.loads(line)["tag"])
    for tag, name, path in find_recons():
        if tag in done:
            continue
        exp = EXPERIMENTS[name]
        s2 = run_stage2_stable(exp, load_npz(path), draws=DRAWS, seed=0)
        names = s2["names"]
        row = {"tag": tag, "system": name, "draws": DRAWS}
        for eq in ("u", "v"):
            m = s2[f"metrics_{eq}"]
            w = np.ravel(np.asarray(s2[f"w_{eq}"]))
            row[f"s2_{eq}_rel_l2"] = float(m["rel_l2"])
            row[f"s2_{eq}_precision"] = float(m["precision"])
            row[f"s2_{eq}_recall"] = float(m["recall"])
            row[f"s2_{eq}_terms"] = [
                (names[i], float(w[i]), float(s2[f"votes_{eq}"][i]))
                for i in np.flatnonzero(np.abs(w) > 1e-8)]
        with open(RESULTS, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"{tag}: u {row['s2_u_rel_l2']:.4f}/"
              f"{row['s2_u_precision']:.2f}/{row['s2_u_recall']:.2f}  "
              f"v {row['s2_v_rel_l2']:.4f}/{row['s2_v_precision']:.2f}/"
              f"{row['s2_v_recall']:.2f}", flush=True)


if __name__ == "__main__":
    main()
