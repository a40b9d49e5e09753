"""Round-3 queue v2: the noise matrix (fixed pipeline import) + GS3D seed
reruns for seeds without an ok result yet.  Run AFTER queue_round3 exits;
honours PERCNN_DISABLE_MXU=1 (set by the orchestrator if the MXU path
measured slower or failed to compile).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from queue_round3 import OUT, RESULTS, guarded, gs3d_seed, noise_run, record  # noqa: E402


def done_tags():
    tags = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            row = json.loads(line)
            if row.get("ok"):
                tags.add(row["tag"])
    return tags


if __name__ == "__main__":
    done = done_tags()
    record("queue2_start", {"done_already": sorted(done),
                            "mxu_disabled": os.environ.get(
                                "PERCNN_DISABLE_MXU", "") == "1"})
    # Reference-faithful Stage-1 budgets (stage1_iters=None -> the config
    # defaults: Burgers 10000 its rcnn_Burgers...py:936, LO 15000 :924).
    # The first pass trained at 8000; Stage-2 on ground-truth data recovers
    # LO coefficients to ~1%, so remaining coefficient bias is Stage-1
    # convergence — worth the extra minutes per run.
    for name, pct in (
        ("burgers_stage1", 0.0), ("lo_stage1", 0.0),
        ("burgers_stage1", 0.10), ("lo_stage1", 0.05),
        ("burgers_stage1", 0.20), ("lo_stage1", 0.20),
        ("burgers_stage1", 0.30), ("lo_stage1", 0.30),
        ("burgers_stage1", 0.05), ("lo_stage1", 0.10),
    ):
        tag = f"noise_{name}_{int(pct * 100)}"
        if tag not in done:
            guarded(tag, lambda n=name, p=pct: noise_run(n, p,
                                                         stage1_iters=None))
    # seed 0 is the round-2 destabilizer the spike watchdog targets; 1-3
    # completed in queue v1 (rows restored after the VM reset).
    for s in (0, 1, 2, 3):
        tag = f"gs3d_seed{s}"
        if tag not in done:
            guarded(tag, lambda s=s: gs3d_seed(s))
    # Redo the two 8000-iter first-pass runs under the full protocol; the
    # report generator keys by (system, pct) and takes the last ok row.
    for name, pct in (("lo_stage1", 0.0), ("burgers_stage1", 0.10)):
        tag = f"noise_{name}_{int(pct * 100)}_full"
        if tag not in done:
            guarded(tag, lambda n=name, p=pct: noise_run(
                n, p, stage1_iters=None, tag_suffix="_full"))
    record("queue2_done", {})
