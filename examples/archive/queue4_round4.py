"""Round-4 TPU queue: finish the round-3 leftovers.

1. gs3d_seed0 — resume the interrupted run (ckpt at step ~6000/12000) to
   complete the 4-seed GS3D robustness table (VERDICT r2 #4).
2. lo_0_full / burgers_10_full — full-Stage-1-budget redo rows for the two
   first-pass 8000-iter noise-matrix entries.
3. burgers_0 Stage-3-only fill — its stage3 ckpt was never committed.

Each completed row force-adds its (gitignored) artifacts and commits, so a
VM reset can't erase finished work again.

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python examples/queue4_round4.py
"""
import json
import os
import subprocess
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(__file__))
from queue_round3 import noise_run  # noqa: E402

OUT = "runs/round3"
RESULTS = os.path.join(OUT, "queue_results.jsonl")


def record(tag, payload):
    payload = {"tag": tag, "time": time.time(), **payload}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(payload, default=float) + "\n")
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: "
          f"{json.dumps(payload, default=float)[:300]}", flush=True)


def commit(tag, run_dir):
    try:
        subprocess.run(["git", "add", "-f", run_dir, RESULTS],
                       cwd="/root/repo", check=True)
        subprocess.run(["git", "commit", "-q", "-m",
                        f"queue artifacts: {tag}"],
                       cwd="/root/repo", check=False)
    except Exception:
        traceback.print_exc()


def guarded(tag, run_dir, fn):
    t0 = time.time()
    try:
        out = fn()
        record(tag, {"ok": True, "minutes": (time.time() - t0) / 60, **out})
    except Exception as e:
        record(tag, {"ok": False, "minutes": (time.time() - t0) / 60,
                     "error": f"{type(e).__name__}: {e}"})
        traceback.print_exc()
    commit(tag, run_dir)


def done_tags():
    tags = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            row = json.loads(line)
            if row.get("ok"):
                tags.add(row["tag"])
    return tags


def wait_for_tpu():
    """A killed TPU-holding process wedges the grant for up to ~25 min;
    probe before starting runs (memory: axon-pythonpath-gotcha)."""
    for i in range(40):
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180, capture_output=True)
        if r.returncode == 0:
            print(f"TPU up (probe {i})", flush=True)
            return
        time.sleep(90)
    raise RuntimeError("TPU never came up")


def gs3d_seed0_resume():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=f"{OUT}/gs3d_seed0",
                         cache_dir="data_cache", seed=0, resume=True)
    return {"seed": 0, "rel_l2": res["rel_l2"], "resumed": True}


def gs3d_seed0_fresh():
    """Uninterrupted seed-0 trajectory: the first gs3d_seed0 row was a
    stalled queue-2 run resumed by queue 4 at the stage boundary — a valid
    checkpoint-resume trajectory, but the seed table should also carry a
    clean single-process run of the known-fragile seed."""
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=f"{OUT}/gs3d_seed0_fresh",
                         cache_dir="data_cache", seed=0)
    return {"seed": 0, "rel_l2": res["rel_l2"]}


def burgers0_stage3_fill():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_stage3_from_coefs

    d = f"{OUT}/noise_burgers_stage1_0"
    res = run_stage3_from_coefs(
        EXPERIMENTS["burgers_stage1"],
        f"{d}/burgers_stage1.stage2_coefs.npz",
        out_dir=d, cache_dir="data_cache")
    return {"stage3_rel_l2": res["stage3"].get("rel_l2")}


if __name__ == "__main__":
    wait_for_tpu()
    done = done_tags()
    record("queue4_start", {"done_already": sorted(done)})
    if "gs3d_seed0" not in done:
        guarded("gs3d_seed0", f"{OUT}/gs3d_seed0", gs3d_seed0_resume)
    for name, pct in (("lo_stage1", 0.0), ("burgers_stage1", 0.10)):
        tag = f"noise_{name}_{int(pct * 100)}_full"
        if tag not in done:
            guarded(tag, f"{OUT}/noise_{name}_{int(pct * 100)}_full",
                    lambda n=name, p=pct: noise_run(
                        n, p, stage1_iters=None, tag_suffix="_full"))
    if "burgers0_stage3_fill" not in done:
        guarded("burgers0_stage3_fill", f"{OUT}/noise_burgers_stage1_0",
                burgers0_stage3_fill)
    if "gs3d_seed0_fresh" not in done:
        guarded("gs3d_seed0_fresh", f"{OUT}/gs3d_seed0_fresh",
                gs3d_seed0_fresh)
    record("queue4_done", {})
