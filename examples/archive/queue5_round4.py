"""Round-4 TPU queue 5: GS3D robustness validation behind the ensemble pass.

1. gs3d_seed0_recover — rerun the known-fragile seed 0 with the new
   `TrainConfig.lr_recover=1.002` (watchdog LR restoration).  The fresh
   seed-0 trajectory is deterministic (same init seed, same noise draw), so
   the ~step-5100 spike re-fires; the question is whether restoring
   lr_scale afterwards recovers the healthy-seed loss floor (1.6e-3) and
   rel-L2 (<0.05) instead of finishing LR-starved at 0.122.
2. gs3d_seed4 — extend the seed table (VERDICT r2 #4 asks >=4 healthy
   members) so the robustness claim doesn't hinge on one seed.

Waits for the queue4 follow-up (ensemble discovery) to release the TPU.
Resumable: done tags in runs/round3/queue_results.jsonl; artifacts are
force-added and committed per row (VM resets erase gitignored npz).

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python examples/queue5_round4.py
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

OUT = "runs/round4"
RESULTS = "runs/round3/queue_results.jsonl"


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


def wait_for_predecessor():
    """Block until the queue4 follow-up (ensemble pass) exits."""
    pid = None
    try:
        pid = int(open("/tmp/queue4_followup.pid").read().strip())
    except Exception:
        return
    while True:
        try:
            os.kill(pid, 0)
        except OSError:
            return
        time.sleep(60)


def wait_for_tpu():
    """A killed TPU-holding process wedges the grant for up to ~25 min."""
    for i in range(40):
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180, capture_output=True)
        if r.returncode == 0:
            print(f"TPU up (probe {i})", flush=True)
            return
        time.sleep(90)
    raise RuntimeError("TPU never came up")


def gs3d(seed, out_dir):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=out_dir,
                         cache_dir="data_cache", seed=seed)
    return {"seed": seed, "rel_l2": res["rel_l2"], "lr_recover": 1.002}


if __name__ == "__main__":
    wait_for_predecessor()
    wait_for_tpu()
    done = done_tags()
    record("queue5_start", {"done_already": sorted(
        t for t in done if t.startswith("gs3d"))})
    for tag, seed in (("gs3d_seed0_recover", 0), ("gs3d_seed4", 4)):
        if tag not in done:
            d = f"{OUT}/{tag}"
            guarded(tag, d, lambda s=seed, dd=d: gs3d(s, dd))
    record("queue5_done", {})
