"""Round-4 TPU queue 6: finish the in-flight round-4 work after a VM reset.

The previous session died between LO-30% ensemble member 3 and the
aggregate step.  This queue resumes, in value order:

1. lo30 ensemble aggregate (all 4 member recons are committed, so
   `ensemble_discovery.py lo_stage1 0.3 4` skips training and runs the
   mean/median Stage-2(stable)+Stage-3 directly) — the LO 30% row is the
   one place the framework trails the published reference.
2. gs3d_seed0_recover — the known-fragile seed with the new
   `TrainConfig.lr_recover=1.002` (queue5 intent: does restoring lr_scale
   after the deterministic ~step-5100 spike recover the healthy-seed
   rel-L2 <0.05 instead of finishing LR-starved at 0.122?).
3. gs3d_seed4 — extend the robustness table to 5 seeds.
4. burgers30 ensemble (3 members; member 0 retrains — the round-3 recon
   was lost to a VM reset).
5. Regenerate the Stage-2 study + noise-matrix/stage3 reports and commit.

Resumable: ensemble members/aggregates short-circuit on saved recon npz
files (ensemble_discovery.py) plus aggregate tags in
runs/round4/ensemble_discovery.jsonl; gs3d tags in
runs/round3/queue_results.jsonl.  Artifacts are force-added and committed
per row (VM resets erase gitignored npz).

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python examples/queue6_round4.py
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

REPO = "/root/repo"
OUT = "runs/round4"
RESULTS = "runs/round3/queue_results.jsonl"
ENS_RESULTS = os.path.join(OUT, "ensemble_discovery.jsonl")


def record(tag, payload):
    payload = {"tag": tag, "time": time.time(), **payload}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(payload, default=float) + "\n")
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: "
          f"{json.dumps(payload, default=float)[:300]}", flush=True)


def commit(tag, paths):
    try:
        subprocess.run(["git", "add", "-f", *paths, RESULTS],
                       cwd=REPO, check=True)
        subprocess.run(["git", "commit", "-q", "-m",
                        f"queue artifacts: {tag}"],
                       cwd=REPO, check=False)
    except Exception:
        traceback.print_exc()


def done_tags():
    tags = set()
    for path in (RESULTS, ENS_RESULTS):
        if os.path.exists(path):
            for line in open(path):
                row = json.loads(line)
                if row.get("ok", True):  # ens rows have no ok field
                    tags.add(row["tag"])
    return tags


def run_child(argv, tag):
    """Run a child python script inline (shares the TPU grant serially)."""
    env = dict(os.environ, PYTHONPATH="/root/.axon_site:/root/repo")
    r = subprocess.run([sys.executable, *argv], cwd=REPO, env=env)
    print(f"[{time.strftime('%H:%M:%S')}] {tag} rc={r.returncode}",
          flush=True)
    return r.returncode


def gs3d(seed, out_dir):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=out_dir,
                         cache_dir="data_cache", seed=seed)
    return {"seed": seed, "rel_l2": res["rel_l2"], "lr_recover": 1.002}


def guarded(tag, run_dir, fn):
    t0 = time.time()
    try:
        out = fn()
        record(tag, {"ok": True, "minutes": (time.time() - t0) / 60, **out})
    except Exception as e:
        record(tag, {"ok": False, "minutes": (time.time() - t0) / 60,
                     "error": f"{type(e).__name__}: {e}"})
        traceback.print_exc()
    commit(tag, [run_dir])


def reports():
    env = dict(os.environ, PYTHONPATH="/root/.axon_site:/root/repo",
               JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "examples/lo20_stage2_study.py"],
                   cwd=REPO, env=env)
    subprocess.run([sys.executable, "examples/stage2_stable_study.py"],
                   cwd=REPO, env=env)
    for script, out in (("examples/noise_matrix_report.py",
                         "runs/round3/noise_matrix.md"),
                        ("examples/stage3_coef_report.py",
                         "runs/round3/stage3_coefs.md")):
        with open(out, "w") as f:
            subprocess.run([sys.executable, script], cwd=REPO, env=env,
                           stdout=f, stderr=subprocess.STDOUT)
    commit("round-4 report regeneration",
           ["runs/round3/noise_matrix.md", "runs/round3/stage3_coefs.md",
            "runs/round4/stage2_stable.jsonl",
            "runs/round3/lo20_stage2_study.jsonl"])


if __name__ == "__main__":
    done = done_tags()
    record("queue6_start", {"done_already": sorted(
        t for t in done if t.startswith(("gs3d", "lo30_ens", "burgers30")))})

    # 1. lo30 aggregate (members all saved -> goes straight to aggregate)
    if "lo30_ens_median" not in done:
        run_child(["examples/ensemble_discovery.py", "lo_stage1", "0.3", "4"],
                  "lo30_ensemble")

    # 2-3. GS3D robustness
    for tag, seed in (("gs3d_seed0_recover", 0), ("gs3d_seed4", 4)):
        if tag not in done:
            d = f"{OUT}/{tag}"
            guarded(tag, d, lambda s=seed, dd=d: gs3d(s, dd))

    # 4. burgers30 ensemble (member 0 retrains; ~20 min/member)
    if "burgers30_ens_median" not in done:
        run_child(["examples/ensemble_discovery.py", "burgers_stage1",
                   "0.3", "3"], "burgers30_ensemble")

    # 5. reports
    reports()
    record("queue6_done", {})
