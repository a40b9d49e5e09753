"""Round-3 TPU run queue: GS3D seed-robustness table + the published
noise-robustness matrix (Stage-1 -> Stage-2 -> Stage-3 at 0-30% noise for
Burgers and lambda-omega, mirroring PDE_FIND_u.py:294-298 / LO :290-294).

Run unattended: PYTHONPATH=/root/repo nohup python examples/queue_round3.py &
Appends one JSON line per completed run to runs/round3/queue_results.jsonl.
"""
import dataclasses
import json
import os
import time
import traceback

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

OUT = "runs/round3"
os.makedirs(OUT, exist_ok=True)
RESULTS = os.path.join(OUT, "queue_results.jsonl")


def record(tag, payload):
    payload = {"tag": tag, "time": time.time(), **payload}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(payload, default=float) + "\n")
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: "
          f"{json.dumps(payload, default=float)[:300]}", flush=True)


def guarded(tag, fn):
    t0 = time.time()
    try:
        out = fn()
        record(tag, {"ok": True, "minutes": (time.time() - t0) / 60, **out})
    except Exception as e:
        record(tag, {"ok": False, "minutes": (time.time() - t0) / 60,
                     "error": f"{type(e).__name__}: {e}"})
        traceback.print_exc()


def warmup_ys_path():
    """Probe the hoisted-ys k=5 backward compile; fall back to the round-2
    path if it fails (keeps the queue alive on compiler trouble)."""
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
    from percnn_tpu.ops.pallas import backward2d as B

    cfg = PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025, dx=0.01,
                       diffusion="sigmoid", mu_up=0.01, init_scale=0.5,
                       init="fanin")
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (100, 100, 2),
                                 jnp.float32)

    def loss(p, h):
        return jnp.mean(B.fused_rollout_tp_2d(p, h, cfg, 200)[1:] ** 2)

    try:
        g = jax.grad(loss)(params, h0)
        jax.block_until_ready(g)
        return {"ys_path": True}
    except Exception as e:
        B.YS_PATH_ENABLED = False
        return {"ys_path": False, "error": f"{type(e).__name__}: {e}"[:200]}


def gs3d_seed(seed):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=f"{OUT}/gs3d_seed{seed}",
                         cache_dir="data_cache", seed=seed)
    return {"seed": seed, "rel_l2": res["rel_l2"]}


def noise_run(name, pct, stage1_iters=8000, tag_suffix=""):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_discovery_pipeline

    exp = EXPERIMENTS[name]
    exp = dataclasses.replace(exp, noise_pct=pct)
    res = run_discovery_pipeline(
        exp, out_dir=f"{OUT}/noise_{name}_{int(pct * 100)}{tag_suffix}",
        cache_dir="data_cache", stage1_iters=stage1_iters,
        steps_per_call=20)
    out = {"system": name, "noise_pct": pct,
           "stage1_rel_l2": res["stage1"].get("rel_l2"),
           "stage3_rel_l2": res["stage3"].get("rel_l2")}
    for eq in ("u", "v"):
        m = res["stage2"].get(f"metrics_{eq}")
        if m:
            out[f"s2_{eq}_rel_l2"] = m["rel_l2"]
            out[f"s2_{eq}_precision"] = m["precision"]
            out[f"s2_{eq}_recall"] = m["recall"]
        w = res["stage2"][f"w_{eq}"]
        names = res["stage2"]["names"]
        nz = [(names[i], float(w[i])) for i in range(len(names))
              if abs(float(w[i])) > 1e-8]
        out[f"s2_{eq}_terms"] = nz
    return out


if __name__ == "__main__":
    guarded("warmup_ys", warmup_ys_path)
    # early robustness signal: two GS3D seeds with the new guards
    for s in (0, 1):
        guarded(f"gs3d_seed{s}", lambda s=s: gs3d_seed(s))
    # the noise matrix: new levels first (5% Burgers / 10% LO were validated
    # in round 2); reruns of those two close the uniform-protocol table
    for name, pct in (
        ("burgers_stage1", 0.0), ("lo_stage1", 0.0),
        ("burgers_stage1", 0.10), ("lo_stage1", 0.05),
        ("burgers_stage1", 0.20), ("lo_stage1", 0.20),
        ("burgers_stage1", 0.30), ("lo_stage1", 0.30),
    ):
        guarded(f"noise_{name}_{int(pct * 100)}",
                lambda n=name, p=pct: noise_run(n, p))
    for s in (2, 3):
        guarded(f"gs3d_seed{s}", lambda s=s: gs3d_seed(s))
    for name, pct in (("burgers_stage1", 0.05), ("lo_stage1", 0.10)):
        guarded(f"noise_{name}_{int(pct * 100)}",
                lambda n=name, p=pct: noise_run(n, p))
    record("queue_done", {})
