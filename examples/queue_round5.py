"""Round-5 TPU queue — THE consolidated resumable orchestrator.

Replaces the queue2..queue6 generations (VERDICT round 4 #7): one task
framework (tag short-circuit + guarded run + per-task artifact commit +
strict-JSON rows) and one round-5 task list, in value order:

1. midscale3d_isg  — pregenerate the shared ISG checkpoint for the 3D
   48^3 multi-chip validation on the TPU (the costliest CPU stage;
   examples/cpu_chain_round5.sh polls for it, then trains the
   single-device control and the halo_2x2x2 mesh variant on the
   virtual-8-device CPU mesh).
2. lo30_fix        — rerun the LO 30%-noise ensemble discovery on the
   four SAVED member reconstructions with the round-5 high-noise
   identifiability fix (pipeline.run_stage2: off-attractor row
   reweighting + [lap, linear] must_have at noise >= 25%), and append
   the canonical noise-matrix row (noise_lo_stage1_30_ens supersedes
   the broken round-3 row by later-line-wins in noise_matrix_report).
3. gs3d seeds      — fresh GS3D runs for the failing seeds 0 and 4 plus
   new seeds 5,6 under the round-5 robustness machinery (probe_every
   stability probe + .stable checkpoint + select_stable_candidate +
   spike_reset_opt, runner.py).  Rows record diverged/stable_frames/
   candidate so a diverged seed can never masquerade as healthy
   (ADVICE round 4).
4. gs3d_table      — assemble the >=7-seed robustness table from every
   recorded seed row (rounds 3-5).
5. reports         — regenerate the canonical noise matrix + stage-3
   coefficient report.

Resume: every task short-circuits on its tag in
runs/round5/queue_results.jsonl (ok rows only); artifacts are
force-committed per task (VM resets erase gitignored files).

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python \
       examples/queue_round5.py >> runs/round5/queue.log 2>&1 &
"""
import dataclasses
import json
import math
import os
import subprocess
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402

REPO = "/root/repo"
OUT = "runs/round5"
RESULTS = os.path.join(OUT, "queue_results.jsonl")
MATRIX_RESULTS = "runs/round3/queue_results.jsonl"  # noise_matrix source
ISG_SHARED = "runs/round4/midscale3d_isg.npz"


def _sanitize(x):
    """Strict JSON: non-finite floats -> None (ADVICE round 4)."""
    if isinstance(x, dict):
        return {k: _sanitize(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_sanitize(v) for v in x]
    if isinstance(x, (float, np.floating)) and not math.isfinite(float(x)):
        return None
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    return x


def record(tag, payload, path=RESULTS):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = _sanitize({"tag": tag, "time": time.time(), **payload})
    with open(path, "a") as f:
        f.write(json.dumps(payload, default=float, allow_nan=False) + "\n")
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: "
          f"{json.dumps(payload, default=float)[:400]}", flush=True)


def commit(tag, paths):
    try:
        subprocess.run(["git", "add", "-f", *paths, RESULTS, MATRIX_RESULTS],
                       cwd=REPO, check=True)
        subprocess.run(["git", "commit", "-q", "-m",
                        f"round-5 queue artifacts: {tag}"],
                       cwd=REPO, check=False)
    except Exception:
        traceback.print_exc()


def done_tags():
    tags = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            row = json.loads(line)
            if row.get("ok", True):
                tags.add(row["tag"])
    return tags


def guarded(tag, fn, commit_paths=()):
    t0 = time.time()
    try:
        out = fn()
        record(tag, {"ok": True, "minutes": (time.time() - t0) / 60, **out})
    except Exception as e:
        record(tag, {"ok": False, "minutes": (time.time() - t0) / 60,
                     "error": f"{type(e).__name__}: {e}"[:300]})
        traceback.print_exc()
    if commit_paths:
        commit(tag, list(commit_paths))


# ---------------------------------------------------------------------------
# tasks
# ---------------------------------------------------------------------------

def midscale3d_exp():
    """EXACT copy of examples/multichip_midscale3d.py's EXP (the shared ISG
    must see the identical problem/measurement)."""
    from percnn_tpu.experiments import GS3D_RECON

    return dataclasses.replace(
        GS3D_RECON, name="gs3d_recon_mid", train_steps=150, curriculum=(),
        infer_steps=200,
        train=dataclasses.replace(GS3D_RECON.train, n_iters=400,
                                  log_every=100),
    )


def midscale3d_isg():
    """TPU-side ISG pretrain for the 3D midscale validation: the upsampler
    sees only the seed-0 noisy IC, identical across the single/halo
    variants, so one pretrain (minutes on the TPU vs ~4.5 h on the CPU
    where the round-4 chain died mid-pretrain) unblocks both."""
    import jax.numpy as jnp

    from percnn_tpu.core.checkpoint import save_checkpoint
    from percnn_tpu.core.train import pretrain_isg
    from percnn_tpu.experiments.runner import (build_isg_pretrain_loss,
                                               init_model, make_dataset,
                                               setup_problem)

    exp = midscale3d_exp()
    truth = make_dataset(exp, warmup=0, cache_dir="data_cache")
    prob = setup_problem(exp, truth, jnp.float32)
    params = init_model(exp, jax.random.PRNGKey(0), jnp.float32)
    isg = pretrain_isg(build_isg_pretrain_loss(prob), params["isg"],
                       n_iters=exp.isg_pretrain_iters)
    save_checkpoint(ISG_SHARED, isg, {"experiment": exp.name, "seed": 0})
    return {"iters": exp.isg_pretrain_iters, "path": ISG_SHARED}


LO30_MEMBERS = [f"runs/round4/ens_lo30_s{k}/lo_stage1.stage1_recon.npz"
                for k in range(4)]


def _s2_row(s2):
    names = s2["names"]
    out = {}
    for eq in ("u", "v"):
        m = s2.get(f"metrics_{eq}") or {}
        w = np.ravel(np.asarray(s2[f"w_{eq}"]))
        out[f"s2_{eq}_rel_l2"] = m.get("rel_l2")
        out[f"s2_{eq}_precision"] = m.get("precision")
        out[f"s2_{eq}_recall"] = m.get("recall")
        out[f"s2_{eq}_terms"] = [(names[i], float(w[i]))
                                 for i in range(len(names))
                                 if abs(w[i]) > 1e-8]
    return out


def lo30_fix():
    """LO 30% ensemble discovery rerun on the saved member recons with the
    high-noise Stage-2 identifiability fix.  Appends the superseding
    canonical matrix row."""
    from percnn_tpu.data.io import load_npz
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_ensemble_discovery
    from percnn_tpu.experiments.runner import make_dataset
    from percnn_tpu.utils.metrics import rel_l2

    exp = dataclasses.replace(EXPERIMENTS["lo_stage1"], noise_pct=0.3)
    d = os.path.join(OUT, "ens_lo30_fix")
    # no stability draws: the high-noise protocol regresses the FULL
    # design matrix (pipeline.run_stage2), so every subsample draw is
    # identical and the single fit is already deterministic
    res = run_ensemble_discovery(
        exp, 4, out_dir=d, cache_dir="data_cache",
        member_recons=LO30_MEMBERS, aggregate="mean")

    # per-member rows (UQ story)
    for m in res["members"]:
        record(f"lo30_fix_member{m['member']}", _s2_row(m["stage2"]))

    agg_row = _s2_row(res["stage2"])
    agg_row["stage3_rel_l2"] = res["stage3"].get("rel_l2")
    # stage-1 rel-L2 of the aggregate reconstruction vs clean truth, for
    # the matrix column (the member stage-1 numbers are in round-4 rows)
    truth = make_dataset(exp, warmup=100, cache_dir="data_cache")
    agg = load_npz(res["aggregate_recon"])
    t = min(truth.shape[0], agg.shape[0])
    agg_row["stage1_rel_l2"] = float(rel_l2(agg[:t], truth[:t]))

    # canonical noise-matrix row: later lines win in noise_matrix_report
    record("noise_lo_stage1_30_ens",
           {"ok": True, "system": "lo_stage1", "noise_pct": 0.3, **agg_row},
           path=MATRIX_RESULTS)
    return agg_row


def gs3d(seed, out_dir):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    res = run_experiment(exp, out_dir=out_dir, cache_dir="data_cache",
                         seed=seed)
    return {"seed": seed, "rel_l2": res["rel_l2"],
            "diverged": res.get("diverged"),
            "stable_frames": res.get("stable_frames"),
            "rel_l2_stable": res.get("rel_l2_stable"),
            "candidate": res.get("candidate"),
            "probe_scores": res.get("probe_scores")}


def gs3d_table():
    """>=7-seed robustness table from every recorded gs3d row, rounds 3-5.
    Later rows supersede earlier ones for the same seed+machinery tag."""
    rows = {}
    for path, rnd in ((MATRIX_RESULTS, "r3/4"), (RESULTS, "r5")):
        if not os.path.exists(path):
            continue
        for line in open(path):
            r = json.loads(line)
            if r.get("tag", "").startswith("gs3d") and r.get("ok"):
                rows[(r["tag"], rnd)] = r
    lines = [
        "# GS3D seed-robustness table (rounds 3-5)", "",
        "Reference workload: train_3drd.py:494-558 (48^3, 12000 iters, "
        "10%-noise measurements); healthy-seed parity band rel-L2 "
        "0.02-0.036.  Round-5 rows run with the inference-horizon "
        "stability probe + stable-candidate selection "
        "(runner.select_stable_candidate); 'candidate' says which "
        "checkpoint the probe chose.", "",
        "| run | seed | rel-L2 | diverged | stable_frames | candidate |",
        "|---|---|---|---|---|---|",
    ]
    for (tag, rnd), r in sorted(rows.items()):
        rl = r.get("rel_l2")
        rl = "NaN" if rl is None or (isinstance(rl, float) and not
                                     math.isfinite(rl)) else f"{rl:.4f}"
        lines.append(
            f"| {tag} ({rnd}) | {r.get('seed', '?')} | {rl} | "
            f"{r.get('diverged', '-')} | {r.get('stable_frames', '-')} | "
            f"{r.get('candidate', '-')} |")
    out = os.path.join(OUT, "gs3d_robustness.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"rows": len(rows), "path": out}


def reports():
    env = dict(os.environ, PYTHONPATH="/root/.axon_site:/root/repo",
               JAX_PLATFORMS="cpu")
    for script, out in (("examples/noise_matrix_report.py",
                         "runs/round3/noise_matrix.md"),
                        ("examples/stage3_coef_report.py",
                         "runs/round3/stage3_coefs.md")):
        with open(out, "w") as f:
            subprocess.run([sys.executable, script], cwd=REPO, env=env,
                           stdout=f, stderr=subprocess.STDOUT)
    commit("round-5 report regeneration",
           ["runs/round3/noise_matrix.md", "runs/round3/stage3_coefs.md",
            os.path.join(OUT, "gs3d_robustness.md")])
    return {}


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    done = done_tags()
    record("queue_start", {"done_already": sorted(done)})

    if "midscale3d_isg" not in done:
        guarded("midscale3d_isg", midscale3d_isg, [ISG_SHARED])

    if "lo30_fix" not in done:
        guarded("lo30_fix", lo30_fix, [os.path.join(OUT, "ens_lo30_fix")])

    for tag, seed in (("gs3d_seed0_r5", 0), ("gs3d_seed4_r5", 4),
                      ("gs3d_seed5", 5), ("gs3d_seed6", 6)):
        if tag not in done:
            d = os.path.join(OUT, tag)
            guarded(tag, lambda s=seed, dd=d: gs3d(s, dd), [d])

    guarded("gs3d_table", gs3d_table,
            [os.path.join(OUT, "gs3d_robustness.md")])
    if "reports" not in done:
        guarded("reports", reports)
    record("queue_done", {})
