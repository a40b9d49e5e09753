"""Round-5 TPU queue — THE consolidated resumable orchestrator.

One task framework (tag short-circuit + guarded run + per-task artifact
commit + strict-JSON rows) and ONE round-5 task list (the b/c/d follow-on
generations are folded in; their originals live in examples/archive/):

1. midscale3d_isg  — pregenerate the shared ISG checkpoint for the 3D
   48^3 multi-chip validation on the TPU (the costliest CPU stage;
   examples/cpu_chain_round5.sh polls for it, then trains the
   single-device control and the halo_2x2x2 mesh variant on the
   virtual-8-device CPU mesh -> runs/round4/multichip_midscale3d.jsonl).
2. lo30_fix        — rerun the LO 30%-noise ensemble discovery on the
   four SAVED member reconstructions with the round-5 high-noise
   identifiability fix (pipeline.run_stage2: off-attractor row
   reweighting + [lap, linear] must_have at noise >= 25%), and append
   the canonical noise-matrix row (noise_lo_stage1_30_ens supersedes
   the broken round-3 row by later-line-wins in noise_matrix_report).
3. burgers30_ens   — canonical Burgers 30%-noise row on the SAVED
   round-4 3-member ensemble MEAN reconstruction (stability-selection
   Stage-2 + Stage-3), superseding the round-3 single-model row.
4. gs3d seeds      — GS3D 48^3 full-budget runs for seeds 0,4,5,6,7,8
   under the complete failure-recovery stack: inference-horizon
   stability probe + .stable checkpoint + select_stable_candidate,
   spike_reset_opt, graceful watchdog abort, and the truth-free restart
   ladder (runner.run_experiment_with_restarts: retry with the INIT
   seed shifted +1000 per attempt when training aborts, the rollout
   diverges, or the final-stage loss exceeds LOSS_GATE; measurement
   noise stays fixed at exp.seed=66 — the robustness axis is the
   parameter-init lottery).  Rows record diverged/stable_frames/
   candidate so a diverged seed can never masquerade as healthy
   (ADVICE round 4).  Seeds 1,2,3 carry over from rounds 3/4 rows.
5. gs3d_table      — assemble the 9-seed robustness table (all attempts
   shown, the ladder's truth-free selection marked) ->
   runs/round5/gs3d_robustness.md.
6. reports         — regenerate the canonical noise matrix + stage-3
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

# Truth-free restart gate on the final-stage training loss.  Healthy GS3D
# basins reach 0.00153-0.00175 (rel-L2 0.014-0.043 over 9 seeds); the one
# 0.0019 basin landed rel-L2 0.0555 and bad basins sit at 0.0029+.
LOSS_GATE = 1.85e-3


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


def burgers30_ens():
    """Canonical Burgers 30% row: stability-selection Stage-2 + Stage-3 on
    the saved round-4 ensemble mean reconstruction."""
    env = dict(os.environ, PYTHONPATH="/root/.axon_site:/root/repo")
    r = subprocess.run(
        [sys.executable, "examples/burgers10_stable_row.py", "30"],
        cwd=REPO, env=env, capture_output=True, text=True)
    tail = (r.stdout or "").strip().splitlines()
    if r.returncode != 0:
        raise RuntimeError(f"rc={r.returncode}: {(r.stderr or '')[-800:]}")
    return {"row": tail[-1] if tail else None}


def gs3d_seed(seed):
    """One GS3D seed under the full failure-recovery stack (restart
    ladder); returns the selected attempt + full attempt log."""
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment_with_restarts

    exp = EXPERIMENTS["gs3d_recon"]
    d = os.path.join(OUT, f"gs3d_seed{seed}")
    res = run_experiment_with_restarts(
        exp, out_dir=d, cache_dir="data_cache", seed=seed,
        max_restarts=3, loss_gate=LOSS_GATE)
    attempts = res["attempts"]
    ok_attempts = [a for a in attempts
                   if a.get("final_stage_min_loss") is not None]
    sel = (min(ok_attempts, key=lambda a: a["final_stage_min_loss"])
           ["attempt"] if ok_attempts else None)
    return {"seed": seed, "selected_attempt": sel,
            "rel_l2": res.get("rel_l2"),
            "final_stage_min_loss": res.get("final_stage_min_loss"),
            "diverged": res.get("diverged"),
            "candidate": res.get("candidate"),
            "attempts": attempts}


def gs3d_table():
    """Canonical per-seed robustness table: every attempt shown, the
    restart-ladder selection (lowest final-stage loss) marked."""
    rows = []
    for path in (MATRIX_RESULTS, RESULTS):
        if not os.path.exists(path):
            continue
        for line in open(path):
            r = json.loads(line)
            if r.get("tag", "").startswith("gs3d") and "seed" in r:
                rows.append(r)
    final = {r["seed"]: r for r in rows
             if r["tag"].endswith("_final") and r.get("ok")}

    # per-seed attempt lists: rescued seeds carry their own attempt log;
    # the rest are single healthy runs (prefer the round-5 machinery row)
    per_seed = {}
    for seed, sel in final.items():
        per_seed[seed] = (sel.get("attempts", []),
                          sel.get("selected_attempt"))
    for r in rows:
        seed = r["seed"]
        if seed in per_seed or not r.get("ok", True):
            continue
        if r["tag"].endswith(("_a1", "_a2", "_a3", "_final")):
            continue
        per_seed[seed] = ([{**r, "attempt": 0, "init_seed": seed}], 0)

    def fmt(x, n=4):
        if x is None or (isinstance(x, float) and not math.isfinite(x)):
            return "—"
        return f"{x:.{n}f}"

    lines = [
        "# GS3D seed-robustness table (rounds 3-5)", "",
        "Reference workload: train_3drd.py:494-558 (48^3, 12000 iters, 10%-"
        "noise measurements).  The robustness axis is the parameter-init "
        "lottery (measurement noise fixed at exp.seed=66).  Round-5 runs "
        "use the full failure-recovery stack: inference-horizon stability "
        "probe + stable-candidate selection, spike_reset_opt, graceful "
        "watchdog abort, and the truth-free restart ladder "
        "(runner.run_experiment_with_restarts: retry with init seed "
        "shifted +1000 when training aborts, the rollout diverges, or the "
        f"final-stage loss stays above {LOSS_GATE:g}; healthy band "
        "0.00157-0.00165).  'selected' marks the ladder's truth-free "
        "choice (lowest final-stage training loss).", "",
        "| seed | attempt | init seed | rel-L2 | stage-2 min loss | "
        "diverged | candidate | selected |",
        "|---|---|---|---|---|---|---|---|",
    ]
    selected_rel = {}
    for seed in sorted(per_seed):
        attempts, chosen = per_seed[seed]
        for a in attempts:
            sel = a.get("attempt") == chosen
            if sel:
                selected_rel[seed] = a.get("rel_l2")
            rl = "aborted" if "error" in a else fmt(a.get("rel_l2"))
            lines.append(
                f"| {seed} | {a.get('attempt', 0)} | "
                f"{a.get('init_seed', seed)} | {rl} | "
                f"{fmt(a.get('final_stage_min_loss'), 5)} | "
                f"{a.get('diverged', '—')} | {a.get('candidate', '—')} | "
                f"{'x' if sel else ''} |")
    finite = [v for v in selected_rel.values()
              if v is not None and math.isfinite(v)]
    lines += ["", "Selected-attempt rel-L2 per seed: "
              + ", ".join(f"{k}: {fmt(v)}"
                          for k, v in sorted(selected_rel.items()))
              + (f" — worst {fmt(max(finite))}, "
                 f"mean {fmt(sum(finite) / len(finite))}" if finite else "")]
    out = os.path.join(OUT, "gs3d_robustness.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"path": out, "seeds": sorted(per_seed),
            "selected_rel_l2": {str(k): v
                                for k, v in sorted(selected_rel.items())}}


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


# Rows already recorded by the pre-consolidation b/c/d runs short-circuit
# under their historical tags.
LEGACY_DONE = {"gs3d_seed6_final": ("gs3d_seed6",)}

if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    done = done_tags()
    record("queue_start", {"done_already": sorted(done)})

    if "midscale3d_isg" not in done:
        guarded("midscale3d_isg", midscale3d_isg, [ISG_SHARED])

    if "lo30_fix" not in done:
        guarded("lo30_fix", lo30_fix, [os.path.join(OUT, "ens_lo30_fix")])

    if "burgers30_ens" not in done:
        guarded("burgers30_ens", burgers30_ens,
                ["runs/round5/burgers30_stable", MATRIX_RESULTS])

    for seed in (0, 4, 5, 6, 7, 8):
        tag = f"gs3d_seed{seed}_final"
        if tag in done or any(t in done for t in LEGACY_DONE.get(tag, ())):
            continue
        guarded(tag, lambda s=seed: gs3d_seed(s))
        cand = [os.path.join(OUT, f"gs3d_seed{seed}{suf}")
                for suf in ("", "_rescue1", "_rescue2", "_rescue3")]
        commit(tag, [p for p in cand if os.path.exists(p)])

    guarded("gs3d_table", gs3d_table,
            [os.path.join(OUT, "gs3d_robustness.md")])
    if "reports" not in done:
        guarded("reports", reports)
    record("queue_done", {})
