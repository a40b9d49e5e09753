"""Round-5b TPU queue — GS3D seed rescue under the restart ladder.

Seeds 0/4/5 failed the round-5 robustness bar (rel-L2 0.110 / 0.214 /
watchdog abort; healthy band 0.02-0.043).  Their stage-2 training losses
(0.00293 / 0.00658 / aborted) sit clearly above the healthy band
(0.00157-0.00165, seeds 1-3,6), so the truth-free restart gate of
`runner.run_experiment_with_restarts` applies: rerun each failed seed with
the INIT seed shifted by 1000 per attempt (measurement noise stays fixed at
exp.seed=66 — the robustness axis is the parameter-init lottery), stop when
an attempt passes the gate, select the lowest-final-stage-loss attempt.

Attempt 0 for each seed already ran in queue_round5.py; this queue runs
attempts 1..2 only and folds the recorded attempt-0 numbers into the
per-seed selection, then rebuilds the robustness table + canonical reports.

Resume: tasks short-circuit on ok rows in runs/round5/queue_results.jsonl.

Run: PYTHONPATH=/root/.axon_site:/root/repo nohup python \
       examples/queue_round5b.py >> runs/round5/queue.log 2>&1 &
"""
import json
import math
import os

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from queue_round5 import (OUT, RESULTS, MATRIX_RESULTS, commit, done_tags,  # noqa: E402
                          guarded, record)

LOSS_GATE = 2.5e-3   # stage-2 healthy band 0.00157-0.00165; bad 0.0029+

# attempt-0 outcomes from queue_round5.py (runs/round5/queue_results.jsonl
# + per-run metrics); final_stage_min_loss computed from the stage-2
# segment of each run's metrics.jsonl.
ATTEMPT0 = {
    0: {"attempt": 0, "init_seed": 0, "out_dir": "runs/round5/gs3d_seed0_r5",
        "rel_l2": 0.11023439449806692, "final_stage_min_loss": 0.00293,
        "diverged": False, "candidate": "best"},
    4: {"attempt": 0, "init_seed": 4, "out_dir": "runs/round5/gs3d_seed4_r5",
        "rel_l2": 0.21407629979046872, "final_stage_min_loss": 0.00658,
        "diverged": False, "candidate": "best"},
    5: {"attempt": 0, "init_seed": 5, "out_dir": "runs/round5/gs3d_seed5",
        "error": "watchdog abort at stage-2 iter 600 (pre-abort_policy=stop)",
        "final_stage_min_loss": None},
}


def rescue(seed):
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.runner import run_experiment

    exp = EXPERIMENTS["gs3d_recon"]
    attempts = [dict(ATTEMPT0[seed])]
    best = dict(ATTEMPT0[seed])
    for attempt in (1, 2):
        tag = f"gs3d_seed{seed}_a{attempt}"
        d = os.path.join(OUT, f"gs3d_seed{seed}_rescue{attempt}")
        s = seed + 1000 * attempt
        res = run_experiment(exp, out_dir=d, cache_dir="data_cache", seed=s)
        row = {"attempt": attempt, "init_seed": s, "out_dir": d,
               "rel_l2": res["rel_l2"], "diverged": res.get("diverged"),
               "stable_frames": res.get("stable_frames"),
               "candidate": res.get("candidate"),
               "final_stage_min_loss": res.get("final_stage_min_loss"),
               "probe_scores": res.get("probe_scores")}
        record(tag, {"ok": True, "seed": seed, **row})
        commit(tag, [d])
        attempts.append(row)
        ml = row["final_stage_min_loss"]
        bl = best.get("final_stage_min_loss")
        if ml is not None and (bl is None or ml < bl):
            best = row
        gated = (row["diverged"] or ml is None or ml > LOSS_GATE)
        if not gated:
            break
    return {"seed": seed, "selected_attempt": best["attempt"],
            "rel_l2": best["rel_l2"],
            "final_stage_min_loss": best.get("final_stage_min_loss"),
            "diverged": best.get("diverged"),
            "candidate": best.get("candidate"),
            "attempts": attempts}


def gs3d_table_v2():
    """Canonical per-seed robustness table: every attempt shown, the
    restart-policy selection (lowest final-stage loss) marked."""
    rows = []
    for path in ("runs/round3/queue_results.jsonl", RESULTS):
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
        if r["tag"].endswith(("_a1", "_a2", "_final")):
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


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    done = done_tags()
    record("queue5b_start", {"done_already": sorted(
        t for t in done if "rescue" in t or t.endswith("_final"))})

    for seed in (0, 4, 5):
        tag = f"gs3d_seed{seed}_final"
        if tag not in done:
            guarded(tag, lambda s=seed: rescue(s))

    guarded("gs3d_table_v2", gs3d_table_v2,
            [os.path.join(OUT, "gs3d_robustness.md")])
    record("queue5b_done", {})
