"""Render the 0-30% noise-robustness matrix from queue_results.jsonl as a
markdown table next to the reference's published values.

Reference values transcribed from the comment blocks at
DataDrivenDiscoveryOfPDEs/2D_Burgers_eqn/Stage-2/PDE_FIND_u.py:294-298,
PDE_FIND_v.py:292-296, and 2D_Lambda_Omega_eqn/stage-2/PDE_FIND_{u,v}.py
:290-294 (their committed runs).
"""
import json
import sys

REF = {
    ("burgers_stage1", "u"): {
        0:  {"lap": 0.005008, "true": {"u*u_x": -0.9823, "v*u_y": -0.9921}, "spurious": 0},
        5:  {"lap": 0.005057, "true": {"u*u_x": -0.9871, "v*u_y": -0.9941}, "spurious": 0},
        10: {"lap": 0.005194, "true": {"u*u_x": -0.9901, "v*u_y": -0.9925}, "spurious": 0},
        20: {"lap": 0.005544, "true": {"u*u_x": -0.9780, "v*u_y": -0.9893}, "spurious": 0},
        30: {"lap": 0.005605, "true": {"u*u_x": -0.9895, "v*u_y": -0.3746}, "spurious": 8},
    },
    ("burgers_stage1", "v"): {
        0:  {"lap": 0.005023, "true": {"u*v_x": -0.9838, "v*v_y": -0.9713}, "spurious": 0},
        5:  {"lap": 0.005255, "true": {"u*v_x": -0.9878, "v*v_y": -0.9885}, "spurious": 0},
        10: {"lap": 0.005310, "true": {"u*v_x": -0.9776, "v*v_y": -0.9764}, "spurious": 0},
        20: {"lap": 0.005284, "true": {"u*v_x": -0.9757, "v*v_y": -0.8933}, "spurious": 2},
        30: {"lap": 0.005662, "true": {"u*v_x": -0.9699, "v*v_y": -0.8577}, "spurious": 2},
    },
    ("lo_stage1", "u"): {
        0:  {"lap": 0.09465, "spurious": 0}, 5: {"lap": 0.09678, "spurious": 0},
        10: {"lap": 0.09916, "spurious": 0}, 20: {"lap": 0.10968, "spurious": 0},
        30: {"lap": 0.11337, "spurious": 0},
    },
    ("lo_stage1", "v"): {
        0:  {"lap": 0.09455, "spurious": 0}, 5: {"lap": 0.09534, "spurious": 0},
        10: {"lap": 0.09910, "spurious": 1}, 20: {"lap": 0.10013, "spurious": 1},
        30: {"lap": 0.10201, "spurious": 1},
    },
}


def main(path="runs/round3/queue_results.jsonl"):
    rows = {}
    for line in open(path):
        r = json.loads(line)
        if r.get("tag", "").startswith("noise_") and r.get("ok"):
            # later lines win: a "_full" (reference-budget Stage-1) redo row
            # supersedes its first-pass 8000-iter entry
            rows[(r["system"], int(round(r["noise_pct"] * 100)))] = r

    for system in ("burgers_stage1", "lo_stage1"):
        print(f"\n### {system}\n")
        print("| noise | eq | ours: coef rel-L2 / precision / recall | "
              "ours lap coef | ref lap coef | spurious ours vs ref | "
              "stage-1 rel-L2 | stage-3 rel-L2 |")
        print("|---|---|---|---|---|---|---|---|")
        for pct in (0, 5, 10, 20, 30):
            r = rows.get((system, pct))
            mark = ""
            if r is not None and r["tag"].endswith("_full"):
                mark = "*"
            elif r is not None and r["tag"].endswith("_ens"):
                mark = "†"
            elif r is not None and r["tag"].endswith("_stable"):
                mark = "‡"
            elif r is not None and r["tag"].endswith("_r5"):
                mark = "§"
            for eq in ("u", "v"):
                ref = REF[(system, eq)][pct]
                if r is None:
                    print(f"| {pct}% | {eq} | (not run) | — | {ref['lap']:.4g} "
                          f"| — vs {ref['spurious']} | — | — |")
                    continue
                terms = dict(r.get(f"s2_{eq}_terms", []))
                lap = next((v for k, v in terms.items() if "lap" in k), None)
                lap_s = f"{lap:.4g}" if lap is not None else "—"
                prec = r.get(f"s2_{eq}_precision", float("nan"))
                rec = r.get(f"s2_{eq}_recall", float("nan"))
                n_true = 3 if system == "burgers_stage1" else 6
                spur = (len(terms) - round(rec * n_true)
                        if terms and rec == rec else "—")
                m = (f"{r.get(f's2_{eq}_rel_l2', float('nan')):.3g} / "
                     f"{prec:.2f} / {rec:.2f}")
                s1 = r.get("stage1_rel_l2")
                s3 = r.get("stage3_rel_l2")
                print(f"| {pct}%{mark} | {eq} | {m} | {lap_s} | {ref['lap']:.4g} | "
                      f"{spur} vs {ref['spurious']} | "
                      f"{s1 if s1 is None else f'{s1:.3g}'} | "
                      f"{s3 if s3 is None else f'{s3:.3g}'} |")
        print("\n(* = reference-budget Stage-1 redo row; † = init-seed-"
              "ensemble Stage-1 mean aggregate (LO: 4 members; Burgers: 3) "
              "+ stability-selection Stage-2, LO with the round-5 "
              "high-noise identifiability fix; "
              "‡ = reference-budget Stage-1 + stability-selection Stage-2 "
              "on the same saved reconstruction; "
              "§ = round-5 rerun under the current noise-aware Stage-2 "
              "default — LO at ≥20% noise regresses the reference's 50:150 "
              "window, examples/lo20_protocol_row.py)")

    import os
    full_path = os.path.join(os.path.dirname(path) or ".",
                             "queue_results_fullmatrix.jsonl")
    if os.path.exists(full_path):
        frows = {}
        for line in open(full_path):
            r = json.loads(line)
            frows[(r["system"], int(round(r["noise_pct"] * 100)))] = r
        print("\n### Stage-2 full-design-matrix refinement (subsample 1.0 "
              "vs the protocol's 0.2; same saved reconstructions, except "
              "rows whose canonical entry was since rerun on a fresh "
              "reconstruction — marked § above)\n")
        print("| noise | eq | subsampled: rel-L2 / prec / rec (spurious) | "
              "full matrix: rel-L2 / prec / rec (spurious) |")
        print("|---|---|---|---|")
        for system in ("burgers_stage1", "lo_stage1"):
            for pct in (0, 5, 10, 20, 30):
                f = frows.get((system, pct))
                r = rows.get((system, pct))
                if f is None:
                    continue
                for eq in ("u", "v"):
                    def cell(src):
                        if src is None:
                            return "—"
                        terms = dict(src.get(f"s2_{eq}_terms", []))
                        rec = src.get(f"s2_{eq}_recall", float("nan"))
                        n_true = 3 if system == "burgers_stage1" else 6
                        spur = (len(terms) - round(rec * n_true)
                                if terms and rec == rec else "—")
                        return (f"{src.get(f's2_{eq}_rel_l2', float('nan')):.3g} / "
                                f"{src.get(f's2_{eq}_precision', float('nan')):.2f} / "
                                f"{rec:.2f} ({spur})")
                    print(f"| {system} {pct}% | {eq} | {cell(r)} | {cell(f)} |")

    study_path = os.path.join(os.path.dirname(path) or ".",
                              "lo20_stage2_study.jsonl")
    if os.path.exists(study_path):
        print("\n### LO Stage-2 window study (same recons, both regression "
              "windows, Pareto knee)\n")
        print("| run | window | subsample | u: rel-L2 / prec / rec | "
              "v: rel-L2 / prec / rec |")
        print("|---|---|---|---|---|")
        for line in open(study_path):
            r = json.loads(line)
            run = r.get("run", "noise_lo_stage1_20").split("/")[-1]
            print(f"| {run} | {r['frames']} | {r['subsample']} | "
                  f"{r['u_rel_l2']:.3g} / {r['u_precision']:.2f} / "
                  f"{r['u_recall']:.2f} | "
                  f"{r['v_rel_l2']:.3g} / {r['v_precision']:.2f} / "
                  f"{r['v_recall']:.2f} |")

    stable_path = "runs/round4/stage2_stable.jsonl"
    if os.path.exists(stable_path):
        print("\n### Stability-selection Stage-2 (majority-vote support over "
              "8 subsample draws + full-matrix refit; same recons)\n")
        print("| run | u: rel-L2 / prec / rec | v: rel-L2 / prec / rec |")
        print("|---|---|---|")
        for line in open(stable_path):
            r = json.loads(line)
            print(f"| {r['tag']} | {r['s2_u_rel_l2']:.3g} / "
                  f"{r['s2_u_precision']:.2f} / {r['s2_u_recall']:.2f} | "
                  f"{r['s2_v_rel_l2']:.3g} / {r['s2_v_precision']:.2f} / "
                  f"{r['s2_v_recall']:.2f} |")

    ens_path = "runs/round4/ensemble_discovery.jsonl"
    if os.path.exists(ens_path):
        print("\n### Ensemble-rescued discovery at 30% noise (same "
              "measurement, init-seed ensemble; Stage-2/3 on the "
              "aggregated reconstruction)\n")
        print("| row | u: rel-L2 / prec / rec | v: rel-L2 / prec / rec | "
              "stage-3 rel-L2 |")
        print("|---|---|---|---|")
        for line in open(ens_path):
            r = json.loads(line)
            def trip(eq):
                rl = r.get(f"s2_{eq}_rel_l2")
                p = r.get(f"s2_{eq}_precision")
                rc = r.get(f"s2_{eq}_recall")
                if rl is None or p is None or rc is None:
                    return "—"
                return f"{rl:.3g} / {p:.2f} / {rc:.2f}"
            s3 = r.get("stage3_rel_l2")
            print(f"| {r['tag']} | {trip('u')} | {trip('v')} | "
                  f"{s3 if s3 is None else f'{s3:.3g}'} |")

    robust = "runs/round5/gs3d_robustness.md"
    if os.path.exists(robust):
        # canonical round-5 table (restart-ladder protocol) supersedes the
        # per-tag history below
        with open(robust) as f:
            body = f.read().split("\n", 1)[1]
        print("\n### GS3D seed robustness (48^3, 12000 iters, round-5 "
              "failure-recovery stack)\n" + body.strip())
        return

    seeds = {}  # keyed by tag: the resumed and fresh seed-0 rows both count
    for line in open(path):
        r = json.loads(line)
        if r.get("tag", "").startswith("gs3d_seed") and r.get("ok"):
            seeds[r["tag"]] = r
    if seeds:
        print("\n### GS3D seed robustness (48^3, 12000 iters, spike "
              "watchdog + best-by-metric)\n")
        print("| seed | rel-L2 | minutes | note |")
        print("|---|---|---|---|")
        vals = []
        for tag in sorted(seeds):
            r = seeds[tag]
            vals.append(r["rel_l2"])
            note = ("restored (queue v1)" if r.get("restored")
                    else "fresh single-process rerun" if tag.endswith("_fresh")
                    else "resumed across VM reset" if r.get("resumed") else "")
            print(f"| {r['seed']} | {r['rel_l2']:.4f} | {r['minutes']:.0f} "
                  f"| {note} |")
        import statistics
        print(f"\nmean rel-L2 {statistics.mean(vals):.4f}, max "
              f"{max(vals):.4f} over {len(vals)} seeds "
              "(reference anchors its 3D claims on single runs of this "
              "NaN-prone workload, train_3drd.py:427-434).")


if __name__ == "__main__":
    main(*sys.argv[1:])
