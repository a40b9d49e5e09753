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
            rows[(r["system"], int(round(r["noise_pct"] * 100)))] = r

    for system in ("burgers_stage1", "lo_stage1"):
        print(f"\n### {system}\n")
        print("| noise | eq | ours: coef rel-L2 / precision / recall | "
              "ours lap coef | ref lap coef | spurious ours vs ref | "
              "stage-1 rel-L2 | stage-3 rel-L2 |")
        print("|---|---|---|---|---|---|---|---|")
        for pct in (0, 5, 10, 20, 30):
            r = rows.get((system, pct))
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
                print(f"| {pct}% | {eq} | {m} | {lap_s} | {ref['lap']:.4g} | "
                      f"{spur} vs {ref['spurious']} | "
                      f"{s1 if s1 is None else f'{s1:.3g}'} | "
                      f"{s3 if s3 is None else f'{s3:.3g}'} |")

    seeds = {}
    for line in open(path):
        r = json.loads(line)
        if r.get("tag", "").startswith("gs3d_seed") and r.get("ok"):
            seeds[r["seed"]] = r
    if seeds:
        print("\n### GS3D seed robustness (48^3, 12000 iters, spike "
              "watchdog + best-by-metric)\n")
        print("| seed | rel-L2 | minutes | note |")
        print("|---|---|---|---|")
        vals = []
        for s in sorted(seeds):
            r = seeds[s]
            vals.append(r["rel_l2"])
            note = "restored (queue v1)" if r.get("restored") else ""
            print(f"| {s} | {r['rel_l2']:.4f} | {r['minutes']:.0f} | {note} |")
        import statistics
        print(f"\nmean rel-L2 {statistics.mean(vals):.4f}, max "
              f"{max(vals):.4f} over {len(vals)} seeds "
              "(reference anchors its 3D claims on single runs of this "
              "NaN-prone workload, train_3drd.py:427-434).")


if __name__ == "__main__":
    main(*sys.argv[1:])
