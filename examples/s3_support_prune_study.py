"""Dynamics-based Stage-2 support pruning: can the Stage-3 rollout fit
(truth-free: validation data loss on the held-out measurement split)
distinguish the 7-term v-equation (6 true + the on-attractor-collinear
spurious `u`) from the true 6-term support?

Background (runs/round5/lo_model_select_study.jsonl + RESULTS round 5):
the spurious `u` term in the identified λ–Ω v-equation at ≥20% noise is
not noise — it is the on-attractor (A²≈1) collinearity splitting the true
−u·A² = −(u³+uv²) coefficient across the collinear {u, u³, uv²} columns
(recovered: c_u + mean(c_u³, c_uv²) ≈ −1 to <1%; the reference's own
published 20/30% v-rows carry the same split, PDE_FIND_v.py:293-294).
No static design-matrix criterion can resolve the split (BIC/AIC overfit;
held-out-window CV keeps it — the bias is global to the reconstruction).
But a ROLLOUT traverses the spiral core and the off-attractor transient,
where the equivalence class separates: if the true support fits the
measurements as well as the split one, a sparsity-biased comparison of
Stage-3 validation losses selects it — an L0 test the reference could
not afford (its Stage-3 is a hand-edited torch script per support,
fine_tuning_[...].py:123-130; ours is one call on TPU).

Variants per case:
  keep      — the identified support as-is (7-term v)
  prune_u   — drop the spurious `u*ones` from w_v (true 6-term support)
  drop_true — drop `v**3*ones` (a TRUE term) instead: the control; the
              criterion must separate this sharply or it is useless.

Writes runs/round5/s3_prune_study.jsonl.
Run: PYTHONPATH=/root/repo nohup python examples/s3_support_prune_study.py \
       > runs/round5/s3_prune.log 2>&1 &
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402

OUT = "runs/round5/s3_prune_study.jsonl"
ITERS = 3000  # enough for the pruned model's cubics to absorb the split

CASES = [
    ("lo20", "runs/round5/lo20_row/lo_stage1.stage2_coefs.npz", 0.2),
    ("lo30", "runs/round5/ens_lo30_fix/lo_stage1.stage2_coefs.npz", 0.3),
]

VARIANTS = [("keep", None), ("prune_u", "u*ones"), ("drop_true", "v**3*ones")]


def main():
    from percnn_tpu.experiments import EXPERIMENTS
    from percnn_tpu.experiments.pipeline import run_stage3_from_coefs

    for tag, coefs_path, noise in CASES:
        exp = dataclasses.replace(EXPERIMENTS["lo_stage1"], noise_pct=noise)
        for vname, drop in VARIANTS:
            out_dir = f"runs/round5/s3_prune_{tag}_{vname}"
            os.makedirs(out_dir, exist_ok=True)
            with np.load(coefs_path) as z:
                w_u, w_v = z["w_u"].copy(), z["w_v"].copy()
                names = [str(n) for n in z["names"]]
            if drop is not None:
                w_v[names.index(drop)] = 0.0
            vpath = os.path.join(out_dir, "stage2_coefs.variant.npz")
            np.savez(vpath, w_u=w_u, w_v=w_v, names=np.asarray(names))

            t0 = time.time()
            res = run_stage3_from_coefs(exp, vpath, out_dir=out_dir,
                                        cache_dir="data_cache",
                                        stage3_iters=ITERS)
            s3 = res["stage3"]
            # truth-free selection metric: best validation data loss
            import zipfile
            best_val = None
            for ck in ("stage3.ckpt.npz.best", "stage3.ckpt.npz"):
                p = os.path.join(out_dir, ck)
                if os.path.exists(p):
                    with np.load(p, allow_pickle=True) as z:
                        best_val = json.loads(str(z["__meta__"][0]))["best_val"]
                    break
            wv = np.ravel(np.asarray(s3["params"]["cell"]["coef"]))
            row = {
                "tag": f"{tag}_{vname}", "noise": noise,
                "v_support_k": int(np.count_nonzero(w_v)),
                "best_val": best_val,
                "rel_l2": float(s3["rel_l2"]),
                "coef_table": s3["coef_table"],
                "minutes": round((time.time() - t0) / 60, 1),
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(row, default=str) + "\n")
            print(json.dumps({k: row[k] for k in
                              ("tag", "v_support_k", "best_val", "rel_l2",
                               "minutes")}), flush=True)


if __name__ == "__main__":
    main()
