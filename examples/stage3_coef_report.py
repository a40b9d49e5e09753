"""Offline Stage-3 fine-tuned-coefficient report for the noise-matrix runs.

The reference's Stage-3 headline is the fine-tuned governing equation
itself (e.g. Burgers 5% noise: u_t = 0.005011 lap(u) - 1.00426 u u_x
- 1.004305 v u_y, fine_tuning_[5%noise,41x51x51].py:988-990).  The queue
rows record only stage3 rel-L2; this script rebuilds the per-noise-level
coefficient tables from the artifacts each pipeline run already saved:
`{exp}.stage2_coefs.npz` (the discovered support that defined the symbolic
cell) + `stage3.ckpt.npz[.best]` (the fine-tuned nu/coef leaves).

CPU-only, no jax compute beyond tree loading:
  JAX_PLATFORMS=cpu python examples/stage3_coef_report.py
"""
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from percnn_tpu.core.checkpoint import load_checkpoint_tree  # noqa: E402
from percnn_tpu.experiments.pipeline import (  # noqa: E402
    TRUTH_TERMS, identified_to_symbolic,
)

OUT = "runs/round3"
SYSTEMS = {"burgers_stage1": ("burgers", 0.005), "lo_stage1": ("lambda_omega", 0.1)}


def report_dir(d):
    exp = next((e for e in SYSTEMS if os.path.basename(d).startswith(f"noise_{e}_")), None)
    if exp is None:
        return None
    s2_path = os.path.join(d, f"{exp}.stage2_coefs.npz")
    ck_path = os.path.join(d, "stage3.ckpt.npz")
    if os.path.exists(ck_path + ".best"):
        ck_path = ck_path + ".best"
    if not (os.path.exists(s2_path) and os.path.exists(ck_path)):
        return None
    system, nu_true = SYSTEMS[exp]
    with np.load(s2_path, allow_pickle=False) as z:
        w_u, w_v = z["w_u"], z["w_v"]
        names = [str(n) for n in z["names"]]
    cell, _, _ = identified_to_symbolic(w_u, w_v, names, dt=1.0, dx=1.0)
    tree, _ = load_checkpoint_tree(ck_path)
    tree = tree.get("params", tree)  # train-state checkpoints wrap params
    nu = np.asarray(tree["cell"]["nu"]).ravel()
    truth = TRUTH_TERMS[system]
    m = re.search(r"_(\d+)(?:_full)?$", os.path.basename(d))
    pct = m.group(1) if m else "?"
    lines = [f"#### {exp} {pct}% noise ({os.path.basename(ck_path)})", ""]
    lines.append("| eq | term | stage-3 coef | truth |")
    lines.append("|---|---|---|---|")
    for c, eq in enumerate(("u", "v")):
        tr = truth[eq]
        lap_name = f"ones*lap_{eq}"
        lines.append(f"| {eq} | {lap_name} (nu) | {nu[c]:+.6f} | {tr[lap_name]:+g} |")
        coefs = np.asarray(tree["cell"]["coef"][c]).ravel()
        for t, v in zip(cell.terms[c], coefs):
            tv = tr.get(f"{t}*ones" if f"{t}*ones" in tr else t)
            lines.append(f"| {eq} | {t} | {v:+.6f} | "
                         f"{'%+g' % tv if tv is not None else '(spurious: 0)'} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    blocks = []
    for d in sorted(glob.glob(os.path.join(OUT, "noise_*"))):
        b = report_dir(d)
        if b:
            blocks.append(b)
    print("### Stage-3 fine-tuned governing equations (per noise level)\n")
    print("Reference anchors: Burgers 5% fine_tuning_[5%noise,41x51x51].py:988-990;")
    print("truth nu: Burgers 0.005, lambda-omega 0.1; nonlinear coefs +-1.\n")
    print("\n".join(blocks))
