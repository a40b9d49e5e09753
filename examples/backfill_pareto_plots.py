"""Backfill select_gamma_{u,v}.png for committed Stage-2 runs.

run_discovery_pipeline now writes the Pareto gamma-sweep figure (the
reference's select_gamma_u.png, LO stage-2 PDE_FIND_u.py:297-335) next to
each stage2_coefs.npz; this emits it retroactively for the runs already on
disk (every npz stores the sweep arrays).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python examples/backfill_pareto_plots.py
"""
import glob
import os

import numpy as np

from percnn_tpu.viz.plots import pareto_panel

written = []
for npz_path in sorted(glob.glob("runs/**/*.stage2_coefs.npz",
                                 recursive=True)):
    with np.load(npz_path, allow_pickle=False) as z:
        for eq in ("u", "v"):
            if f"pareto_gammas_{eq}" not in z:
                continue
            out = os.path.join(os.path.dirname(npz_path),
                               f"select_gamma_{eq}.png")
            pareto_panel(z[f"pareto_gammas_{eq}"], z[f"pareto_ls_{eq}"],
                         z[f"pareto_l0_{eq}"], out,
                         selected_gamma=float(z[f"pareto_gamma_{eq}"]),
                         eq=eq)
            written.append(out)
print(f"{len(written)} figures")
for w in written:
    print(" ", w)
