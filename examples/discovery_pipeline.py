"""Full three-stage PDE discovery on 2D Burgers, shrunk to run in minutes.

Stage-1 reconstructs a high-res rollout from noisy coarse measurements with
a 5x5 Pi-cell; Stage-2 runs STRidge over the 70-term candidate library;
Stage-3 fine-tunes the identified sparse PDE's coefficients.
"""

import dataclasses

from percnn_tpu.experiments import BURGERS_STAGE1
from percnn_tpu.experiments.pipeline import run_discovery_pipeline

exp = dataclasses.replace(
    BURGERS_STAGE1,
    grid=64, train_steps=100, infer_steps=100, noise_pct=0.01,
    isg_pretrain_iters=500,
)

res = run_discovery_pipeline(
    exp, out_dir="runs/discovery_demo",
    stage1_iters=1500, stage3_iters=300,
    stage2_frames=slice(0, 100),
)
names = res["stage2"]["names"]
print("identified u-equation:",
      {n: round(float(c), 4) for n, c in zip(names, res["stage2"]["w_u"][:, 0]) if c})
print(res["stage3"]["coef_table"])
