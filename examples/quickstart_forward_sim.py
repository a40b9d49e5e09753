"""Quickstart: physics-only forward simulation of the 2D lambda-omega system.

Trains a Pi-block PeRCNN against the PDE residual alone (no labeled data),
then extrapolates past the training horizon and reports relative L2 error —
the ForwardSimulationOfPDEs workflow of the PeRCNN reference.

Run: python examples/quickstart_forward_sim.py  (~1 min on CPU, seconds on TPU)
"""

import dataclasses

import jax.numpy as jnp

from percnn_tpu.experiments import FORWARD_SIM_LO
from percnn_tpu.experiments.runner import run_experiment

exp = dataclasses.replace(
    FORWARD_SIM_LO,
    grid=48, train_steps=40, infer_steps=80,
    train=dataclasses.replace(FORWARD_SIM_LO.train, n_iters=400, log_every=100),
)

res = run_experiment(exp, out_dir="runs/quickstart", warmup=60)
print(f"extrapolation rel-L2: {res['rel_l2']:.4f}")
print("learned reaction polynomial for u:", res["pi_expressions"][0][:120], "...")
