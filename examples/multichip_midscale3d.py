"""Reference-scale 3D multi-chip training validation (round 4).

Extends examples/multichip_midscale.py to the 3D Gray-Scott workload: the
full 48^3 reference grid (train_3drd.py:498) with a T=150 BPTT rollout (the
reference's first curriculum stage) on a (2,2,2) 8-virtual-device mesh
through the explicit ppermute-halo path, against a single-device control
with identical seed/config.  Same public-API path as the CLI's --mesh flag.

Run on CPU (the dev TPU is a single chip):
  PYTHONPATH=/root/repo python examples/multichip_midscale3d.py

Writes one JSON line per variant to runs/round4/multichip_midscale3d.jsonl.
"""
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual 8-device mesh
# the 8-device halo-BPTT graph takes ~20 min to compile on this 1-core VM;
# cache it so crash/VM-reset restarts (this script resumes from checkpoints)
# skip straight to execution
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/percnn_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from percnn_tpu.experiments import GS3D_RECON  # noqa: E402
from percnn_tpu.experiments.runner import run_experiment  # noqa: E402

OUT = "runs/round4"
os.makedirs(OUT, exist_ok=True)
RESULTS = os.path.join(OUT, "multichip_midscale3d.jsonl")
# one ISG pretrain shared by both variants (the costliest CPU stage; the
# ISG sees only the seeded noisy IC, identical across variants).  The TPU
# queue pre-generates this checkpoint; if absent, the first variant
# pretrains and saves it for the second.
ISG_SHARED = os.path.join(OUT, "midscale3d_isg.npz")

# full reference grid, shortened schedule: one 400-iter stage at the
# reference's first-stage rollout length keeps the CPU-mesh wall-clock
# bounded while exercising the exact sharded 3D BPTT graph of a real run
EXP = dataclasses.replace(
    GS3D_RECON, name="gs3d_recon_mid", train_steps=150, curriculum=(),
    infer_steps=200,
    train=dataclasses.replace(GS3D_RECON.train, n_iters=400, log_every=100),
)


def done():
    tags = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            tags.add(json.loads(line)["variant"])
    return tags


def variant(tag, **kwargs):
    t0 = time.time()
    out_dir = f"{OUT}/midscale3d_{tag}"
    # resume mid-variant after a VM reset when a checkpoint survived
    # (run dirs are force-committed periodically by the CPU chain)
    resume = os.path.exists(os.path.join(out_dir, f"{EXP.name}.ckpt.npz"))
    res = run_experiment(EXP, out_dir=out_dir, resume=resume,
                         cache_dir="data_cache", seed=0,
                         isg_params_path=ISG_SHARED, **kwargs)
    row = {"variant": tag, "rel_l2": float(res["rel_l2"]),
           "final_loss": float(res["history"][-1]),
           "minutes": (time.time() - t0) / 60}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)
    return row


if __name__ == "__main__":
    skip = done()
    rows = {}
    if "single" not in skip:
        rows["single"] = variant("single")
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("x", "y", "z"))
    with mesh:
        if "halo_2x2x2" not in skip:
            rows["halo_2x2x2"] = variant("halo_2x2x2", mesh=mesh,
                                         parallel_impl="halo")
    if {"single", "halo_2x2x2"} <= (skip | set(rows)):
        lines = [json.loads(l) for l in open(RESULTS)]
        by = {r["variant"]: r for r in lines}
        rel = abs(by["halo_2x2x2"]["rel_l2"] - by["single"]["rel_l2"])
        assert rel < 0.05, (by["halo_2x2x2"], by["single"])
        print("MIDSCALE3D OK", flush=True)
