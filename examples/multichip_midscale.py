"""Reference-scale multi-chip training validation (VERDICT r2 weak #3).

Trains GS2D_RECON at its full 100x100 grid (train_2drd.py:597 scale) with a
T=400 BPTT rollout on an 8-virtual-device mesh through BOTH spatial
implementations (explicit ppermute halo shard_map and GSPMD
sharding-constraint auto-partitioning), against a single-device control with
identical seed/config.  This is the same public-API path
(`run_experiment(mesh=...)`) the CLI's --mesh flag uses; the toy-scale
equivalents live in tests/test_parallel.py and __graft_entry__.dryrun.

Run on CPU (the dev TPU is a single chip):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python examples/multichip_midscale.py

Writes one JSON line per variant to runs/round3/multichip_midscale.jsonl.
"""
import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual 8-device mesh

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from percnn_tpu.experiments import GS2D_RECON  # noqa: E402
from percnn_tpu.experiments.runner import run_experiment  # noqa: E402

OUT = "runs/round3"
os.makedirs(OUT, exist_ok=True)
RESULTS = os.path.join(OUT, "multichip_midscale.jsonl")

# full reference grid, shortened schedule: one 1500-iter stage at T=400
# (the reference's middle curriculum stage) keeps the CPU-mesh wall-clock
# bounded while exercising the exact sharded BPTT graph of a real run
EXP = dataclasses.replace(
    GS2D_RECON, name="gs2d_recon_mid", train_steps=400, curriculum=(),
    train=dataclasses.replace(GS2D_RECON.train, n_iters=1500, log_every=300),
)


def variant(tag, **kwargs):
    t0 = time.time()
    out_dir = f"{OUT}/midscale_{tag}"
    # resume mid-variant after a VM reset when a checkpoint survived
    # (run dirs are force-committed periodically by the CPU chain)
    resume = os.path.exists(os.path.join(out_dir, f"{EXP.name}.ckpt.npz"))
    res = run_experiment(EXP, out_dir=out_dir, resume=resume,
                         cache_dir="data_cache", seed=0, **kwargs)
    row = {"variant": tag, "rel_l2": float(res["rel_l2"]),
           "final_loss": float(res["history"][-1]),
           "minutes": (time.time() - t0) / 60}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)
    return row


def done():
    tags = set()
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            tags.add(json.loads(line)["variant"])
    return tags


if __name__ == "__main__":
    skip = done()  # resume after interruption: completed variants skip
    if "single" not in skip:
        variant("single")
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    with mesh:
        if "halo_4x2" not in skip:
            variant("halo_4x2", mesh=mesh, parallel_impl="halo")
        if "gspmd_4x2" not in skip:
            variant("gspmd_4x2", mesh=mesh, parallel_impl="gspmd")
    # the three runs share seed/config: training through either sharded
    # path must land at the single-device quality (identical graphs up to
    # reduction order => small float drift over 1500 iters is expected)
    by = {json.loads(l)["variant"]: json.loads(l) for l in open(RESULTS)}
    for tag in ("halo_4x2", "gspmd_4x2"):
        rel = abs(by[tag]["rel_l2"] - by["single"]["rel_l2"])
        assert rel < 0.05, (by[tag], by["single"])
    print("MIDSCALE OK", flush=True)
