"""CLI: the reference's entry points were `python <script>.py` with constants
in __main__ (SURVEY §1); here one CLI drives every experiment/pipeline.

  python -m percnn_tpu run forward_sim_lo [--iters N] [--out DIR] [--x64]
  python -m percnn_tpu pipeline burgers_stage1 [--stage1-iters N] ...
  python -m percnn_tpu simulate gray_scott_2d --steps 500 --out gt.npz
  python -m percnn_tpu list
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="percnn_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="train one experiment")
    pr.add_argument("experiment")
    pr.add_argument("--iters", type=int, default=None)
    pr.add_argument("--isg-iters", type=int, default=None)
    pr.add_argument("--out", default="runs")
    pr.add_argument("--cache", default="data_cache")
    pr.add_argument("--x64", action="store_true")
    pr.add_argument("--cpu", action="store_true")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--steps-per-call", type=int, default=None,
                    help="fuse K optimizer steps per device call (remote TPU)")
    pr.add_argument("--resume", action="store_true",
                    help="resume from the experiment checkpoint")
    pr.add_argument("--mesh", default=None,
                    help="spatial device mesh for multi-chip training, "
                         "e.g. 2,4 (2D) or 2,2,2 (3D); 'auto' factors all "
                         "devices over the experiment's spatial axes")
    pr.add_argument("--parallel", choices=("halo", "gspmd"), default="halo",
                    help="multi-chip impl: explicit ppermute halo exchange "
                         "or GSPMD sharding constraints")

    pp = sub.add_parser("pipeline", help="Stage-1/2/3 discovery pipeline")
    pp.add_argument("experiment")
    pp.add_argument("--stage1-iters", type=int, default=None)
    pp.add_argument("--stage3-iters", type=int, default=None)
    pp.add_argument("--out", default="runs/pipeline")
    pp.add_argument("--cache", default="data_cache")
    pp.add_argument("--cpu", action="store_true")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--steps-per-call", type=int, default=None)
    pp.add_argument("--stage1-recon", default=None,
                    help="reuse a saved Stage-1 reconstruction .npz "
                         "(skips Stage-1 training)")
    pp.add_argument("--noise", type=float, default=None,
                    help="override the measurement noise %% (e.g. 0.2 for "
                         "the reference's 0-30%% robustness matrix)")
    pp.add_argument("--stage2-frames", default=None,
                    help="Stage-2 regression window as START:STOP frames "
                         "(reference uses 50:150, PDE_FIND_u.py:220-222)")
    pp.add_argument("--stage2-coefs", default=None,
                    help="path to a saved *.stage2_coefs.npz: skip Stage-1/2 "
                         "and fine-tune (Stage-3) from that support")
    pp.add_argument("--stage2-subsample", type=float, default=0.2,
                    help="Stage-2 design-matrix row subsample fraction "
                         "(reference: 0.2, PDE_FIND_u.py:246-247)")
    pp.add_argument("--stage2-draws", type=int, default=None,
                    help="stability-selection Stage-2: majority-vote the "
                         "support over N independent subsample draws, then "
                         "full-matrix lstsq refit")
    pp.add_argument("--ensemble-members", type=int, default=None,
                    help="ensemble-rescued discovery: train K Stage-1 "
                         "members on the SAME measurement (init seeds "
                         "seed..seed+K-1), aggregate reconstructions, run "
                         "Stage-2/3 on the aggregate + per-coef UQ")
    pp.add_argument("--ensemble-aggregate", choices=("mean", "median"),
                    default="mean")
    pp.add_argument("--member-recon", action="append", default=None,
                    help="reuse a saved member reconstruction .npz (repeat "
                         "per member; remaining members train here)")

    pe = sub.add_parser("ensemble", help="train K members (DP) in one jit")
    pe.add_argument("experiment")
    pe.add_argument("--members", type=int, default=4)
    pe.add_argument("--iters", type=int, default=None)
    pe.add_argument("--isg-iters", type=int, default=None)
    pe.add_argument("--out", default="runs/ensemble")
    pe.add_argument("--cache", default="data_cache")
    pe.add_argument("--cpu", action="store_true")
    pe.add_argument("--seed", type=int, default=0)
    pe.add_argument("--steps-per-call", type=int, default=None)
    pe.add_argument("--shard", action="store_true",
                    help="shard the member axis over all devices")

    ps = sub.add_parser("simulate", help="generate FD ground truth")
    ps.add_argument("system")
    ps.add_argument("--grid", type=int, default=100)
    ps.add_argument("--steps", type=int, default=500)
    ps.add_argument("--dt", type=float, required=True)
    ps.add_argument("--dx", type=float, required=True)
    ps.add_argument("--out", default="truth.npz")
    ps.add_argument("--warmup", type=int, default=0)

    px = sub.add_parser("export", help="export a trained model as a "
                        "self-contained StableHLO serving artifact")
    px.add_argument("experiment")
    px.add_argument("--ckpt", required=True,
                    help="framework .npz checkpoint (from `run`)")
    px.add_argument("--steps", type=int, default=None,
                    help="rollout length baked into the artifact "
                         "(default: the experiment's infer_steps)")
    px.add_argument("--out", default="model.stablehlo.npz")
    px.add_argument("--final-only", action="store_true",
                    help="emit only the final state (no frame streaming)")
    px.add_argument("--cpu", action="store_true")

    pi = sub.add_parser("import-pt", help="convert a reference PyTorch "
                        ".pt checkpoint to a framework .npz checkpoint")
    pi.add_argument("pt_path")
    pi.add_argument("--out", default="imported.ckpt.npz")
    pi.add_argument("--cpu", action="store_true")

    pf = sub.add_parser("profile", help="capture a jax.profiler device "
                        "trace of N training iterations (TensorBoard/"
                        "Perfetto viewable)")
    pf.add_argument("experiment")
    pf.add_argument("--iters", type=int, default=20)
    pf.add_argument("--out", default="runs/profile")
    pf.add_argument("--cache", default="data_cache")
    pf.add_argument("--cpu", action="store_true")

    sub.add_parser("list", help="list experiment configs")

    args = p.parse_args(argv)

    if args.cmd == "list":
        from percnn_tpu.experiments import EXPERIMENTS

        for name, exp in EXPERIMENTS.items():
            print(f"{name:<18} system={exp.system:<14} grid={exp.grid} "
                  f"dt={exp.dt} steps={exp.train_steps}")
        return 0

    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: repeated CLI invocations skip the
    # (minutes-long on the remote compiler) XLA compiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/percnn_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if args.cmd == "simulate":
        import numpy as np
        from percnn_tpu.data.simulate import default_ic, simulate
        from percnn_tpu.data.io import save_npz

        h0 = default_ic(args.system, args.grid)
        if args.warmup:
            h0 = simulate(args.system, h0, args.warmup, args.dt, args.dx)[-1]
        truth = simulate(args.system, h0, args.steps, args.dt, args.dx)
        save_npz(args.out, truth)
        print(f"wrote {args.out}: {truth.shape}")
        return 0

    if args.cmd == "import-pt":
        from percnn_tpu.core.checkpoint import save_checkpoint
        from percnn_tpu.data.pt_import import (
            import_reference_checkpoint, map_adam_moments,
        )

        cell, isg, raw = import_reference_checkpoint(args.pt_path)
        params = {"cell": cell}
        if isg is not None:
            params["isg"] = isg
        tree = {"params": params}
        meta = {"source": args.pt_path}
        try:
            moments = map_adam_moments(raw)
        except Exception as e:
            # weights-only import still succeeds on non-Adam / oddly packed
            # optimizer state (pre-round-3 behavior: state was ignored)
            print(f"warning: optimizer state not imported ({e})")
            moments = None
        if moments is not None:
            import optax

            def as_params(pair):
                cell_m, isg_m = pair
                return {"cell": cell_m, **({"isg": isg_m} if isg is not None
                                           else {})}

            tree["opt_state"] = optax.ScaleByAdamState(
                count=jax.numpy.asarray(moments["count"], jax.numpy.int32),
                mu=as_params(moments["mu"]), nu=as_params(moments["nu"]))
            meta["iteration"] = moments["count"]
        save_checkpoint(args.out, tree, meta=meta)
        n = len(jax.tree_util.tree_leaves(params))
        print(f"wrote {args.out}: {n} tensors"
              + (" (cell + isg)" if isg is not None else " (cell only)")
              + (f" + Adam state @ step {moments['count']}"
                 if moments is not None else ""))
        return 0

    from percnn_tpu.experiments import EXPERIMENTS

    exp = EXPERIMENTS[args.experiment]

    if args.cmd == "profile":
        from percnn_tpu.experiments.runner import run_experiment
        from percnn_tpu.utils.profiling import trace

        trace_dir = os.path.join(args.out, f"{exp.name}.trace")
        # warm the compile cache outside the trace so the capture shows
        # steady-state device execution, not compilation
        run_experiment(exp, out_dir=args.out, cache_dir=args.cache,
                       n_iters_override=1, isg_pretrain_override=1,
                       seed=0)
        with trace(trace_dir):
            run_experiment(exp, out_dir=args.out, cache_dir=args.cache,
                           n_iters_override=args.iters,
                           isg_pretrain_override=1, seed=0)
        print(f"trace written to {trace_dir} (open with TensorBoard "
              f"profile plugin or Perfetto)")
        return 0

    if args.cmd == "export":
        from percnn_tpu.core.checkpoint import load_checkpoint_tree
        from percnn_tpu.serving import export_model

        tree, _meta = load_checkpoint_tree(args.ckpt)
        params = tree.get("params", tree)
        n_steps = args.steps if args.steps is not None else exp.infer_steps
        if exp.isg is not None and "isg" in params:
            low = exp.grid // exp.isg.scale
            input_shape = (low,) * exp.cell.ndim + (2,)
            isg_cfg = exp.isg
        else:
            input_shape = (exp.grid,) * exp.cell.ndim + (2,)
            isg_cfg = None
        export_model(params, exp.cell, n_steps, input_shape,
                     isg_cfg=isg_cfg, final_only=args.final_only,
                     path=args.out)
        print(f"wrote {args.out}: input {input_shape}, {n_steps} steps"
              f"{' (final only)' if args.final_only else ''}")
        return 0

    if args.cmd == "run":
        import math

        import jax.numpy as jnp
        from percnn_tpu.experiments.runner import run_experiment

        mesh = None
        if args.mesh:
            from percnn_tpu.parallel.mesh import make_mesh

            axes = ("x", "y", "z")[: exp.cell.ndim]
            if args.mesh == "auto":
                mesh = make_mesh(axes)
            else:
                shape = tuple(int(s) for s in args.mesh.replace("x", ",")
                              .split(",") if s)
                mesh = make_mesh(axes, shape=shape,
                                 devices=jax.devices()[: math.prod(shape)])
        res = run_experiment(
            exp, out_dir=args.out, cache_dir=args.cache,
            dtype=jnp.float64 if args.x64 else jnp.float32,
            n_iters_override=args.iters,
            isg_pretrain_override=args.isg_iters,
            steps_per_call=args.steps_per_call,
            resume=args.resume,
            seed=args.seed,
            mesh=mesh,
            parallel_impl=args.parallel,
        )
        print(json.dumps({"experiment": exp.name, "rel_l2": res["rel_l2"],
                          "final_loss": res["history"][-1]}))
        return 0

    if args.cmd == "ensemble":
        from percnn_tpu.experiments.ensemble import run_ensemble
        from percnn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(("data",)) if args.shard else None
        res = run_ensemble(
            exp, args.members, out_dir=args.out, cache_dir=args.cache,
            n_iters_override=args.iters, isg_pretrain_override=args.isg_iters,
            steps_per_call=args.steps_per_call, mesh=mesh, seed=args.seed,
        )
        print(json.dumps({"experiment": exp.name,
                          "rel_l2_members": res["rel_l2_members"],
                          "rel_l2_mean": res["rel_l2_mean"],
                          "rel_l2_std": res["rel_l2_std"]}))
        return 0

    if args.cmd == "pipeline":
        import dataclasses

        from percnn_tpu.experiments.pipeline import run_discovery_pipeline

        if args.noise is not None:
            exp = dataclasses.replace(
                exp, name=f"{exp.name}_n{int(round(args.noise * 100))}",
                noise_pct=args.noise)
        frames = None
        if args.stage2_frames:
            a, b = args.stage2_frames.split(":")
            frames = slice(int(a), int(b))
        if args.stage2_coefs:
            from percnn_tpu.experiments.pipeline import run_stage3_from_coefs

            dropped = [flag for flag, on in (
                ("--stage1-recon", args.stage1_recon is not None),
                ("--stage2-frames", args.stage2_frames is not None),
                ("--stage2-subsample", args.stage2_subsample != 0.2),
                ("--stage2-draws", args.stage2_draws is not None),
                ("--ensemble-members", args.ensemble_members is not None),
            ) if on]
            if dropped:
                p.error(f"--stage2-coefs skips Stage-1/2 entirely; "
                        f"{', '.join(dropped)} would be silently ignored")
            res = run_stage3_from_coefs(
                exp, args.stage2_coefs, out_dir=args.out,
                cache_dir=args.cache, stage3_iters=args.stage3_iters,
                seed=args.seed,
            )
        elif args.ensemble_members is not None:
            from percnn_tpu.experiments.pipeline import run_ensemble_discovery

            if args.stage1_recon is not None:
                p.error("--ensemble-members trains its own members; use "
                        "--member-recon (repeatable) to reuse saved ones")
            res = run_ensemble_discovery(
                exp, args.ensemble_members, out_dir=args.out,
                cache_dir=args.cache, stage1_iters=args.stage1_iters,
                aggregate=args.ensemble_aggregate,
                member_recons=args.member_recon,
                stage2_frames=frames, stage2_subsample=args.stage2_subsample,
                stage2_draws=args.stage2_draws,
                stage3_iters=args.stage3_iters,
                steps_per_call=args.steps_per_call, seed=args.seed,
            )
        else:
            res = run_discovery_pipeline(
                exp, out_dir=args.out, cache_dir=args.cache,
                stage1_iters=args.stage1_iters, stage3_iters=args.stage3_iters,
                stage2_frames=frames, stage2_subsample=args.stage2_subsample,
                stage2_draws=args.stage2_draws,
                steps_per_call=args.steps_per_call,
                stage1_recon=args.stage1_recon,
                seed=args.seed,
            )
        ident_u = {n: float(c) for n, c in
                   zip(res["stage2"]["names"], res["stage2"]["w_u"][:, 0]) if c != 0}
        ident_v = {n: float(c) for n, c in
                   zip(res["stage2"]["names"], res["stage2"]["w_v"][:, 0]) if c != 0}
        out = {
            "experiment": exp.name,
            "stage1_rel_l2": res["stage1"].get("rel_l2"),
            "stage2_u": ident_u,
            "stage2_v": ident_v,
            "stage3_rel_l2": res["stage3"]["rel_l2"],
        }
        for k in ("metrics_u", "metrics_v"):
            if k in res["stage2"]:
                out[k] = res["stage2"][k]
        if "uq" in res:
            names = res["uq"]["names"]
            for eq in ("u", "v"):
                mu, sd = res["uq"][f"coef_mean_{eq}"], res["uq"][f"coef_std_{eq}"]
                vote = res["uq"][f"support_vote_{eq}"]
                out[f"uq_{eq}"] = {
                    names[i]: {"mean": float(mu[i]), "std": float(sd[i]),
                               "vote": float(vote[i])}
                    for i in range(len(names)) if vote[i] > 0}
        print(json.dumps(out, indent=2))
        print(res["stage3"]["coef_table"])
        return 0


if __name__ == "__main__":
    sys.exit(main())
