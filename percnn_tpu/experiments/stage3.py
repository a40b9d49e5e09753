"""Stage-3: fine-tune the coefficients of the discovered symbolic PDE.

Reference flow (SURVEY §3.3, fine_tuning_[5%noise,41x51x51].py): take the
Stage-2 STRidge coefficients as initialisation of an explicit-PDE cell
(`SymbolicCell`), roll it out from the ISG-generated IC, and train
coefficients + ISG against data + IC losses (Adam 5e-4, StepLR(100, .95),
1000-3000 iters).  The reference hand-pastes coefficients between stages
(:123-130); here they flow through `Stage3Config.coef_init`.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from percnn_tpu.core.cell import (
    SymbolicCellConfig,
    init_symbolic_cell,
    symbolic_cell_step,
)
from percnn_tpu.core.isg import ISGConfig, init_isg, isg_apply
from percnn_tpu.core.losses import DataLossConfig, data_loss, ic_loss
from percnn_tpu.core.rollout import rollout
from percnn_tpu.core.train import TrainConfig, pretrain_isg, train
from percnn_tpu.experiments.configs import ExperimentConfig
from percnn_tpu.utils.metrics import MetricsLogger, rel_l2


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    """Symbolic fine-tune on top of a Stage-1 experiment's data setup."""

    base: ExperimentConfig            # reuse grid/dt/dx/isg/data/noise
    cell: SymbolicCellConfig = None
    coef_init: tuple = ()             # per-channel coefficient tuples (Stage-2)
    nu_init: tuple = (0.005, 0.005)
    truth_coef: dict | None = None    # {channel: {term: value}} for reporting
    train: TrainConfig = None


# The two reference Stage-3 setups (fine_tuning_[5%noise...].py:123-130 /
# fine_tuning_LO_[0%noise...].py:123-137).
def burgers_stage3(base: ExperimentConfig, coef_init=None, nu_init=None) -> Stage3Config:
    cell = SymbolicCellConfig(
        ndim=2, dt=base.dt, dx=base.dx,
        terms=(("u*u_x", "v*u_y"), ("u*v_x", "v*v_y")),
        integrator="euler", diffusion="raw",
    )
    return Stage3Config(
        base=base,
        cell=cell,
        coef_init=coef_init if coef_init is not None else ((-1.0, -1.0), (-1.0, -1.0)),
        nu_init=nu_init if nu_init is not None else (0.005, 0.005),
        truth_coef={
            0: {"lap": 0.005, "u*u_x": -1.0, "v*u_y": -1.0},
            1: {"lap": 0.005, "u*v_x": -1.0, "v*v_y": -1.0},
        },
        train=TrainConfig(n_iters=1000, lr=5e-4, lr_step=100, lr_gamma=0.95,
                          best_val=True),
    )


def lambda_omega_stage3(base: ExperimentConfig, coef_init=None, nu_init=None) -> Stage3Config:
    cell = SymbolicCellConfig(
        ndim=2, dt=base.dt, dx=base.dx,
        terms=(
            ("u", "u**3", "u**2*v", "u*v**2", "v**3"),
            ("v", "v**3", "u**3", "u*v**2", "u**2*v"),
        ),
        integrator="euler", diffusion="raw",
    )
    return Stage3Config(
        base=base,
        cell=cell,
        coef_init=coef_init if coef_init is not None else
        ((1.0, -1.0, 1.0, -1.0, 1.0), (1.0, -1.0, -1.0, -1.0, -1.0)),
        nu_init=nu_init if nu_init is not None else (0.1, 0.1),
        truth_coef={
            0: {"lap": 0.1, "u": 1.0, "u**3": -1.0, "u**2*v": 1.0,
                "u*v**2": -1.0, "v**3": 1.0},
            1: {"lap": 0.1, "v": 1.0, "v**3": -1.0, "u**3": -1.0,
                "u*v**2": -1.0, "u**2*v": -1.0},
        },
        train=TrainConfig(n_iters=1000, lr=5e-4, lr_step=100, lr_gamma=0.95,
                          best_val=True),
    )


def show_coef(params: dict, cfg: Stage3Config) -> str:
    """Identified-vs-truth coefficient table (reference `show_coef`
    PrettyTable report, fine_tuning_[5%...].py:231-240)."""
    lines = [f"{'eq':<4}{'term':<10}{'identified':>14}{'truth':>10}"]
    names = ["u", "v"]
    nu = np.asarray(params["cell"]["nu"])
    for c in range(cfg.cell.channels):
        truth = cfg.truth_coef.get(c, {}) if cfg.truth_coef else {}
        lines.append(f"{names[c]:<4}{'lap':<10}{float(nu[c]):>14.6f}"
                     f"{truth.get('lap', float('nan')):>10.4f}")
        for t, v in zip(cfg.cell.terms[c], np.asarray(params["cell"]["coef"][c])):
            lines.append(f"{names[c]:<4}{t:<10}{float(v):>14.6f}"
                         f"{truth.get(t, float('nan')):>10.4f}")
    return "\n".join(lines)


def coef_errors(params: dict, cfg: Stage3Config) -> dict:
    """Max relative coefficient error vs truth (headline Stage-3 metric)."""
    errs = {}
    nu = np.asarray(params["cell"]["nu"])
    for c in range(cfg.cell.channels):
        truth = cfg.truth_coef.get(c, {}) if cfg.truth_coef else {}
        if "lap" in truth:
            errs[f"nu_{c}"] = abs(float(nu[c]) - truth["lap"]) / abs(truth["lap"])
        for t, v in zip(cfg.cell.terms[c], np.asarray(params["cell"]["coef"][c])):
            if t in truth:
                # truth 0.0 marks a known-spurious term (the reference's
                # C6_v, fine_tuning_LO_[10%noise...].py:137): report its
                # absolute magnitude, which fine-tuning should shrink.
                denom = abs(truth[t]) if truth[t] != 0.0 else 1.0
                errs[f"{t}_{c}"] = abs(float(v) - truth[t]) / denom
    return errs


def run_stage3(
    cfg: Stage3Config,
    truth: np.ndarray,
    *,
    out_dir: str = "runs",
    dtype=jnp.float32,
    n_iters_override: int | None = None,
    isg_pretrain_iters: int = 2000,
    seed: int = 0,
) -> dict:
    """Train the symbolic cell + ISG on the Stage-1 data setup."""
    from percnn_tpu.experiments.runner import setup_problem

    os.makedirs(out_dir, exist_ok=True)
    base = cfg.base
    logger = MetricsLogger(os.path.join(out_dir, "stage3.metrics.jsonl"),
                           echo_every=cfg.train.log_every)
    nd = cfg.cell.ndim
    # identical noisy-IC / measurement setup as Stage-1 (single source of
    # truth for the subsampling conventions)
    prob = setup_problem(base, truth, dtype)
    ic_low, meas = prob.ic_low, prob.measurement

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "cell": init_symbolic_cell(k1, cfg.cell, coef_init=cfg.coef_init,
                                   nu_init=cfg.nu_init, dtype=dtype),
        "isg": init_isg(k2, base.isg, dtype),
    }

    def isg_loss(isg_params):
        out = isg_apply(isg_params, ic_low, base.isg)
        return ic_loss(out, ic_low, nd, base.interp_method,
                       align_corners=base.interp_align_corners,
                       periodic_extend=base.interp_periodic_extend)

    params["isg"] = pretrain_isg(isg_loss, params["isg"],
                                 n_iters=isg_pretrain_iters, logger=logger)

    def loss_fn(params, data):
        # measurement/IC passed as jit arguments (not baked constants) so
        # the compiled step caches across noise levels — see
        # core/train.py: train(loss_args=).
        d_ic, d_meas = data["ic_low"], data["meas"]
        h0 = isg_apply(params["isg"], d_ic, base.isg)[0]
        frames = rollout(lambda h: symbolic_cell_step(params["cell"], h, cfg.cell),
                         h0, base.train_steps)
        tr, va = data_loss(frames, d_meas, base.data, nd)
        icl = ic_loss(isg_apply(params["isg"], d_ic, base.isg), d_ic, nd,
                      base.interp_method,
                      align_corners=base.interp_align_corners,
                      periodic_extend=base.interp_periodic_extend)
        total = base.loss_weights.get("data", 1.0) * tr \
            + base.loss_weights.get("ic", 1.0) * icl
        return total, {"data": tr, "val": va, "ic": icl}

    tcfg = dataclasses.replace(
        cfg.train,
        n_iters=n_iters_override if n_iters_override is not None else cfg.train.n_iters,
        ckpt_path=os.path.join(out_dir, "stage3.ckpt.npz"),
    )
    params, history = train(loss_fn, params, tcfg, logger=logger,
                            loss_args=({"ic_low": ic_low, "meas": meas},))

    h0 = isg_apply(params["isg"], ic_low, base.isg)[0]
    frames = np.asarray(rollout(
        lambda h: symbolic_cell_step(params["cell"], h, cfg.cell),
        h0, min(base.infer_steps, truth.shape[0] - 1), remat=False))
    result = {
        "params": params,
        "history": history,
        "rel_l2": rel_l2(frames, truth[: frames.shape[0]]),
        "coef_table": show_coef(params, cfg),
        "coef_errors": coef_errors(params, cfg),
        "frames": frames,
    }
    logger.log(tcfg.n_iters, final_rel_l2=result["rel_l2"])
    logger.close()
    return result
