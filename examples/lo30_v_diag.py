"""LO-30% v-equation failure diagnosis, part 2 (round 5).

The protocol sweep (lo30_v_study) showed the true 6-term v support is never
on the STRidge Pareto front for ANY window/subsample/must_have combination
— so this is not a knee-selection problem.  Two remaining hypotheses:

 (a) recon bias: the Stage-1 reconstruction's v-dynamics genuinely prefer a
     wrong model (errors-in-variables / phase drift of the limit cycle) —
     then the restricted LSQ on the TRUE support will fit much worse than
     the knee's support;
 (b) STRidge path: the true support fits competitively but normalized
     thresholding never reaches it — then a fixed-support refit would show
     comparable residuals and the fix is protocol-side.

Also measures the global phase drift theta(t) between recon and clean
truth: the lambda-omega system is O(2)-equivariant, so Stage-1 can trade a
frequency error for a slowly rotating (u,v) frame, which manifests exactly
as spurious u<->v cross terms in the discovered equations (the reference's
own published 30% rows carry a spurious u term at -0.186 for this reason,
stage-2/PDE_FIND_v.py:289).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python examples/lo30_v_diag.py
"""

import dataclasses
import json
import os

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from percnn_tpu.data.io import load_npz
from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.experiments.configs import LO_STAGE1
from percnn_tpu.experiments.pipeline import TRUTH_TERMS

OUT = "runs/round5"
os.makedirs(OUT, exist_ok=True)
LOG = os.path.join(OUT, "lo30_v_diag.jsonl")

exp = dataclasses.replace(LO_STAGE1, noise_pct=0.3)

RECONS = {
    "mean": "runs/round4/ens_lo30_mean/lo_stage1.stage1_recon.npz",
    "s0": "runs/round4/ens_lo30_s0/lo_stage1.stage1_recon.npz",
    "s2": "runs/round4/ens_lo30_s2/lo_stage1.stage1_recon.npz",
}
TRUTH_CACHE = "data_cache/lambda_omega_100_400_100_4_dt0.0125_dx0.2_s66_v2.npz"


def record(row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row, default=float) + "\n")
    print(json.dumps(row, default=float), flush=True)


def restricted_fit(R, Ut, names, support):
    idx = [names.index(t) for t in support]
    w, *_ = np.linalg.lstsq(R[:, idx], Ut, rcond=None)
    resid = float(np.mean((Ut - R[:, idx] @ w) ** 2))
    return {n: float(c) for n, c in zip(support, w[:, 0])}, resid


def main():
    # ---- phase drift vs clean truth
    truth = np.load(TRUTH_CACHE)["truth"]
    if truth.shape[0] > 401:
        truth = truth[:401]
    for tag, path in RECONS.items():
        recon = load_npz(path)
        T = min(len(truth), len(recon))
        w_t = truth[:T, ..., 0] + 1j * truth[:T, ..., 1]
        w_r = recon[:T, ..., 0] + 1j * recon[:T, ..., 1]
        # best global phase per frame: argmax_theta Re <w_r, e^{i th} w_t>
        inner = (w_r.conj() * w_t).sum(axis=(1, 2))
        theta = np.angle(inner)  # rotation aligning truth to recon
        amp_r = np.sqrt((np.abs(w_r) ** 2).mean(axis=(1, 2)))
        amp_t = np.sqrt((np.abs(w_t) ** 2).mean(axis=(1, 2)))
        record({"tag": f"{tag}_phase", "theta_deg_t0": float(np.degrees(theta[0])),
                "theta_deg_t100": float(np.degrees(theta[100])),
                "theta_deg_t200": float(np.degrees(theta[200])),
                "theta_deg_t400": float(np.degrees(theta[T - 1])),
                "dtheta_per_frame_50_150_deg": float(
                    np.degrees(np.polyfit(np.arange(50, 150), np.unwrap(theta[50:150]), 1)[0])),
                "amp_ratio_mean": float((amp_r / amp_t).mean())})

    # ---- restricted fits
    TRUE_V = list(TRUTH_TERMS["lambda_omega"]["v"])
    TRUE_U = list(TRUTH_TERMS["lambda_omega"]["u"])
    for tag, path in RECONS.items():
        recon = load_npz(path)
        R, Ut, Vt, names = build_design_matrix(
            recon, exp.dt, exp.dx, frames=slice(50, 150), subsample=1.0,
            seed=0)
        full_v, *_ = np.linalg.lstsq(R, Vt, rcond=None)
        floor_v = float(np.mean((Vt - R @ full_v) ** 2))
        var_v = float(np.mean(Vt ** 2))
        fits = {}
        for name, support in (
            ("true6", TRUE_V),
            ("true6_plus_u", TRUE_V + ["u*ones"]),
            ("true6_plus_u_uxv", TRUE_V + ["u*ones", "ones*lap_u"]),
            # the knee's recurring 7-term support from the study
            ("knee7", ["u*ones", "u**2*lap_u", "u**2*lap_v", "u*v*lap_u",
                       "u*v*lap_v", "u**3*ones", "u*v**2*ones"]),
        ):
            coefs, resid = restricted_fit(R, Vt, names, support)
            fits[name] = {"resid": resid, "coefs": coefs}
        record({"tag": f"{tag}_vfits", "var_vt": var_v, "lsq_floor": floor_v,
                **{f"{k}_resid": v["resid"] for k, v in fits.items()},
                "true6_coefs": fits["true6"]["coefs"],
                "true6u_coefs": fits["true6_plus_u"]["coefs"]})
        # u-equation context: does the same story hold for u?
        full_u, *_ = np.linalg.lstsq(R, Ut, rcond=None)
        floor_u = float(np.mean((Ut - R @ full_u) ** 2))
        cu, ru = restricted_fit(R, Ut, names, TRUE_U)
        cuv, ruv = restricted_fit(R, Ut, names, TRUE_U + ["v*ones"])
        record({"tag": f"{tag}_ufits", "var_ut": float(np.mean(Ut ** 2)),
                "lsq_floor": floor_u, "true6_resid": ru,
                "true6_plus_v_resid": ruv, "true6_coefs": cu,
                "true6v_coefs": cuv})
    print("diag done", flush=True)


if __name__ == "__main__":
    main()
