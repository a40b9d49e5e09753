"""Composite training losses: data / IC / physics residual.

Reference recipes (SURVEY L5, §2.2):
- data loss: MSE on a time/space-strided subsample of the rollout vs noisy
  measurements, with the last 10% of supervised snapshots held out as a
  validation split (train_2drd.py:397-402, rcnn_Burgers...py:610-615)
- IC loss: MSE(ISG(IC_low), align_corners-interp of IC_low to the solver
  grid) (train_2drd.py:331-338)
- physics loss: mean squared PDE residual over the rollout
  (percnn_LO_eqn.py:344-357); used as the sole training loss in the
  forward-sim experiment and as an unsupervised validation metric in the
  data-driven ones (train_2drd.py:404-406).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from percnn_tpu.ops.interp import resize_align_corners
from percnn_tpu.pde.systems import PDESystem, physics_residual


def mse(a: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    d = a if b is None else a - b
    return jnp.mean(d * d)


@dataclasses.dataclass(frozen=True)
class DataLossConfig:
    """Strides defining which rollout entries are supervised.

    time_stride/space_stride subsample the rollout to the measurement
    resolution (e.g. GS 2D: rollout[0:-1:20, ::4, ::4] vs
    truth[::20, ::4, ::4], train_2drd.py:397-402).  val_frac of the sampled
    snapshots (the trailing ones) form the holdout.
    """

    time_stride: int = 20
    space_stride: int = 4
    val_frac: float = 0.1
    drop_last_frame: bool = True  # reference slices [0:-1:stride]


def subsample(rollout: jnp.ndarray, cfg: DataLossConfig, ndim: int) -> jnp.ndarray:
    """[T, *spatial, C] -> strided [Ts, *spatial_s, C]."""
    t_sl = slice(0, -1 if cfg.drop_last_frame else None, cfg.time_stride)
    idx = (t_sl,) + (slice(None, None, cfg.space_stride),) * ndim
    return rollout[idx]


def data_loss(
    rollout: jnp.ndarray, measurement: jnp.ndarray, cfg: DataLossConfig, ndim: int
):
    """Returns (train_mse, val_mse). `measurement` is already at the
    subsampled resolution: [Ts, *spatial_s, C] (noisy truth)."""
    pred = subsample(rollout, cfg, ndim)
    ts = pred.shape[0]
    n_val = max(1, int(round(ts * cfg.val_frac))) if cfg.val_frac > 0 else 0
    # never let the val split consume every snapshot (ts=1 with val_frac>0
    # would make the train mean an empty-reduction nan)
    n_val = min(n_val, ts - 1)
    n_train = ts - n_val
    train = mse(pred[:n_train], measurement[:n_train])
    val = mse(pred[n_train:], measurement[n_train:]) if n_val else jnp.zeros(())
    return train, val


def ic_target(ic_low: jnp.ndarray, target_sizes, ndim: int, method: str,
              *, align_corners: bool = False,
              periodic_extend: bool = False) -> jnp.ndarray:
    """Interpolation target for the IC loss, matching the reference's three
    conventions exactly:

    - GS 2D: bicubic, default align_corners=False (train_2drd.py:334)
    - GS 3D: trilinear, align_corners=False (train_3drd.py:328)
    - Burgers/LO: wrap-extend the low grid by one cell per axis, bicubic
      align_corners=True to (2n+1), crop the extra row/col
      (rcnn_Burgers...py:465-470) — align_corners on the periodic extension,
      which respects the periodic topology.
    """
    if periodic_extend:
        pad = [(0, 0)] * ic_low.ndim
        for i in range(ndim):
            pad[ic_low.ndim - 1 - ndim + i] = (0, 1)
        low = jnp.pad(ic_low, pad, mode="wrap")
        big = tuple(s + 1 for s in target_sizes)
        t = resize_align_corners(low, big, method=method, align_corners=True)
        sl = [slice(None)] * t.ndim
        for i in range(ndim):
            sl[t.ndim - 1 - ndim + i] = slice(0, target_sizes[i])
        return t[tuple(sl)]
    return resize_align_corners(ic_low, target_sizes, method=method,
                                align_corners=align_corners)


def ic_loss(isg_out: jnp.ndarray, ic_low: jnp.ndarray, ndim: int, method: str,
            *, align_corners: bool = False,
            periodic_extend: bool = False) -> jnp.ndarray:
    """MSE(ISG(low), interpolation of low to the solver grid)."""
    target_sizes = isg_out.shape[-1 - ndim : -1]
    target = ic_target(ic_low, target_sizes, ndim, method,
                       align_corners=align_corners,
                       periodic_extend=periodic_extend)
    return mse(isg_out, target)


def phys_loss(system: PDESystem, rollout: jnp.ndarray, dt: float, dx: float) -> jnp.ndarray:
    r = physics_residual(system, rollout, dt, dx)
    return mse(r[..., 0]) + mse(r[..., 1])
