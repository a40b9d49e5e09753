"""Separable torch-parity resampling (bilinear / bicubic / trilinear),
both align_corners conventions.

The reference trains the ISG against ``F.interpolate`` targets with three
distinct conventions: GS 2D bicubic with the default align_corners=False
(train_2drd.py:334), GS 3D trilinear align_corners=False (train_3drd.py:328),
and Burgers/LO bicubic align_corners=True on a periodic-extended grid
(rcnn_Burgers...py:467).  ``jax.image.resize`` matches neither torch cubic
kernel (it uses Keys a=-0.5; torch uses -0.75), so we build, per axis, a
dense [out, in] interpolation matrix at trace time (static shapes ->
constant-folded) and apply it with tensordot — small dense matmuls that ride
the MXU instead of gather ops.

Cubic kernel: Keys convolution with A = -0.75 (torch's constant), border taps
clamped — matching torch's ``upsample_bicubic2d`` in both conventions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_A = -0.75  # torch cubic coefficient


def _cubic_w(t: np.ndarray) -> np.ndarray:
    """4-tap Keys cubic weights at fractional offset t in [0,1)."""
    w0 = ((_A * (t + 1) - 5 * _A) * (t + 1) + 8 * _A) * (t + 1) - 4 * _A
    w1 = ((_A + 2) * t - (_A + 3)) * t * t + 1
    s = 1 - t
    w2 = ((_A + 2) * s - (_A + 3)) * s * s + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)  # [out, 4]


def _axis_matrix(n_in: int, n_out: int, method: str,
                 align_corners: bool = True) -> np.ndarray:
    """Dense [n_out, n_in] resampling matrix (torch grid conventions)."""
    M = np.zeros((n_out, n_in), dtype=np.float64)
    if n_out == 1 and align_corners:
        M[0, 0] = 1.0
        return M
    if align_corners:
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        # torch clamps the source coordinate at 0 for linear modes
        if method == "linear":
            src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    if method == "linear":
        taps = np.stack([i0, i0 + 1], axis=-1)
        wts = np.stack([1 - t, t], axis=-1)
    elif method == "cubic":
        taps = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=-1)
        wts = _cubic_w(t)
    else:
        raise ValueError(f"unknown method {method!r}")
    taps = np.clip(taps, 0, n_in - 1)
    for j in range(n_out):
        for tap, w in zip(taps[j], wts[j]):
            M[j, tap] += w
    return M


def resize_align_corners(
    x: jnp.ndarray,
    sizes,
    *,
    method: str = "cubic",
    align_corners: bool = True,
    channel_last: bool = True,
) -> jnp.ndarray:
    """Resize the spatial axes of x to `sizes` with torch semantics.

    x: [..., s1, ..., sn, C] if channel_last else [..., s1, ..., sn].
    `method`: 'cubic' (2D bicubic parity) or 'linear' (bi/trilinear parity).
    `align_corners`: torch's flag (False = half-pixel centres, the
    F.interpolate default).
    """
    nd = len(sizes)
    off = 1 if channel_last else 0
    axes = list(range(x.ndim - nd - off, x.ndim - off))
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        M = jnp.asarray(_axis_matrix(n_in, n_out, method, align_corners),
                        dtype=x.dtype)
        x = jnp.moveaxis(jnp.tensordot(M, jnp.moveaxis(x, ax, 0), axes=(1, 0)), 0, ax)
    return x
