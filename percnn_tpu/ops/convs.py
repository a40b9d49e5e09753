"""Learnable convolution primitives in channels-last (TPU-native) layout.

The reference uses torch ``nn.Conv2d/Conv3d`` (NCHW, cuDNN) for the Pi-block
branches (train_2drd.py:70-90) and ``nn.ConvTranspose2d/3d`` for the ISG
upsampler (train_2drd.py:26-41, train_3drd.py:41-56).  Here everything is
channels-last (NHWC / NDHWC) — the layout XLA:TPU prefers — with weights
stored HWIO.  ``conv_transpose_torch`` reproduces torch ConvTranspose
semantics exactly (stride / padding / output_padding), which matters for the
IC-loss parity of the ISG.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import lax

_DIMNUMS = {
    1: ("NHC", "HIO", "NHC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _as_tuple(v, n: int):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def _batched(x: jnp.ndarray, nd: int):
    """Collapse leading dims of [..., *spatial, C] into one batch axis."""
    lead = x.shape[: x.ndim - nd - 1]
    xb = x.reshape((-1,) + x.shape[x.ndim - nd - 1 :])
    return xb, lead


def pointwise_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """1x1 conv: x [..., Cin] @ w [Cin, Cout] (+ b [Cout]).

    This is the Pi-block branch primitive for kernel_size=1 experiments
    (reference Wh1..Wh4, train_2drd.py:70-90): a per-grid-point channel mix,
    i.e. a matmul over the channel axis that XLA maps onto the MXU/VPU with
    no im2col.
    """
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def conv_nd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    padding: str = "VALID",
    stride: int | Sequence[int] = 1,
) -> jnp.ndarray:
    """General channels-last conv. x [..., *spatial, Cin], w [*k, Cin, Cout]."""
    nd = w.ndim - 2
    xb, lead = _batched(x, nd)
    y = lax.conv_general_dilated(
        xb,
        w,
        window_strides=_as_tuple(stride, nd),
        padding=padding,
        dimension_numbers=_DIMNUMS[nd],
    )
    if b is not None:
        y = y + b
    return y.reshape(lead + y.shape[1:])


def conv_nd_periodic(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """'Same'-size conv on a periodic grid: wrap-pad by k//2 then VALID conv.

    Equivalent to the reference's manual wrap-cat + padding=0 conv
    (rcnn_Burgers...py:161-173) and its ``padding_mode='circular'`` variant
    (rcnn_LO...py:109-122) — proven interchangeable in tests.
    """
    nd = w.ndim - 2
    pad = [(0, 0)] * x.ndim
    for i in range(nd):
        k = w.shape[i]
        ax = x.ndim - 1 - nd + i
        pad[ax] = (k // 2, (k - 1) // 2)
    xp = jnp.pad(x, pad, mode="wrap")
    return conv_nd(xp, w, b, padding="VALID")


def conv_transpose_torch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int | Sequence[int] = 2,
    padding: int | Sequence[int] = 2,
    output_padding: int | Sequence[int] = 1,
) -> jnp.ndarray:
    """Transposed conv with exact torch ``ConvTranspose{2,3}d`` semantics.

    x: [..., *spatial, Cin]; w: [*k, Cin, Cout] (channels-last storage).
    out_size = (in - 1)*stride - 2*padding + k + output_padding.

    Implemented as the equivalent forward conv: dilate the input by `stride`
    (lhs_dilation), pad by (k-1-p, k-1-p+output_padding), correlate with the
    spatially-flipped kernel.  The reference ISG uses k=5, stride=2,
    padding=2, output_padding=1 => exact 2x upsampling (train_2drd.py:26-41).
    """
    nd = w.ndim - 2
    strides = _as_tuple(stride, nd)
    pads = _as_tuple(padding, nd)
    opads = _as_tuple(output_padding, nd)
    w_flip = jnp.flip(w, axis=tuple(range(nd)))
    pad_cfg = [
        (w.shape[i] - 1 - pads[i], w.shape[i] - 1 - pads[i] + opads[i]) for i in range(nd)
    ]
    xb, lead = _batched(x, nd)
    y = lax.conv_general_dilated(
        xb,
        w_flip,
        window_strides=(1,) * nd,
        padding=pad_cfg,
        lhs_dilation=strides,
        dimension_numbers=_DIMNUMS[nd],
    )
    if b is not None:
        y = y + b
    return y.reshape(lead + y.shape[1:])
