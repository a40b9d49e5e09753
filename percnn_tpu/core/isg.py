"""Initial-state generator (ISG): ConvTranspose upsampler low-res IC -> grid.

Three reference variants (SURVEY L6):
- GS 2D, 4x: ConvT(2->8,k5,s2)+Sigmoid -> ConvT(8->8,k5,s2) -> 1x1 (8->2)
  (train_2drd.py:26-41)
- GS 3D, 2x: ConvT3d(2->8,k5,s2)+Sigmoid -> 1x1x1 (8->2) trilinear variant
  (train_3drd.py:41-56)
- Burgers/LO, 2x: ConvT(2->16,k5,s2)+Tanh -> 1x1 (16->2)
  (rcnn_Burgers...py:38-52)

All ConvT layers use k=5, stride=2, padding=2, output_padding=1 (exact 2x).
Channels-last; weights [*k, Cin, Cout].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from percnn_tpu.ops.convs import conv_transpose_torch, pointwise_conv


@dataclasses.dataclass(frozen=True)
class ISGConfig:
    ndim: int = 2
    channels: int = 2
    hidden: int = 8
    strides: tuple = (2, 2)      # per-ConvT-stage stride; 2 => 2x upsample,
                                 # 1 => same-size refinement (3D GS stage 2,
                                 # train_3drd.py:49-51)
    activation: str = "sigmoid"  # 'sigmoid' | 'tanh' (per experiment)

    @property
    def n_stages(self) -> int:
        return len(self.strides)

    @property
    def scale(self) -> int:
        s = 1
        for st in self.strides:
            s *= st
        return s


def init_isg(key, cfg: ISGConfig, dtype=jnp.float32) -> dict:
    """Torch default init for ConvT/Conv layers: U(-b, b) with
    b = 1/sqrt(fan_in) (the reference leaves ISG at torch defaults).

    Torch's kaiming_uniform computes fan_in from weight dim 1 x receptive
    field; ConvTranspose weights are [Cin, Cout, *k], so its fan_in is
    Cout * k^nd (NOT Cin * k^nd)."""
    params = {}
    cin = cfg.channels
    ks = (5,) * cfg.ndim
    for i in range(cfg.n_stages):
        cout = cfg.hidden
        k1, k2, key = jax.random.split(key, 3)
        fan_in = cout * 5**cfg.ndim
        b = 1.0 / jnp.sqrt(fan_in)
        params[f"up{i}_w"] = jax.random.uniform(k1, ks + (cin, cout), dtype, -b, b)
        params[f"up{i}_b"] = jax.random.uniform(k2, (cout,), dtype, -b, b)
        cin = cout
    k1, k2, key = jax.random.split(key, 3)
    b = 1.0 / jnp.sqrt(cin)
    params["out_w"] = jax.random.uniform(k1, (cin, cfg.channels), dtype, -b, b)
    params["out_b"] = jax.random.uniform(k2, (cfg.channels,), dtype, -b, b)
    return params


def isg_apply(params: dict, h_low: jnp.ndarray, cfg: ISGConfig) -> jnp.ndarray:
    """[..., *low, C] -> [..., *high, C], high = low * prod(strides).

    The activation sits after the FIRST ConvT stage only — that matches all
    three reference variants: 2D-GS Sigmoid between its two ConvTs
    (train_2drd.py:33-39), 3D-GS Sigmoid between ConvT(s2) and ConvT(s1)
    (train_3drd.py:47-51), Burgers/LO Tanh after the single ConvT
    (rcnn_Burgers...py:43-49)."""
    act = jax.nn.sigmoid if cfg.activation == "sigmoid" else jnp.tanh
    x = h_low
    for i, stride in enumerate(cfg.strides):
        x = conv_transpose_torch(
            x, params[f"up{i}_w"], params[f"up{i}_b"],
            stride=stride, padding=2, output_padding=stride - 1,
        )
        if i == 0:
            x = act(x)
    return pointwise_conv(x, params["out_w"], params["out_b"])
