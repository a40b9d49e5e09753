"""Weight initialisers reproducing the reference's distributions.

The reference converges (or not) depending on its scaled initialisations
(SURVEY §7 risks): scaled Xavier-uniform `c * xavier_uniform(w)` with c in
[0.01, 0.5] (train_2drd.py:92-103 c=0.02, train_3drd.py:109-120 c=0.01) and
a scaled fan-in uniform for the forward-sim experiment
(percnn_LO_eqn.py:86-95).  We replicate the distributions (not bitwise).

Weights are stored channels-last: conv [*k, Cin, Cout], pointwise [Cin, Cout].
Fan computation matches torch (fan_in = Cin * prod(k), fan_out = Cout * prod(k)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape) -> tuple[int, int]:
    """(fan_in, fan_out) for [*k, Cin, Cout] (or [Cin, Cout]) weights."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


def scaled_xavier_uniform(key, shape, c: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """c * XavierUniform: U(-b, b) * c with b = sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = _fans(shape)
    b = math.sqrt(6.0 / (fan_in + fan_out))
    return c * jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)


def scaled_fanin_uniform(key, shape, c: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """U(-b, b) with b = c*sqrt(1/prod(shape[:-1]_torch)) — the forward-sim
    variant (percnn_LO_eqn.py:86-95, c=0.5).  Torch weights are OIHW so
    prod(shape[:-1]) = O*I*prod(k[:-1]); for the 1x1 branches that is
    out_ch*in_ch.  Our layout is [*k, Cin, Cout]."""
    fan = shape[-1] * shape[-2]
    for s in shape[:-3]:  # spatial dims except the last one
        fan *= s
    b = c * math.sqrt(1.0 / fan)
    return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)


def uniform_symmetric(key, shape=(), half_width: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """U(-half_width, half_width) — used for raw diffusion scalars
    (train_2drd.py:58-62: (rand()-0.5)*2)."""
    return jax.random.uniform(key, shape, dtype, minval=-half_width, maxval=half_width)
