"""Device mesh construction for (data, x, y[, z]) layouts."""

from __future__ import annotations

import math

import numpy as np
import jax
from jax.sharding import Mesh


def factor_devices(n: int, n_axes: int) -> tuple[int, ...]:
    """Factor n devices into n_axes near-equal factors (descending)."""
    dims = [1] * n_axes
    rem = n
    for i in range(n_axes - 1):
        target = round(rem ** (1.0 / (n_axes - i)))
        f = 1
        for d in range(target, 0, -1):
            if rem % d == 0:
                f = d
                break
        dims[i] = f
        rem //= f
    dims[-1] = rem
    return tuple(sorted(dims, reverse=True))


def make_mesh(
    axis_names: tuple[str, ...] = ("x", "y"),
    *,
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    shape=None factors the device count automatically across the axes.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = factor_devices(n, len(axis_names))
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)
