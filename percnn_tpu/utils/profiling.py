"""Profiling / timing harness (reference has wall-clock prints only,
percnn_LO_eqn.py:517-523).

- `trace(path)`: context manager around `jax.profiler.trace` for on-device
  traces viewable in TensorBoard/Perfetto.
- `Timer`: latency-compensated throughput measurement for the remote-tunnel
  dev TPU (measures trivial-op RTT and subtracts it), the methodology used
  by bench.py.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(path: str):
    with jax.profiler.trace(path):
        yield


def measure_rtt(n: int = 5) -> float:
    """Round-trip latency of a trivial dispatched op (host<->device)."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8)
    _ = np.asarray(f(x))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _ = np.asarray(f(x))
        best = min(best, time.time() - t0)
    return best


class Timer:
    """Best-of-N wall timer with RTT compensation.

    >>> t = Timer()
    >>> per_call = t.time(lambda: fn(x), reps=3)   # seconds, RTT-corrected
    """

    def __init__(self):
        self.rtt = measure_rtt()

    def time(self, fn, *, reps: int = 3, inner: int = 1) -> float:
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
            best = min(best, time.time() - t0)
        return max(best - self.rtt, 1e-9) / inner
