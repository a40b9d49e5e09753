"""Recurrent rollout driver: `lax.scan` + segmented gradient checkpointing.

The reference unrolls its cell with a Python ``for`` loop and back-propagates
through the full retained graph (RCNN.forward, train_2drd.py:162-190;
``loss.backward(retain_graph=True)``, :407) — O(T) stored activations over
T in [200, 2500].  TPU-first replacement: a single compiled `lax.scan` whose
body is one cell step, cut into segments of ~sqrt(T) steps with
`jax.checkpoint` on each segment, giving O(sqrt(T)) live activation memory
during BPTT at the cost of one extra forward per segment.

The rollout returns all T+1 frames (frame 0 = the initial state, matching
the reference's ``outputs = [init_state] + ...``, percnn_LO_eqn.py:190-218);
`effective_step` subset selection is cheap slicing downstream.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _pick_segment(n_steps: int, target: int | None = None) -> int:
    """Largest divisor of n_steps not exceeding ~sqrt(n_steps) (or target)."""
    if target is None:
        target = max(1, int(math.sqrt(n_steps)))
    best = 1
    for d in range(1, n_steps + 1):
        if n_steps % d == 0 and d <= target:
            best = d
    return best


def rollout(
    step_fn: Callable[[jnp.ndarray], jnp.ndarray],
    h0: jnp.ndarray,
    n_steps: int,
    *,
    remat: bool = True,
    segment: int | None = None,
) -> jnp.ndarray:
    """Unroll `step_fn` n_steps times; return [n_steps + 1, *h0.shape].

    step_fn: pure h -> h_next (close over params/config before calling).
    remat: checkpoint each segment for O(sqrt(T))-memory BPTT.
    segment: inner segment length (auto ~sqrt(n_steps) divisor if None).
    """
    if n_steps == 0:
        return h0[None]
    seg = segment if segment is not None else _pick_segment(n_steps)
    if n_steps % seg != 0:
        raise ValueError(f"segment {seg} must divide n_steps {n_steps}")
    n_seg = n_steps // seg

    def inner(h, _):
        def body(h, _):
            h2 = step_fn(h)
            return h2, h2

        return jax.lax.scan(body, h, None, length=seg)

    if remat:
        inner = jax.checkpoint(inner, prevent_cse=False)

    def outer(h, _):
        h2, ys = inner(h, None)
        return h2, ys

    _, frames = jax.lax.scan(outer, h0, None, length=n_seg)
    frames = frames.reshape((n_steps,) + h0.shape)
    return jnp.concatenate([h0[None], frames], axis=0)


def rollout_final(step_fn, h0, n_steps: int) -> jnp.ndarray:
    """Final state only (no frame collection) — cheapest inference path."""
    def body(h, _):
        return step_fn(h), None

    h, _ = jax.lax.scan(body, h0, None, length=n_steps)
    return h
