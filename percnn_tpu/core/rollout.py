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
    if segment is None and remat and n_steps > 4 \
            and _pick_segment(n_steps) == 1:
        # prime n_steps has no useful divisor: segment=1 would checkpoint
        # every step (maximal recompute).  Peel one step off the front so
        # the remaining (even) count gets ~sqrt(T) segments.
        h1 = step_fn(h0)
        rest = rollout(step_fn, h1, n_steps - 1, remat=remat)
        return jnp.concatenate([h0[None], rest], axis=0)
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

    _, frames = jax.lax.scan(inner, h0, None, length=n_seg)
    frames = frames.reshape((n_steps,) + h0.shape)
    return jnp.concatenate([h0[None], frames], axis=0)


def rollout_final(step_fn, h0, n_steps: int) -> jnp.ndarray:
    """Final state only (no frame collection) — cheapest inference path."""
    def body(h, _):
        return step_fn(h), None

    h, _ = jax.lax.scan(body, h0, None, length=n_steps)
    return h


# --------------------------------------------------------------------------
# Two-phase BPTT: a TPU-native backward pass for the recurrence.
#
# Naive BPTT (what remat gives) interleaves, per step, the state-Jacobian
# transpose AND the parameter-gradient accumulation inside one sequential
# scan.  But only the state cotangent is sequential; parameter gradients are
# a sum of independent per-step terms.  So:
#   phase 1 (sequential): reverse scan computing state cotangents g_t only;
#   phase 2 (parallel):   batched-over-time vjp computing per-step parameter
#                         gradients from (h_t, g_{t+1}), chunked to bound
#                         memory, summed.
# Phase 2 vectorises over T into large fused batched ops (MXU-friendly for
# the Pi channel matmuls) instead of T tiny sequential ones.
# --------------------------------------------------------------------------


def chunked_param_grads(step_fn, params, h_prev, g_ins, n_steps: int,
                        chunk: int):
    """Phase-2 of the two-phase backward: parameter gradients
    sum_t vjp_params(step_fn at h_t)(g_{t+1}), batched over time in chunks
    of `chunk` to bound activation memory.  Shared by the jnp and Pallas
    BPTT paths.

    step_fn: (params, h) -> h_next.  h_prev/g_ins: [n_steps, *state].
    Zero-padded tail steps contribute zero gradient (zero cotangent)."""

    def pgrad(h_t, g_in):
        # HIGHEST matmul precision: with the TPU default (bf16 multiplies),
        # the einsum-based parameter-gradient reductions lose ~3 decimal
        # digits (measured 3e-3 worst-leaf vs f64 truth; the fused-pg
        # kernel's full-f32 VPU accumulation measures 5e-6 — see
        # examples/debug_pg.py).  These [*, HW]-contraction matmuls are a
        # small fraction of step time, so exactness here is ~free.
        with jax.default_matmul_precision("highest"):
            _, vjp_p = jax.vjp(lambda p: step_fn(p, h_t), params)
            return vjp_p(g_in)[0]

    chunk = min(chunk, n_steps)
    n_chunks = -(-n_steps // chunk)
    pad = n_chunks * chunk - n_steps
    if pad:
        h_prev = jnp.concatenate(
            [h_prev, jnp.zeros((pad,) + h_prev.shape[1:], h_prev.dtype)])
        g_ins = jnp.concatenate(
            [g_ins, jnp.zeros((pad,) + g_ins.shape[1:], g_ins.dtype)])
    h_c = h_prev.reshape((n_chunks, chunk) + h_prev.shape[1:])
    g_c = g_ins.reshape((n_chunks, chunk) + g_ins.shape[1:])

    def body(acc, x):
        h_b, g_b = x
        pg = jax.vmap(pgrad)(h_b, g_b)
        return jax.tree_util.tree_map(lambda a, s: a + s.sum(0), acc, pg), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    params_bar, _ = jax.lax.scan(body, zero, (h_c, g_c))
    return params_bar


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def rollout_tp(step_fn, params, h0, n_steps: int, pgrad_chunk: int = 64):
    """Differentiable rollout with the two-phase backward.

    step_fn: (params, h) -> h_next (pure).
    Returns [n_steps+1, *h0.shape] (frame 0 = h0).
    """
    def body(h, _):
        h2 = step_fn(params, h)
        return h2, h2

    _, frames = jax.lax.scan(body, h0, None, length=n_steps)
    return jnp.concatenate([h0[None], frames], axis=0)


def _rollout_tp_fwd(step_fn, params, h0, n_steps, pgrad_chunk):
    frames = rollout_tp(step_fn, params, h0, n_steps, pgrad_chunk)
    return frames, (params, frames)


def _rollout_tp_bwd(step_fn, n_steps, pgrad_chunk, residuals, frames_bar):
    params, frames = residuals
    h_prev = frames[:-1]          # h_t for t in [0, n_steps)

    # ---- phase 1: sequential state-cotangent sweep (reverse time) ----
    def p1_body(gbar, x):
        h_t, fbar_next = x
        g_in = gbar + fbar_next    # cotangent arriving at h_{t+1}
        _, vjp_h = jax.vjp(lambda h: step_fn(params, h), h_t)
        (gbar_prev,) = vjp_h(g_in)
        return gbar_prev, g_in

    g_T = jnp.zeros_like(frames[0])
    gbar0, g_ins = jax.lax.scan(
        p1_body, g_T, (h_prev, frames_bar[1:]), reverse=True
    )
    h0_bar = gbar0 + frames_bar[0]

    # ---- phase 2: time-batched parameter gradients, chunked ----
    params_bar = chunked_param_grads(step_fn, params, h_prev, g_ins,
                                     n_steps, pgrad_chunk)
    return params_bar, h0_bar


rollout_tp.defvjp(_rollout_tp_fwd, _rollout_tp_bwd)
