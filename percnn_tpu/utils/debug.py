"""Numerical-safety tooling (SURVEY §5: the reference's only guard is a NaN
watchdog in one script; here: checkify-instrumented functions + finite
checks usable in any pipeline stage)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn, *, errors=checkify.float_checks):
    """Wrap fn with jax.experimental.checkify: NaN/Inf (and optionally OOB
    index) production inside jit raises a readable error instead of
    propagating silently.

    >>> safe_step = checked(lambda h: pi_cell_step(params, h, cfg))
    >>> err, out = safe_step(h)
    >>> err.throw()   # raises if a NaN appeared anywhere inside
    """
    return checkify.checkify(fn, errors=errors)


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (post-run validation)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad}/{a.size} non-finite values"
            )


def nan_guard(x: jnp.ndarray, replace: float = 0.0) -> jnp.ndarray:
    """In-graph NaN/Inf scrub (for diagnostics only — training uses the
    reload-watchdog in core/train.py instead of masking)."""
    return jnp.where(jnp.isfinite(x), x, replace)
