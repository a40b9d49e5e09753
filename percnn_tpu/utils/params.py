"""Parameter inspection (reference count_parameters / summary_parameters,
percnn_LO_eqn.py:396-472)."""

from __future__ import annotations

import numpy as np
import jax


def count_parameters(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def summary_parameters(tree) -> str:
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        lines.append(f"{jax.tree_util.keystr(path)}: {np.shape(leaf)}")
    lines.append(f"total: {count_parameters(tree)}")
    return "\n".join(lines)
