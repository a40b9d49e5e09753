"""Atomic pytree checkpointing with latest/best policies.

Replaces the reference's ``torch.save({'model_state_dict', ...})`` cadence
checkpoints (train_2drd.py:416-424) and best-val checkpoints
(rcnn_Burgers...py:630-638) with an atomic (write-tmp + os.replace) numpy
archive: leaves as .npy entries, tree structure as a JSON-encoded keypath
list — no pickle, cross-version stable, resume-safe even if the process
dies mid-write.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    paths = [jax.tree_util.keystr(p) for p, _ in leaves_with_paths]
    leaves = [np.asarray(v) for _, v in leaves_with_paths]
    return paths, leaves


def save_checkpoint(path: str, tree: Any, meta: dict | None = None) -> None:
    """Atomically save a pytree (+ JSON-able metadata) to `path` (.npz)."""
    paths, leaves = _flatten(tree)
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    payload["__paths__"] = np.asarray(json.dumps(paths))
    payload["__meta__"] = np.asarray(json.dumps(meta or {}))
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def peek_meta(path: str) -> dict:
    """Read only the JSON metadata of a checkpoint (no tree template
    needed) — used e.g. to recover the curriculum stage before resuming."""
    with np.load(path, allow_pickle=False) as z:
        return json.loads(str(z["__meta__"]))


def load_checkpoint(path: str, like: Any):
    """Load into the structure of `like`; returns (tree, meta).

    Leaf order is matched by keypath string, so reordered dict insertion is
    harmless.
    """
    with np.load(path, allow_pickle=False) as z:
        paths = json.loads(str(z["__paths__"]))
        meta = json.loads(str(z["__meta__"]))
        by_path = {p: z[f"leaf_{i}"] for i, p in enumerate(paths)}
    like_paths, like_leaves = _flatten(like)
    missing = [p for p in like_paths if p not in by_path]
    if missing:
        raise KeyError(f"checkpoint {path} missing leaves: {missing[:5]}")
    treedef = jax.tree_util.tree_structure(like)
    new_leaves = [by_path[p] for p in like_paths]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta


import re as _re

# jax.tree_util.keystr segments: ['key'] (dict), [3] (sequence),
# .attr (NamedTuple/dataclass field, e.g. optax ScaleByAdamState '.mu')
_KEY_RE = _re.compile(r"\['([^']*)'\]|\[(\d+)\]|\.([A-Za-z_][A-Za-z0-9_]*)")


def load_checkpoint_tree(path: str):
    """Template-free load: rebuild nested dicts/lists from the stored
    keypath strings; returns (tree, meta).

    Integer keys become list slots; tuples come back as lists and
    NamedTuple fields (e.g. optax optimizer state) come back as dicts keyed
    by field name — fine for inspection/export of parameter pytrees, which
    jax treats positionally.  Use `load_checkpoint(path, like)` when the
    exact container types must be restored (e.g. to resume an optimizer).
    """
    with np.load(path, allow_pickle=False) as z:
        paths = json.loads(str(z["__paths__"]))
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(len(paths))]

    root: dict = {}
    for p, leaf in zip(paths, leaves):
        keys = []
        covered = 0
        for m in _KEY_RE.finditer(p):
            if m.start() != covered:
                break
            covered = m.end()
            name, idx, attr = m.groups()
            keys.append(int(idx) if idx is not None
                        else (name if name is not None else attr))
        if not keys or covered != len(p):
            # e.g. '[<flat index 0>]' from a pytree node registered without
            # key support — refusing beats silently collapsing leaves
            raise ValueError(f"unparseable checkpoint keypath {p!r}; "
                             f"use load_checkpoint(path, like)")
        node = root
        for a in keys[:-1]:
            node = node.setdefault(a, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"keypath {p!r} descends into a leaf — unsupported "
                    f"checkpoint structure; use load_checkpoint(path, like)")
        node[keys[-1]] = leaf

    def listify(node):
        if isinstance(node, dict):
            if node and all(isinstance(k, int) for k in node):
                if sorted(node) != list(range(len(node))):
                    raise ValueError("non-contiguous sequence keypaths")
                return [listify(node[i]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root), meta
