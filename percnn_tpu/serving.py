"""Deployment / serving: ahead-of-time model export as portable StableHLO.

The reference has no serving story — "inference" is re-running the training
script with a larger ``step`` constant in ``__main__`` (SURVEY §3.4,
train_2drd.py:650-668).  The TPU-native equivalent: bake the trained
weights into the jitted rollout and serialize it with ``jax.export`` into a
self-contained, versioned StableHLO artifact.  A serving process (or a
future jax version, or a different host) then runs the model with ONE
deserialize call — no percnn_tpu import, no re-tracing, no checkpoint
plumbing.

Artifact format: a single .npz holding the serialized StableHLO blob plus a
JSON config sidecar (model family, grid, steps, dtype) for inspection.

The exported function is the portable jnp rollout (the fused Pallas kernels
lower to TPU-specific Mosaic custom calls; ``use_pallas=True`` opts in when
the artifact will only ever run on the same TPU generation).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from percnn_tpu.core.cell import (
    PiCellConfig,
    SymbolicCellConfig,
    pi_cell_step,
    symbolic_cell_step,
)
from percnn_tpu.core.isg import ISGConfig, isg_apply
from percnn_tpu.core.rollout import rollout, rollout_final


def _cell_step(params: dict, cfg) -> Callable:
    if isinstance(cfg, SymbolicCellConfig):
        return lambda h: symbolic_cell_step(params, h, cfg)
    return lambda h: pi_cell_step(params, h, cfg)


def build_serving_fn(
    params: dict,
    cell_cfg: PiCellConfig | SymbolicCellConfig,
    n_steps: int,
    *,
    isg_cfg: ISGConfig | None = None,
    final_only: bool = False,
    use_pallas: bool = False,
    dtype=None,
) -> Callable:
    """Weights-baked inference callable: input -> rollout.

    Input is the initial state [\\*spatial, C] — or the LOW-res measured IC
    when `isg_cfg` is given (the ISG upsamples in-graph, matching the
    reference's RCNN.forward, train_2drd.py:162-166).  Output is
    [n_steps+1, \\*spatial, C] frames (or the final state with
    `final_only=True`).  `dtype` casts the baked weights to the serving
    precision (e.g. export an f64-trained model for f32 serving).
    """
    cast = (lambda x: jnp.asarray(x, dtype)) if dtype is not None else jnp.asarray
    params = jax.tree_util.tree_map(cast, params)
    cell_params = params.get("cell", params)

    def fn(x):
        if isg_cfg is not None:
            h0 = isg_apply(params["isg"], x[None], isg_cfg)[0]
        else:
            h0 = x
        if use_pallas and isinstance(cell_cfg, PiCellConfig) and cell_cfg.ndim == 2:
            from percnn_tpu.ops.pallas.cell2d import (
                fused_rollout_2d, fused_rollout_final_2d,
            )
            roll = fused_rollout_final_2d if final_only else fused_rollout_2d
            return roll(cell_params, h0, cell_cfg, n_steps)
        step = _cell_step(cell_params, cell_cfg)
        if final_only:
            return rollout_final(step, h0, n_steps)
        return rollout(step, h0, n_steps, remat=False)

    return fn


def export_model(
    params: dict,
    cell_cfg: PiCellConfig | SymbolicCellConfig,
    n_steps: int,
    input_shape: tuple,
    *,
    isg_cfg: ISGConfig | None = None,
    final_only: bool = False,
    use_pallas: bool = False,
    dtype=jnp.float32,
    path: str | None = None,
) -> bytes:
    """Trace + serialize the weights-baked rollout to StableHLO bytes.

    input_shape: shape of the serving input ([\\*spatial, C], low-res when
    an ISG is baked in).  If `path` is given, writes the artifact .npz.
    """
    fn = build_serving_fn(params, cell_cfg, n_steps, isg_cfg=isg_cfg,
                          final_only=final_only, use_pallas=use_pallas,
                          dtype=dtype)
    spec = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    exported = jax_export.export(jax.jit(fn))(spec)
    blob = bytes(exported.serialize())
    if path is not None:
        cfg_json = {
            "cell": dataclasses.asdict(cell_cfg),
            "cell_kind": type(cell_cfg).__name__,
            "isg": dataclasses.asdict(isg_cfg) if isg_cfg else None,
            "n_steps": n_steps,
            "input_shape": list(input_shape),
            "dtype": np.dtype(dtype).name,
            "final_only": final_only,
            "jax_version": jax.__version__,
            # Pallas-baked artifacts lower to Mosaic custom calls and are
            # locked to the platform (TPU generation) they were traced on;
            # plain StableHLO artifacts are portable.  load_model checks this.
            "use_pallas": use_pallas,
            # device_kind carries the TPU GENERATION (e.g. 'TPU v5e'), not
            # just the backend name — Mosaic custom calls are generation-locked
            "platform": (f"{jax.default_backend()}:{jax.devices()[0].device_kind}"
                         if use_pallas else None),
        }
        np.savez(path, blob=np.frombuffer(blob, np.uint8),
                 config=np.asarray(json.dumps(cfg_json)))
    return blob


def load_model(path_or_blob: str | bytes) -> tuple[Callable, dict]:
    """Deserialize an exported artifact; returns (callable, config dict).

    The callable runs the baked-in model on any jax backend that supports
    the serialized ops — no other percnn_tpu state required.
    """
    if isinstance(path_or_blob, (bytes, bytearray)):
        blob, cfg = bytes(path_or_blob), {}
    else:
        with np.load(path_or_blob, allow_pickle=False) as z:
            blob = z["blob"].tobytes()
            cfg = json.loads(str(z["config"]))
    here = f"{jax.default_backend()}:{jax.devices()[0].device_kind}"
    if cfg.get("use_pallas") and cfg.get("platform") != here:
        raise RuntimeError(
            f"artifact was exported with use_pallas=True on platform "
            f"{cfg.get('platform')!r} and its Mosaic custom calls cannot run "
            f"on {here!r}; re-export with use_pallas=False "
            "for a portable StableHLO artifact")
    exported = jax_export.deserialize(blob)
    return exported.call, cfg
