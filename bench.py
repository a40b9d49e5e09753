"""Headline benchmark: rollout grid-cell updates/sec/chip on the 2D
Gray-Scott configuration (the reference's largest-volume 2D workload:
100x100x2ch, 401 steps/iter, train_2drd.py:597,620).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference rolls out on one V100 with ~15 small kernel
launches per step (2 frozen 5x5 cuDNN convs + 8 pointwise convs + products
+ axpy, SURVEY §3.1); at a measured-typical ~5-10us launch+execute floor
per tiny kernel that is >=100us/step => <=1e8 cell-updates/s.  We use
1e8 as the (generous) V100 baseline constant; the reference publishes no
throughput numbers (BASELINE.md).

Methodology: the fused Pallas rollout streams every frame (what training
consumes).  The tunneled single-chip dev TPU has ~30ms RPC latency, so the
rollout repeats REPS times inside one jit (state chained) and latency is
measured separately and subtracted.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BASELINE_V100_CELL_UPDATES_PER_S = 1.0e8
H = W = 100
T = 401
REPS = 50


def main() -> None:
    from percnn_tpu.core.cell import PiCellConfig, init_pi_cell
    from percnn_tpu.ops.pallas.cell2d import (
        _fused_rollout_padded, pack_pi_params_2d, pad_state_2d,
    )

    cfg = PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                       diffusion="sigmoid", mu_up=3.99e-5, init_scale=0.02)
    params = init_pi_cell(jax.random.PRNGKey(0), cfg)
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (H, W, 2), jnp.float32)

    on_tpu = jax.default_backend() != "cpu"
    packed = pack_pi_params_2d(params, cfg)
    state0 = pad_state_2d(h0)
    reps = REPS if on_tpu else 2

    if on_tpu:
        @jax.jit
        def many(packed, state0):
            def body(i, s):
                frames = _fused_rollout_padded(
                    packed, s, cfg=cfg, n_steps=T, H=H, W=W, interpret=False
                )
                return frames[-1]
            return lax.fori_loop(0, reps, body, state0)
    else:
        # CPU fallback: the XLA scan path (interpreted Pallas would take
        # minutes per rollout); numbers are then CPU-scan numbers.
        from percnn_tpu.core.cell import pi_cell_step
        from percnn_tpu.core.rollout import rollout_final

        @jax.jit
        def many(packed, _state0):
            def body(i, h):
                return rollout_final(lambda x: pi_cell_step(params, x, cfg), h, T)
            return lax.fori_loop(0, reps, body, h0)

    # measure RPC/dispatch latency with a trivial op
    triv = jax.jit(lambda x: x + 1)
    _ = np.asarray(triv(jnp.zeros(8)))
    lat = min(
        (lambda t0: (np.asarray(triv(jnp.zeros(8))), time.time() - t0)[1])(time.time())
        for _ in range(5)
    )

    _ = np.asarray(many(packed, state0).ravel()[0:1])  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.time()
        out = many(packed, state0)
        _ = np.asarray(out.ravel()[0:1])
        times.append(time.time() - t0)
    per_rollout = (min(times) - lat) / reps
    value = H * W * T / per_rollout

    print(json.dumps({
        "metric": "gs2d_rollout_cell_updates_per_sec_per_chip",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / BASELINE_V100_CELL_UPDATES_PER_S,
    }))


if __name__ == "__main__":
    main()
