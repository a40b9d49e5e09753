"""Utility module tests: params inspection, profiling timer, metrics logger."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from percnn_tpu.utils.params import count_parameters, summary_parameters
from percnn_tpu.utils.profiling import Timer, measure_rtt
from percnn_tpu.utils.metrics import MetricsLogger, rel_l2


def test_count_and_summary_parameters():
    tree = {"a": jnp.zeros((2, 3)), "b": [jnp.zeros(4), jnp.zeros(())]}
    assert count_parameters(tree) == 6 + 4 + 1
    s = summary_parameters(tree)
    assert "total: 11" in s and "(2, 3)" in s


def test_timer_measures_positive_time():
    t = Timer()
    assert t.rtt >= 0
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((64, 64))
    per = t.time(lambda: f(x), reps=2)
    assert per > 0


def test_rel_l2():
    a = np.ones((4, 4))
    assert rel_l2(a, a) == 0.0
    assert abs(rel_l2(2 * a, a) - 1.0) < 1e-12


def test_metrics_logger_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    lg.log(0, loss=1.5, note="start")
    lg.log(1, loss=jnp.asarray(0.5))
    lg.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["loss"] == 1.5 and recs[0]["note"] == "start"
    assert recs[1]["loss"] == 0.5
