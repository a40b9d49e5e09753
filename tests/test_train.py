"""Trainer tests: convergence, StepLR schedule, NaN watchdog, checkpoints,
and a small end-to-end forward-sim slice."""

import dataclasses
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percnn_tpu.core.train import TrainConfig, train, pretrain_isg
from percnn_tpu.core.checkpoint import save_checkpoint, load_checkpoint
from percnn_tpu.experiments.configs import FORWARD_SIM_LO, GS2D_RECON
from percnn_tpu.experiments import runner as R
from percnn_tpu.core.cell import PiCellConfig


def test_train_quadratic_converges(tmp_path):
    target = jnp.array([1.0, -2.0, 3.0])

    def loss_fn(p):
        l = jnp.sum((p["w"] - target) ** 2)
        return l, {"val": l}

    cfg = TrainConfig(n_iters=300, lr=0.1, lr_step=100, lr_gamma=0.9,
                      ckpt_path=str(tmp_path / "q.npz"), ckpt_every=50)
    params, hist = train(loss_fn, {"w": jnp.zeros(3)}, cfg)
    assert hist[-1] < 1e-4
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(target), atol=1e-2)


def test_watchdog_reloads_and_decays_lr(tmp_path):
    """Loss returns NaN after iteration 60; watchdog must keep params finite
    and shrink lr_scale."""
    calls = {"n": 0}

    def loss_fn(p):
        l = jnp.sum(p["w"] ** 2)
        # inject NaN via data: impossible inside jit — instead make loss
        # blow up by huge lr? Simpler: depend on a counter via closure is
        # not traceable. We instead make the loss genuinely produce NaN for
        # large w (sqrt of negative).
        l = l + jnp.sqrt(1.0 - jnp.sum(p["w"] ** 2)) * 0.0
        return l, {"phy": jnp.where(jnp.sum(p["w"] ** 2) > 25.0, jnp.nan, l)}

    # Start inside the NaN region with no prior checkpoint: the watchdog
    # retries (reload + 0.9x LR) without consuming iterations, and aborts
    # with a clear error after 50 consecutive failures instead of looping
    # forever.
    cfg = TrainConfig(n_iters=20, lr=1e-2, watchdog=True, watchdog_key="phy",
                      ckpt_path=str(tmp_path / "w.npz"))
    with pytest.raises(FloatingPointError, match="watchdog"):
        train(loss_fn, {"w": 6.0 * jnp.ones(3)}, cfg)

    # with a recoverable state (params start finite, checkpoint written
    # before the NaN region is entered) training completes
    cfg2 = TrainConfig(n_iters=10, lr=1e-3, watchdog=True, watchdog_key="phy",
                       ckpt_path=str(tmp_path / "w2.npz"), ckpt_every=1)
    params, hist = train(loss_fn, {"w": 0.1 * jnp.ones(3)}, cfg2)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert len(hist) == 10


def test_resume_from_checkpoint(tmp_path):
    target = jnp.array([2.0])

    def loss_fn(p):
        l = jnp.sum((p["w"] - target) ** 2)
        return l, {}

    ck = str(tmp_path / "r.npz")
    cfg = TrainConfig(n_iters=50, lr=0.05, ckpt_path=ck, ckpt_every=10)
    p1, _ = train(loss_fn, {"w": jnp.zeros(1)}, cfg)
    # resume continues past iteration 50 to 80
    cfg2 = dataclasses.replace(cfg, n_iters=80)
    p2, hist2 = train(loss_fn, {"w": jnp.zeros(1)}, cfg2, resume=True)
    assert len(hist2) == 30  # only the remaining iterations ran


def test_checkpoint_extra_meta_and_peek(tmp_path):
    """extra_meta (e.g. curriculum stage) persists in the checkpoint and is
    readable without a tree template."""
    from percnn_tpu.core.checkpoint import peek_meta

    def loss_fn(p):
        l = jnp.sum(p["w"] ** 2)
        return l, {}

    ck = str(tmp_path / "m.npz")
    cfg = TrainConfig(n_iters=5, lr=0.01, ckpt_path=ck, ckpt_every=2)
    train(loss_fn, {"w": jnp.ones(2)}, cfg, extra_meta={"stage": 2})
    meta = peek_meta(ck)
    assert meta["stage"] == 2
    assert meta["iteration"] == 5


def test_best_val_policy(tmp_path):
    """best_val returns the params with the lowest 'val', not the last."""
    def loss_fn(p):
        l = jnp.sum(p["w"] ** 2)
        # val is worse when w is closer to 0 => best params are the earliest
        return l, {"val": -l}

    cfg = TrainConfig(n_iters=30, lr=0.1, best_val=True,
                      ckpt_path=None)
    params, _ = train(loss_fn, {"w": jnp.ones(2)}, cfg)
    # earliest iterate (closest to initial w=1) should be kept
    assert float(jnp.sum(params["w"] ** 2)) > 0.5


def test_best_key_keeps_healthiest_iterate(tmp_path):
    """best_key selects by an aux metric mid-run: the optimized loss drives
    w monotonically up, but 'data' is best near w=2 — the returned params
    must be the mid-run iterate, not the final one (the round-2 GS3D
    slow-drift failure mode: last != best)."""
    def loss_fn(p):
        w = p["w"]
        return -jnp.sum(w), {"data": jnp.sum((w - 2.0) ** 2)}

    cfg = TrainConfig(n_iters=400, lr=0.02, best_key="data",
                      ckpt_path=str(tmp_path / "bk.npz"), ckpt_every=1000)
    params, _ = train(loss_fn, {"w": jnp.zeros(2)}, cfg)
    w = np.asarray(params["w"])
    assert np.all(np.abs(w - 2.0) < 0.3), w      # kept ~best iterate
    best = np.load(str(tmp_path / "bk.npz.best"))  # .best checkpoint written
    assert best is not None


def test_best_ckpt_final_flush_matches_returned_params(tmp_path):
    """The on-disk .best must equal the returned best_params even when the
    last improvement lands inside a throttle window (ckpt_every larger than
    the run): offline consumers (stage3_coef_report) treat .best as
    authoritative, so a stale first-improvement write is a silent
    regression."""
    from percnn_tpu.core.checkpoint import load_checkpoint_tree

    def loss_fn(p):
        w = p["w"]
        # loss drives w monotonically up; 'data' bottoms out near w=2, so
        # the best iterate is mid-run and the final chunks never improve
        return -jnp.sum(w), {"data": jnp.sum((w - 2.0) ** 2)}

    ck = str(tmp_path / "ff.npz")
    cfg = TrainConfig(n_iters=400, lr=0.02, best_key="data", ckpt_path=ck,
                      ckpt_every=10 ** 6, steps_per_call=20)
    params, _ = train(loss_fn, {"w": jnp.zeros(2)}, cfg)
    tree, _ = load_checkpoint_tree(ck + ".best")
    np.testing.assert_allclose(np.asarray(tree["params"]["w"]),
                               np.asarray(params["w"]))


def test_spike_watchdog_triggers_on_finite_divergence(tmp_path):
    """A finite (non-NaN) jump of the watch metric past spike_mult x its EMA
    triggers reload+backoff; after spike_max_retries deterministic-replay
    rollbacks it ACCEPTS the new regime (rebased EMA) instead of aborting
    the run — landscape-driven spikes must not kill training."""
    import json

    def loss_fn(p):
        w = jnp.sum(p["w"])
        phy = jnp.where(w > 0.5, 1e4, 1.0)      # violent finite divergence
        return -w, {"phy": phy}

    log = str(tmp_path / "sw.jsonl")
    base = dict(n_iters=200, lr=0.01, watchdog=True, watchdog_key="phy",
                ckpt_path=str(tmp_path / "sw.npz"), ckpt_every=1,
                log_path=log, log_every=10 ** 9)
    params, hist = train(loss_fn, {"w": jnp.zeros(2)},
                         TrainConfig(**base, spike_mult=10.0, spike_warmup=0))
    assert len(hist) == 200                      # completes despite spikes
    events = [json.loads(l).get("event") for l in open(log)]
    assert "spike_watchdog" in events            # rollback fired
    assert "spike_accepted" in events            # bounded retries, then gave up
    # off (default): finite values never trigger at all
    log2 = str(tmp_path / "sw2.jsonl")
    base["log_path"] = log2
    base["ckpt_path"] = str(tmp_path / "sw2.npz")
    params, hist = train(loss_fn, {"w": jnp.zeros(2)}, TrainConfig(**base))
    assert len(hist) == 200
    assert not any(json.loads(l).get("event") for l in open(log2))


def test_lr_recover_restores_scale_after_spike(tmp_path):
    """lr_recover walks the watchdog's lr_scale back toward 1.0 on clean
    chunks; without it the backoff is permanent (round-3 GS3D seed 0
    finished a 12k-iter run LR-starved at 0.185x after one mid-run spike)."""
    import json

    from percnn_tpu.core.checkpoint import peek_meta

    def loss_fn(p):
        w = jnp.sum(p["w"])
        phy = jnp.where(w > 0.5, 1e4, 1.0)      # one-shot finite divergence
        return -w, {"phy": phy}

    def run(lr_recover, tag):
        ckpt = str(tmp_path / f"{tag}.npz")
        log = str(tmp_path / f"{tag}.jsonl")
        train(loss_fn, {"w": jnp.zeros(2)},
              TrainConfig(n_iters=400, lr=0.01, watchdog=True,
                          watchdog_key="phy", spike_mult=10.0, spike_warmup=0,
                          lr_recover=lr_recover, ckpt_path=ckpt, ckpt_every=1,
                          log_path=log, log_every=10 ** 9))
        events = [json.loads(l).get("event") for l in open(log)]
        assert "spike_accepted" in events        # backoff path exercised
        return peek_meta(ckpt)["lr_scale"]

    backed_off = run(1.0, "perm")                # permanent: 0.9^retries
    assert backed_off < 0.95
    recovered = run(1.05, "rec")                 # same spike, then recovery
    assert recovered == 1.0


def _tiny_lo_config():
    exp = FORWARD_SIM_LO
    cell = dataclasses.replace(exp.cell, hidden=4)
    return dataclasses.replace(
        exp, grid=32, train_steps=24, infer_steps=24, cell=cell,
        train=dataclasses.replace(exp.train, n_iters=250, log_every=100),
    )


def test_forward_sim_lo_end_to_end(tmp_path):
    """Minimum end-to-end slice (SURVEY §7 step 3): physics-only training on
    a small lambda-omega problem must reduce the residual by orders of
    magnitude and track the truth rollout."""
    exp = _tiny_lo_config()
    res = R.run_experiment(
        exp, out_dir=str(tmp_path), cache_dir=None, dtype=jnp.float64,
        warmup=40, seed=0,
    )
    hist = res["history"]
    assert hist[-1] < hist[0] * 1e-2, (hist[0], hist[-1])
    assert res["rel_l2"] < 0.5, res["rel_l2"]


def test_gs2d_data_driven_smoke(tmp_path):
    """Data-driven path (ISG + data/ic losses) runs and improves."""
    exp = GS2D_RECON
    exp = dataclasses.replace(
        exp,
        grid=32,
        train_steps=40,
        infer_steps=40,
        curriculum=(),
        cell=dataclasses.replace(exp.cell, hidden=4),
        data=dataclasses.replace(exp.data, time_stride=10, space_stride=4),
        train=dataclasses.replace(exp.train, n_iters=60, log_every=50),
        isg_pretrain_iters=150,
    )
    res = R.run_experiment(exp, out_dir=str(tmp_path), cache_dir=None, seed=0)
    hist = res["history"]
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0], (hist[0], hist[-1])


def test_gs3d_data_driven_smoke(tmp_path):
    """3D path: trilinear ISG (strides 2,1), Conv3d Pi cell, 3D losses."""
    from percnn_tpu.experiments.configs import GS3D_RECON

    exp = GS3D_RECON
    exp = dataclasses.replace(
        exp,
        grid=16,
        train_steps=20,
        infer_steps=20,
        curriculum=(),
        data=dataclasses.replace(exp.data, time_stride=5, space_stride=2),
        train=dataclasses.replace(exp.train, n_iters=30, log_every=20,
                                  watchdog=True),
        isg_pretrain_iters=60,
        noise_pct=0.05,
    )
    res = R.run_experiment(exp, out_dir=str(tmp_path), cache_dir=None, seed=0)
    assert np.isfinite(res["history"]).all()
    assert res["history"][-1] < res["history"][0]
    assert res["frames"].shape == (21, 16, 16, 16, 2)
    # sympy extraction of the trained 3D Pi polynomial
    assert "pi_expressions" in res and len(res["pi_expressions"]) == 2


def test_load_checkpoint_tree_template_free(tmp_path):
    """Template-free loader rebuilds nested dict/list pytrees (used by the
    CLI export path, which has no live model to borrow structure from)."""
    from percnn_tpu.core.checkpoint import load_checkpoint_tree

    tree = {
        "params": {
            "cell": {
                "diff": jnp.asarray([0.1, 0.2], jnp.float32),
                "pi": [{"w0": jnp.ones((2, 4)), "b0": jnp.zeros(4)},
                       {"w0": jnp.full((2, 4), 2.0), "b0": jnp.ones(4)}],
            },
        },
    }
    path = str(tmp_path / "t.npz")
    save_checkpoint(path, tree, meta={"k": 1})
    got, meta = load_checkpoint_tree(path)
    assert meta == {"k": 1}
    assert isinstance(got["params"]["cell"]["pi"], list)
    np.testing.assert_array_equal(got["params"]["cell"]["pi"][1]["w0"],
                                  np.full((2, 4), 2.0))
    np.testing.assert_array_equal(got["params"]["cell"]["diff"],
                                  np.asarray([0.1, 0.2], np.float32))


def test_load_checkpoint_tree_optimizer_state(tmp_path):
    """Trainer checkpoints carry optax NamedTuple state; the template-free
    loader must parse '.mu'/'.count'-style keypath segments (the CLI
    `export --ckpt <run checkpoint>` chain depends on this)."""
    from percnn_tpu.core.checkpoint import load_checkpoint_tree

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2), {}

    ck = str(tmp_path / "opt.npz")
    cfg = TrainConfig(n_iters=3, lr=0.01, ckpt_path=ck, ckpt_every=1)
    train(loss_fn, {"w": jnp.ones(3)}, cfg)
    tree, meta = load_checkpoint_tree(ck)
    np.testing.assert_array_equal(tree["params"]["w"].shape, (3,))
    # optax chain state resolves to nested dicts with field-name keys
    flat = jax.tree_util.tree_leaves(tree["opt_state"])
    assert len(flat) >= 2  # at least mu/nu (+ counts)
    assert meta["iteration"] == 3


def test_make_dataset_cache_atomic_and_self_healing(tmp_path):
    """A half-written ground-truth cache (process killed mid-save) must be
    rebuilt, not crash the run (runner.make_dataset)."""
    exp = dataclasses.replace(FORWARD_SIM_LO, grid=16, train_steps=4,
                              infer_steps=4)
    cache_dir = str(tmp_path / "cache")
    truth = R.make_dataset(exp, warmup=0, cache_dir=cache_dir)
    import os
    (cached,) = [f for f in os.listdir(cache_dir) if f.endswith(".npz")]
    path = os.path.join(cache_dir, cached)
    with open(path, "wb") as f:
        f.write(b"not a zip file")  # simulate mid-write kill
    rebuilt = R.make_dataset(exp, warmup=0, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(truth))
    # and the rebuilt cache is valid again
    again = R.make_dataset(exp, warmup=0, cache_dir=cache_dir)
    np.testing.assert_allclose(np.asarray(again), np.asarray(truth))


def test_loss_args_matches_closure_constants(tmp_path):
    """Training data passed through jit as an argument (train(loss_args=))
    must give the same losses as the closure-constant path, and the jitted
    loss must be dataset-independent: two different noise draws of the
    same experiment shape reuse ONE compiled step (the 0-30% noise matrix
    would otherwise recompile per level)."""
    exp = dataclasses.replace(
        GS2D_RECON, grid=16, train_steps=8, infer_steps=8, curriculum=(),
        isg_pretrain_iters=0,
        cell=dataclasses.replace(GS2D_RECON.cell, hidden=4),
        data=dataclasses.replace(GS2D_RECON.data, time_stride=4,
                                 space_stride=4),
        train=dataclasses.replace(GS2D_RECON.train, n_iters=4,
                                  steps_per_call=2, log_every=100),
    )
    rng = np.random.default_rng(0)
    truth = (rng.standard_normal((9, 16, 16, 2)) * 0.1 + 0.3).astype(
        np.float32)
    prob = R.setup_problem(exp, truth)
    params = R.init_model(exp, jax.random.PRNGKey(0))
    lf = R.build_loss_fn(prob, 8)

    t_const, aux_const = lf(params)
    t_args, aux_args = lf(params, R.problem_data(prob))
    assert float(t_const) == float(t_args)
    for k in aux_const:
        assert float(aux_const[k]) == float(aux_args[k]), k

    # one compiled step serves two datasets
    prob2 = R.setup_problem(dataclasses.replace(exp, noise_pct=0.3), truth)
    jlf = jax.jit(lf)
    jlf(params, R.problem_data(prob))
    n_compiles = jlf._cache_size()
    jlf(params, R.problem_data(prob2))
    assert jlf._cache_size() == n_compiles == 1

    # full loop: loss_args path tracks the constant path to f32 roundoff
    # (bitwise can differ -- XLA folds constants differently)
    tcfg = exp.train
    _, h_const = train(lf, params, tcfg)
    _, h_args = train(lf, params, tcfg, loss_args=(R.problem_data(prob),))
    np.testing.assert_allclose(h_const, h_args, rtol=1e-5)


def test_run_experiment_uses_loss_args(tmp_path):
    """The runner's single-device path trains through loss_args; end-to-end
    result stays healthy (regression guard for the wiring)."""
    exp = dataclasses.replace(FORWARD_SIM_LO, grid=16, train_steps=8,
                              infer_steps=8,
                              train=dataclasses.replace(
                                  FORWARD_SIM_LO.train, n_iters=30,
                                  log_every=100))
    res = R.run_experiment(exp, out_dir=str(tmp_path), cache_dir=None,
                           dtype=jnp.float64, warmup=20, seed=0)
    hist = res["history"]
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_best_key_typo_raises():
    """A best_key absent from the loss aux raises instead of silently
    returning the initial params (the NaN-forever footgun)."""
    import pytest

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2), {"data": jnp.sum(p["w"])}

    cfg = TrainConfig(n_iters=10, lr=0.01, best_key="dta", ckpt_path=None)
    with pytest.raises(KeyError, match="dta"):
        train(loss_fn, {"w": jnp.ones(2)}, cfg)


def test_evaluate_divergence_aware():
    """An iterate can train to finite loss on short segments yet blow up
    over the long eval horizon (GS3D seed 4, RESULTS.md round 4).  The
    HEADLINE rel_l2 must stay NaN for a diverged rollout — a finite prefix
    number would read as comparable to healthy rows (ADVICE round 4) — with
    the finite-prefix accuracy under the *_stable keys + stable_frames."""
    from percnn_tpu.core.cell import init_pi_cell

    cfg = FORWARD_SIM_LO.cell
    exp = dataclasses.replace(FORWARD_SIM_LO, grid=8)
    rng = np.random.RandomState(0)
    truth = (0.1 * rng.rand(31, 8, 8, 2)).astype(np.float32)
    prob = R.Problem(exp, truth, jnp.asarray(truth[0]), None, None)

    cell = init_pi_cell(jax.random.PRNGKey(0), cfg)

    # healthy params: full horizon, no divergence flag, headline == stable
    m = R.evaluate({"cell": cell}, prob, 30)
    assert not m["diverged"] and m["stable_frames"] == 31
    assert np.isfinite(m["rel_l2"])
    assert m["rel_l2"] == m["rel_l2_stable"]

    # exploded params: headline NaN, prefix metrics under *_stable
    boom = jax.tree_util.tree_map(lambda x: x * 1e6, cell)
    m = R.evaluate({"cell": boom}, prob, 30)
    assert m["diverged"] and 1 <= m["stable_frames"] < 31
    for k in ("rel_l2", "rel_l2_u", "rel_l2_v"):
        assert np.isnan(m[k]), k
        assert np.isfinite(m[k + "_stable"]), k
    assert np.isfinite(m["rel_l2_per_frame"]).all()


def test_metrics_logger_jsonl_is_strict_json(tmp_path):
    """Non-finite floats must land as null in the JSONL stream (bare NaN
    tokens are non-standard JSON and break strict parsers — ADVICE r4)."""
    import json

    from percnn_tpu.utils.metrics import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path)
    lg.log(0, a=float("nan"), b=float("inf"), c=1.5, d=[1.0, float("nan")])
    lg.close()
    rec = json.loads(open(path).read())
    assert rec["a"] is None and rec["b"] is None and rec["c"] == 1.5
    assert rec["d"] == [1.0, None]
    # in-process history keeps the raw floats
    assert math.isnan(lg.history[0]["a"])


def test_probe_checkpoints_stable_iterate(tmp_path):
    """train(probe=...) must checkpoint the best-scoring STABLE iterate to
    .stable — including when later (lower-training-loss) iterates go
    probe-unstable, the exact GS3D failure mode (seed 4, round 4)."""
    ckpt = str(tmp_path / "p.npz")

    def loss_fn(p):
        l = jnp.sum((p["w"] - 3.0) ** 2)
        return l, {"val": l}

    # probe: "stable" only while w < 2 — training walks w from 0 toward 3,
    # so early iterates probe stable and late ones do not
    def probe(p):
        w = float(np.mean(np.asarray(p["w"])))
        return abs(w) if w < 2.0 else float("inf")

    cfg = TrainConfig(n_iters=60, lr=0.2, lr_step=1000, probe_every=5,
                      ckpt_path=ckpt, ckpt_every=5, steps_per_call=5)
    params, _ = train(loss_fn, {"w": jnp.zeros(3)}, cfg, probe=probe)
    assert float(np.mean(np.asarray(params["w"]))) > 2.5  # training converged
    from percnn_tpu.core.checkpoint import load_checkpoint_tree, peek_meta

    tree, meta = load_checkpoint_tree(ckpt + ".stable")
    w_stable = float(np.mean(np.asarray(tree["params"]["w"])))
    assert w_stable < 2.0  # the checkpointed iterate is probe-stable
    assert math.isfinite(meta["probe_score"])

    # candidate selection: stable beats best/latest when they probe inf
    prob = None  # select_stable_candidate only touches prob via probe
    chosen, rep = R.select_stable_candidate(params, prob, ckpt, probe)
    assert rep["candidate"] == "stable"
    assert float(np.mean(np.asarray(chosen["w"]))) == w_stable
    assert not np.isfinite(rep["probe_scores"]["best"])

    # when every candidate is stable, the lowest score wins
    ok_probe = lambda p: float(np.mean(np.asarray(p["w"])))
    chosen2, rep2 = R.select_stable_candidate(params, prob, ckpt, ok_probe)
    assert rep2["candidate"] == "stable"  # smallest w => smallest score


def test_run_experiment_probe_selects_stable(tmp_path):
    """End-to-end: a probe-enabled experiment records the candidate choice
    and returns finite headline metrics when a stable iterate exists."""
    exp = dataclasses.replace(
        GS2D_RECON, grid=16, train_steps=8, infer_steps=10, curriculum=(),
        train=dataclasses.replace(GS2D_RECON.train, n_iters=12,
                                  steps_per_call=4, ckpt_every=4,
                                  probe_every=4, best_key=None,
                                  best_val=False),
        data=dataclasses.replace(GS2D_RECON.data, time_stride=2,
                                 space_stride=2),
        isg_pretrain_iters=4,
    )
    res = R.run_experiment(exp, out_dir=str(tmp_path), cache_dir=None,
                           seed=0)
    assert res["candidate"] in ("best", "latest", "stable")
    assert np.isfinite(res["probe_scores"][res["candidate"]])
    assert os.path.exists(str(tmp_path / "gs2d_recon.ckpt.npz.stable"))


def test_spike_reset_opt_reinits_moments_on_repeat_rollback(tmp_path):
    """With spike_reset_opt, the 2nd+ consecutive watchdog rollback must
    reinitialize the optimizer moments (the LR-cut-only replay is
    deterministic and can cascade — GS3D seeds 0/4, RESULTS.md round 4);
    the 1st rollback keeps the reference semantics (reload moments)."""
    from percnn_tpu.utils.metrics import MetricsLogger

    def loss_fn(p):
        l = jnp.sum(p["w"] ** 2)
        return l, {"phy": jnp.where(jnp.sum(p["w"] ** 2) > 25.0, jnp.nan, l)}

    cfg = TrainConfig(n_iters=20, lr=1e-2, watchdog=True, watchdog_key="phy",
                      spike_reset_opt=True, ckpt_path=str(tmp_path / "w.npz"))
    logger = MetricsLogger()
    # start inside the NaN region: every chunk fails until the 50-cap abort
    with pytest.raises(FloatingPointError, match="watchdog"):
        train(loss_fn, {"w": 6.0 * jnp.ones(3)}, cfg, logger=logger)
    events = [r for r in logger.history if r.get("event") == "nan_watchdog"]
    assert len(events) >= 3
    assert "opt_reset" not in events[0]          # 1st rollback: reference path
    assert all(e.get("opt_reset") for e in events[1:])  # 2nd+: moments reset

    # default (off): no rollback ever resets
    cfg2 = dataclasses.replace(cfg, ckpt_path=str(tmp_path / "w2.npz"))
    cfg2 = dataclasses.replace(cfg2, spike_reset_opt=False)
    logger2 = MetricsLogger()
    with pytest.raises(FloatingPointError, match="watchdog"):
        train(loss_fn, {"w": 6.0 * jnp.ones(3)}, cfg2, logger=logger2)
    assert not any("opt_reset" in r for r in logger2.history)


def test_abort_policy_stop_returns_instead_of_raising(tmp_path):
    """abort_policy='stop' ends training gracefully when the NaN watchdog
    exhausts its rollback cap (round-5 GS3D seed 5: an unrecoverable
    forward-NaN loop at the stage-2 transition), logging an `aborted` event
    and returning the tracked params for candidate selection."""
    from percnn_tpu.utils.metrics import MetricsLogger

    def loss_fn(p):
        l = jnp.sum(p["w"] ** 2)
        return l, {"phy": jnp.where(jnp.sum(p["w"] ** 2) > 25.0, jnp.nan, l)}

    cfg = TrainConfig(n_iters=20, lr=1e-2, watchdog=True, watchdog_key="phy",
                      abort_policy="stop", ckpt_path=str(tmp_path / "w.npz"))
    logger = MetricsLogger()
    params, hist = train(loss_fn, {"w": 6.0 * jnp.ones(3)}, cfg,
                         logger=logger)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert any(r.get("event") == "aborted" for r in logger.history)


def test_run_experiment_with_restarts_gates_and_records(tmp_path):
    """loss_gate trips -> a retry runs with the init seed shifted; the
    attempt log records both and the returned result is the lower-loss
    attempt (truth-free selection)."""
    exp = _tiny_lo_config()
    res = R.run_experiment_with_restarts(
        exp, out_dir=str(tmp_path / "r"), seed=0, max_restarts=1,
        loss_gate=1e-30,  # unreachable: always gates -> exactly 2 attempts
        cache_dir=None, dtype=jnp.float64, warmup=40,
    )
    att = res["attempts"]
    assert [a["init_seed"] for a in att] == [0, 1000]
    assert att[1]["out_dir"].endswith(".retry1")
    losses = [a["final_stage_min_loss"] for a in att]
    assert all(np.isfinite(l) for l in losses)
    assert res["final_stage_min_loss"] == min(losses)
    assert np.isfinite(res["rel_l2"])


def test_run_experiment_with_restarts_stops_when_healthy(tmp_path):
    """No gate tripped -> a single attempt, no retry artifacts."""
    exp = _tiny_lo_config()
    res = R.run_experiment_with_restarts(
        exp, out_dir=str(tmp_path / "r"), seed=0, max_restarts=2,
        loss_gate=None, cache_dir=None, dtype=jnp.float64, warmup=40,
    )
    assert len(res["attempts"]) == 1
    assert not os.path.exists(str(tmp_path / "r.retry1"))


def test_run_experiment_with_restarts_crash_resume(tmp_path):
    """Re-invoking the ladder on a completed attempt dir crash-resumes from
    its checkpoint instead of retraining: no loss_gate -> a single attempt
    even though the resumed run reports final_stage_min_loss=None (training
    already finished), and the None loss must not crash best-attempt
    selection (round-5 verify regression)."""
    exp = _tiny_lo_config()
    kw = dict(out_dir=str(tmp_path / "r"), seed=0, max_restarts=2,
              loss_gate=None, cache_dir=None, dtype=jnp.float64, warmup=40)
    first = R.run_experiment_with_restarts(exp, **kw)
    res = R.run_experiment_with_restarts(exp, **kw)  # ckpt now exists
    assert len(res["attempts"]) == 1
    assert not os.path.exists(str(tmp_path / "r.retry1"))
    assert np.isfinite(res["rel_l2"])
    assert abs(res["rel_l2"] - first["rel_l2"]) < 0.05
