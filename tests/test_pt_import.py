"""Reference .pt checkpoint import: reader correctness + rollout parity.

Two layers of validation:
- golden tests (always run): committed fixtures in tests/golden/ hold
  reference-trained weights (mapped via pt_import) plus torch-computed
  rollout/ISG outputs; the framework's cell/ISG must reproduce them.
- reader tests (run when /root/reference + torch are available): the
  pure-Python .pt reader must agree tensor-for-tensor with torch.load,
  and the mapped params must match the committed fixtures.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from percnn_tpu.core.cell import PiCellConfig, pi_cell_step
from percnn_tpu.core.isg import ISGConfig, isg_apply

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
REF = "/root/reference"

CKPTS = {
    "pt_gs2d": f"{REF}/DataDrivenModeling/2d_gs_rd/model/checkpoint.pt",
    "pt_burgers_s1": f"{REF}/DataDrivenDiscoveryOfPDEs/2D_Burgers_eqn/Stage-1/model/checkpoint.pt",
    "pt_gs3d": f"{REF}/DataDrivenModeling/3d_gs_rd/model/checkpoint.pt",
    "pt_lo_forward": f"{REF}/ForwardSimulationOfPDEs/2d_lambda_omega/model/rcnn_pde.pt",
}

CELL_CFGS = {
    "pt_gs2d": PiCellConfig(ndim=2, hidden=8, kernel_size=1, dt=0.5, dx=0.01,
                            diffusion="sigmoid", mu_up=3.99e-5),
    "pt_burgers_s1": PiCellConfig(ndim=2, hidden=16, kernel_size=5, dt=0.00025,
                                  dx=0.01, diffusion="sigmoid", mu_up=0.01),
    "pt_gs3d": PiCellConfig(ndim=3, hidden=2, kernel_size=1, dt=0.5, dx=100 / 48,
                            diffusion="sigmoid", mu_up=0.274),
    "pt_lo_forward": PiCellConfig(ndim=2, hidden=4, kernel_size=1, dt=0.0125,
                                  dx=0.2, diffusion="raw"),
}

ISG_CFGS = {
    "pt_gs2d": ISGConfig(ndim=2, hidden=8, strides=(2, 2), activation="sigmoid"),
    "pt_burgers_s1": ISGConfig(ndim=2, hidden=16, strides=(2,), activation="tanh"),
    "pt_gs3d": ISGConfig(ndim=3, hidden=8, strides=(2, 1), activation="sigmoid"),
}


def unflatten(npz, prefix):
    """Rebuild the {'diff','pi':[{...}]} / isg param pytrees from npz keys."""
    keys = [k for k in npz.files if k.startswith(prefix)]
    if not keys:
        return None
    tree: dict = {}
    for k in keys:
        parts = k[len(prefix):].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[k])

    def listify(node):
        if isinstance(node, dict):
            if node and all(p.isdigit() for p in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


@pytest.mark.parametrize("name", list(CELL_CFGS))
def test_golden_rollout_parity(name):
    """Mapped reference weights roll out identically to the torch model."""
    npz = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    cfg = CELL_CFGS[name]
    params = unflatten(npz, "cell.")
    frames = npz["frames"]
    h = jnp.asarray(frames[0])
    tol = 5e-10 if frames.dtype == np.float64 else 2e-5
    for t in range(1, frames.shape[0]):
        h = pi_cell_step(params, h, cfg)
        err = np.abs(np.asarray(h) - frames[t]).max()
        assert err < tol * t, f"{name} step {t}: max |diff| {err}"


@pytest.mark.parametrize("name", list(ISG_CFGS))
def test_golden_isg_parity(name):
    """Mapped reference ISG weights reproduce torch ConvTranspose output."""
    npz = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    params = unflatten(npz, "isg.")
    out = isg_apply(params, jnp.asarray(npz["isg_in"]), ISG_CFGS[name])
    np.testing.assert_allclose(np.asarray(out), npz["isg_out"],
                               atol=2e-6, rtol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
@pytest.mark.parametrize("name", list(CKPTS))
def test_mapper_matches_golden(name):
    """pt_import on the live reference checkpoint == committed fixture."""
    from percnn_tpu.data.pt_import import import_reference_checkpoint

    cell, isg, _ = import_reference_checkpoint(CKPTS[name])
    npz = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    want_cell = unflatten(npz, "cell.")
    np.testing.assert_array_equal(np.asarray(cell["diff"], np.float32),
                                  np.asarray(want_cell["diff"], np.float32))
    for c in range(2):
        for k, v in want_cell["pi"][c].items():
            np.testing.assert_array_equal(
                np.asarray(cell["pi"][c][k], np.float32),
                np.asarray(v, np.float32), err_msg=f"{name} pi[{c}].{k}")
    want_isg = unflatten(npz, "isg.")
    if want_isg is not None:
        for k, v in want_isg.items():
            np.testing.assert_array_equal(np.asarray(isg[k]), np.asarray(v),
                                          err_msg=f"{name} isg.{k}")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_reader_matches_torch():
    """Pure-Python legacy-format reader == torch.load, tensor for tensor."""
    torch = pytest.importorskip("torch")
    from percnn_tpu.data.pt_import import load_pt

    for name, path in CKPTS.items():
        ours = load_pt(path)
        ref = torch.load(path, map_location="cpu", weights_only=False)
        sd_ours = ours.get("model_state_dict", ours)
        sd_ref = ref["model_state_dict"] if "model_state_dict" in ref else ref
        assert set(sd_ours) == set(sd_ref), name
        for k in sd_ref:
            np.testing.assert_array_equal(
                sd_ours[k], sd_ref[k].detach().numpy(), err_msg=f"{name}:{k}")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_symbolic_checkpoint_import():
    """Stage-3 symbolic checkpoint maps to {'nu','coef'} + named ISG."""
    from percnn_tpu.data.pt_import import import_reference_checkpoint

    path = f"{REF}/DataDrivenDiscoveryOfPDEs/2D_Burgers_eqn/Stage-3/model/checkpoint.pt"
    params, isg, _ = import_reference_checkpoint(path)
    assert params["nu"].shape == (2,)
    assert len(params["coef"]) == 2 and params["coef"][0].shape == (4,)
    assert isg is not None and isg["up0_w"].shape == (5, 5, 2, 16)
    # fine-tuned Burgers: nu ~ 0.005 (fine_tuning_[5%noise...].py:988-990)
    assert 1e-3 < float(params["nu"][0]) < 1e-2


def test_golden_wlaplace_matches_stencil():
    """The checkpoints' frozen W_laplace is the same 4th-order cross stencil
    the framework applies as a roll-sum (sanity linking the two worlds)."""
    from percnn_tpu.ops.stencils import laplacian

    npz = np.load(os.path.join(GOLDEN, "pt_gs2d.npz"))
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(16, 16, 1).astype(np.float32))
    # apply our laplacian and a brute-force periodic correlation of the
    # reference stencil; they must agree (dx=0.01 baked into W_laplace)
    ours = laplacian(f, 0.01, axes=(0, 1))
    if os.path.isdir(REF):
        from percnn_tpu.data.pt_import import load_pt
        w = load_pt(CKPTS["pt_gs2d"])["model_state_dict"]["crnn_cell.W_laplace.weight"][0, 0]
        fp = np.pad(np.asarray(f)[..., 0], 2, mode="wrap")
        want = np.zeros((16, 16), np.float32)
        for i in range(5):
            for j in range(5):
                want += w[i, j] * fp[i:i + 16, j:j + 16]
        np.testing.assert_allclose(np.asarray(ours)[..., 0], want,
                                   rtol=1e-4, atol=2e-4)


def test_bf16_checkpoint_decodes_to_f32():
    """BFloat16Storage tensors decode to their exact float32 values instead
    of leaking raw uint16 bit patterns (a silent-garbage footgun)."""
    torch = pytest.importorskip("torch")
    from percnn_tpu.data.pt_import import load_pt

    vals = torch.tensor([1.5, -2.25, 3.0e-3, 0.0], dtype=torch.bfloat16)
    obj = {"w": vals, "x": torch.tensor([1.0, 2.0])}
    for legacy in (True, False):
        path = f"/tmp/pt_import_bf16_{legacy}.pt"
        torch.save(obj, path, _use_new_zipfile_serialization=not legacy)
        got = load_pt(path)
        assert got["w"].dtype == np.float32
        np.testing.assert_array_equal(
            got["w"], vals.to(torch.float32).numpy())
        np.testing.assert_array_equal(got["x"], [1.0, 2.0])


def test_adam_state_import_continues_torch_trajectory():
    """map_adam_moments: torch Adam moments land in the right optax leaves
    (layout-transposed) and one further optax step reproduces one further
    torch step exactly (same bias correction, same update rule).

    Mirrors the reference's resume path, which reloads
    ``optimizer_state_dict`` alongside the weights (train_2drd.py:432-439).
    """
    torch = pytest.importorskip("torch")
    import jax
    import optax
    from percnn_tpu.data.pt_import import load_pt, map_adam_moments, \
        map_pi_state_dict

    torch.manual_seed(0)
    C = 3

    class Cell(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.CA = torch.nn.Parameter(torch.tensor(0.3))
            self.CB = torch.nn.Parameter(torch.tensor(-0.2))
            for cn in ("u", "v"):
                for i in (1, 2, 3):
                    setattr(self, f"Wh{i}_{cn}", torch.nn.Conv2d(2, C, 1))
                setattr(self, f"Wh4_{cn}", torch.nn.Conv2d(C, 1, 1))

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.crnn_cell = Cell()

    model = Model()
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    # a loss with grad == param puts distinct, known moments everywhere
    for _ in range(5):
        opt.zero_grad()
        loss = sum(0.5 * (p ** 2).sum() for p in model.parameters())
        loss.backward()
        opt.step()
    path = "/tmp/pt_import_adam.pt"
    torch.save({"model_state_dict": model.state_dict(),
                "optimizer_state_dict": opt.state_dict()}, path)

    raw = load_pt(path)
    cell, isg = map_pi_state_dict(raw["model_state_dict"])
    moments = map_adam_moments(raw)
    assert moments is not None and moments["count"] == 5
    mu_cell, mu_isg = moments["mu"]
    assert mu_isg is None and isg is None
    # spot-check a mapped moment leaf against torch's exp_avg
    idx = list(raw["model_state_dict"].keys()).index("crnn_cell.Wh1_u.weight")
    exp_avg = opt.state_dict()["state"][idx]["exp_avg"].numpy()
    np.testing.assert_allclose(mu_cell["pi"][0]["w0"],
                               exp_avg[:, :, 0, 0].T, rtol=1e-6)

    # continue: one more torch step vs one more optax step on the same loss
    opt.zero_grad()
    loss = sum(0.5 * (p ** 2).sum() for p in model.parameters())
    loss.backward()
    opt.step()
    want_cell, _ = map_pi_state_dict(
        {k: v.detach().numpy() for k, v in model.state_dict().items()})

    tx = optax.scale_by_adam()
    params = jax.tree_util.tree_map(jnp.asarray, cell)
    state = optax.ScaleByAdamState(
        count=jnp.asarray(moments["count"], jnp.int32),
        mu=jax.tree_util.tree_map(jnp.asarray, mu_cell),
        nu=jax.tree_util.tree_map(jnp.asarray, moments["nu"][0]))
    updates, _ = tx.update(params, state, params)  # grad == param
    got = jax.tree_util.tree_map(lambda p, u: p - 1e-2 * u, params, updates)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        got, want_cell)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_adam_state_import_dedupes_aliased_params():
    """Burgers Stage-1's UpconvBlock registers its convs twice (named
    members + a Sequential over the same modules, rcnn_Burgers...py:38-52),
    so the 27-entry state dict has only 23 unique parameters and torch's
    optimizer indices run over the deduped list.  Check the moments land on
    the right leaves via the storage-identity dedup."""
    from percnn_tpu.data.pt_import import load_pt, map_adam_moments

    raw = load_pt(CKPTS["pt_burgers_s1"])
    m = map_adam_moments(raw)
    assert m is not None and m["count"] == 29922
    st = raw["optimizer_state_dict"]["state"]
    mu_cell, mu_isg = m["mu"]
    # optimizer position 7 (post-dedup) = crnn_cell.Wh1_u.weight, k=5 conv
    np.testing.assert_array_equal(
        mu_cell["pi"][0]["w0"],
        np.transpose(np.asarray(st[7]["exp_avg"]), (2, 3, 1, 0)))
    # position 4/5 = the CA/CB diffusion scalars
    np.testing.assert_array_equal(
        mu_cell["diff"],
        np.stack([np.asarray(st[4]["exp_avg"]).reshape(()),
                  np.asarray(st[5]["exp_avg"]).reshape(())]))
    # position 0 = up0.weight (also aliased as convnet.0.weight)
    np.testing.assert_array_equal(
        mu_isg["up0_w"],
        np.transpose(np.asarray(st[0]["exp_avg"]), (2, 3, 0, 1)))
