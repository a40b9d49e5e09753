"""Generate golden rollout fixtures from the reference's committed .pt
checkpoints, for tests/test_pt_import.py.

Runs ONCE at fixture-generation time (requires torch + /root/reference);
the tests consume the committed .npz files and need neither.  Each fixture
stores: the mapped percnn_tpu params (via percnn_tpu.data.pt_import), a
deterministic smooth initial state, the torch-computed rollout frames, and
a torch-computed ISG forward — so the parity tests validate BOTH the
pure-Python .pt reader/mapper and the framework's cell/ISG numerics against
reference-trained weights.

Cell semantics reimplemented here from the reference spec (read-for-
behavior): one Euler step u+ = u + dt*(D_eff*Lap(u) + Wh4(Wh1*Wh2*Wh3))
with manual periodic pad for the 5-wide stencils (train_2drd.py:105-123;
rcnn_Burgers...py:143-180 pads the Pi input too since its branches are 5x5;
train_3drd.py:123-141; percnn_LO_eqn.py:96-113 uses raw DA/DB in f64).
"""

import numpy as np
import torch
import torch.nn.functional as F

from percnn_tpu.data.pt_import import load_pt, map_pi_state_dict

REF = "/root/reference"
OUT = "tests/golden"


def smooth_field(shape, seed, lo=0.1, hi=0.9):
    """Periodic-smooth deterministic field via low-mode Fourier synthesis."""
    rng = np.random.RandomState(seed)
    spatial = shape[:-1]
    out = np.zeros(shape, np.float64)
    for c in range(shape[-1]):
        spec = np.zeros(spatial, np.complex128)
        k = 3
        sl = tuple(slice(0, k) for _ in spatial)
        block = rng.randn(*([k] * len(spatial))) + 1j * rng.randn(*([k] * len(spatial)))
        spec[sl] = block
        f = np.fft.ifftn(spec).real
        f = (f - f.min()) / (f.max() - f.min())
        out[..., c] = lo + (hi - lo) * f
    return out.astype(np.float32)


def periodic_pad(h, w):
    """h: [1, C, *spatial]; wrap-pad by `w` cells on every spatial axis."""
    nd = h.ndim - 2
    return F.pad(h, (w, w) * nd, mode="circular")


def torch_pi_step(sd, h, *, dt, mu_up, pi_padded, diff_names=("CA", "CB"),
                  sigmoid=True):
    """One reference cell step. h: [1, 2, *spatial] torch tensor."""
    nd = h.ndim - 2
    conv = F.conv3d if nd == 3 else F.conv2d
    t = lambda k: torch.as_tensor(sd[k])  # noqa: E731
    hp = periodic_pad(h, 2)
    res = []
    for ci, (cn, dn) in enumerate(zip(("u", "v"), diff_names)):
        d = t(f"crnn_cell.{dn}").reshape(())
        deff = mu_up * torch.sigmoid(d) if sigmoid else d
        lap = conv(hp[:, ci:ci + 1], t("crnn_cell.W_laplace.weight").to(h.dtype))
        pi_in = hp if pi_padded else h
        prod = None
        for i in (1, 2, 3):
            y = conv(pi_in, t(f"crnn_cell.Wh{i}_{cn}.weight").to(h.dtype),
                     t(f"crnn_cell.Wh{i}_{cn}.bias").to(h.dtype))
            prod = y if prod is None else prod * y
        nonlin = conv(prod, t(f"crnn_cell.Wh4_{cn}.weight").to(h.dtype),
                      t(f"crnn_cell.Wh4_{cn}.bias").to(h.dtype))
        res.append(deff.to(h.dtype) * lap + nonlin)
    return h + dt * torch.cat(res, dim=1)


def torch_isg(sd, x, *, two_stage, act):
    """Reference upscaler forward. x: [1, 2, *spatial]."""
    nd = x.ndim - 2
    convt = F.conv_transpose3d if nd == 3 else F.conv_transpose2d
    conv = F.conv3d if nd == 3 else F.conv2d
    t = lambda k: torch.as_tensor(sd[k]).to(x.dtype)  # noqa: E731
    if two_stage:  # GS Sequential style (train_2drd.py:26-41 / train_3drd.py:41-56)
        y = convt(x, t("UpconvBlock.convnet.0.weight"), t("UpconvBlock.convnet.0.bias"),
                  stride=2, padding=2, output_padding=1)
        y = torch.sigmoid(y)
        stride2 = 2 if nd == 2 else 1   # 3D second stage is stride-1 (train_3drd.py:49-51)
        y = convt(y, t("UpconvBlock.convnet.2.weight"), t("UpconvBlock.convnet.2.bias"),
                  stride=stride2, padding=2, output_padding=stride2 - 1)
        return conv(y, t("UpconvBlock.convnet.3.weight"), t("UpconvBlock.convnet.3.bias"))
    # Burgers/LO named style (rcnn_Burgers...py:38-52)
    y = convt(x, t("UpconvBlock.up0.weight"), t("UpconvBlock.up0.bias"),
              stride=2, padding=2, output_padding=1)
    y = torch.tanh(y) if act == "tanh" else torch.sigmoid(y)
    return conv(y, t("UpconvBlock.out.weight"), t("UpconvBlock.out.bias"))


def chlast(x):
    """[1, C, *spatial] torch -> [*spatial, C] numpy."""
    return np.moveaxis(x.detach().numpy()[0], 0, -1)


def flatten_params(prefix, tree, out):
    if tree is None:
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            flatten_params(f"{prefix}{k}.", v, out)
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            flatten_params(f"{prefix}{i}.", v, out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def make(name, ckpt, *, dt, dx, mu_up, pi_padded, sigmoid, n_steps, grid,
         isg_two_stage=None, isg_act=None, isg_in=None, dtype=torch.float32,
         diff_names=("CA", "CB")):
    raw = load_pt(ckpt)
    sd = raw["model_state_dict"] if "model_state_dict" in raw else raw
    cell, isg = map_pi_state_dict(sd, diff_names=diff_names)

    h = torch.as_tensor(
        np.moveaxis(smooth_field(grid + (2,), seed=7), -1, 0)[None]).to(dtype)
    frames = [chlast(h)]
    for _ in range(n_steps):
        h = torch_pi_step(sd, h, dt=dt, mu_up=mu_up, pi_padded=pi_padded,
                          sigmoid=sigmoid, diff_names=diff_names)
        frames.append(chlast(h))

    data = {"frames": np.stack(frames), "dt": dt, "dx": dx, "mu_up": mu_up}
    flatten_params("cell.", cell, data)
    if isg is not None and isg_in is not None:
        x = torch.as_tensor(np.moveaxis(smooth_field(isg_in + (2,), 11), -1, 0)[None]).to(dtype)
        data["isg_in"] = chlast(x)
        data["isg_out"] = chlast(torch_isg(sd, x, two_stage=isg_two_stage, act=isg_act))
        flatten_params("isg.", isg, data)
    path = f"{OUT}/{name}.npz"
    np.savez_compressed(path, **data)
    print(f"{path}: frames {data['frames'].shape}, |last|max "
          f"{np.abs(data['frames'][-1]).max():.4f}")


if __name__ == "__main__":
    import os
    os.makedirs(OUT, exist_ok=True)
    make("pt_gs2d", f"{REF}/DataDrivenModeling/2d_gs_rd/model/checkpoint.pt",
         dt=0.5, dx=0.01, mu_up=3.99e-5, pi_padded=False, sigmoid=True, n_steps=8,
         grid=(64, 64), isg_two_stage=True, isg_in=(16, 16))
    make("pt_burgers_s1",
         f"{REF}/DataDrivenDiscoveryOfPDEs/2D_Burgers_eqn/Stage-1/model/checkpoint.pt",
         dt=0.00025, dx=0.01, mu_up=0.01, pi_padded=True, sigmoid=True, n_steps=8,
         grid=(64, 64), isg_two_stage=False, isg_act="tanh", isg_in=(32, 32))
    make("pt_gs3d", f"{REF}/DataDrivenModeling/3d_gs_rd/model/checkpoint.pt",
         dt=0.5, dx=100/48, mu_up=0.274, pi_padded=False, sigmoid=True, n_steps=6,
         grid=(24, 24, 24), isg_two_stage=True, isg_in=(12, 12, 12))
    make("pt_lo_forward",
         f"{REF}/ForwardSimulationOfPDEs/2d_lambda_omega/model/rcnn_pde.pt",
         dt=0.0125, dx=0.2, mu_up=1.0, pi_padded=False, sigmoid=False, n_steps=8,
         grid=(64, 64), diff_names=("DA", "DB"), dtype=torch.float64)
