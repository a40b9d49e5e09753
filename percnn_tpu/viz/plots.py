"""Comparison panels and 3D isosurface export.

Replaces the reference's per-script postProcess functions (2x2 / 2x3
scatter-grid panels of prediction / truth / measurement / error,
percnn_LO_eqn.py:400-462, train_2drd.py:445-572) and the plotly isosurface
viewer (Plot3D.py:6-29).  Matplotlib/plotly imports are lazy so the compute
library never depends on them.
"""

from __future__ import annotations

import numpy as np


def comparison_panel(
    pred: np.ndarray,
    truth: np.ndarray,
    path: str,
    *,
    channel_names=("u", "v"),
    title: str = "",
):
    """Side-by-side pred / truth / |error| imshow panels for each channel.

    pred/truth: [H, W, C] single frames.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = pred.shape[-1]
    fig, axes = plt.subplots(C, 3, figsize=(10, 3 * C), squeeze=False)
    for c in range(C):
        vmin = min(pred[..., c].min(), truth[..., c].min())
        vmax = max(pred[..., c].max(), truth[..., c].max())
        for j, (field, name) in enumerate([
            (pred[..., c], f"{channel_names[c]} pred"),
            (truth[..., c], f"{channel_names[c]} truth"),
            (np.abs(pred[..., c] - truth[..., c]), f"{channel_names[c]} |err|"),
        ]):
            im = axes[c][j].imshow(field, cmap="jet",
                                   vmin=None if j == 2 else vmin,
                                   vmax=None if j == 2 else vmax)
            axes[c][j].set_title(name, fontsize=9)
            axes[c][j].axis("off")
            fig.colorbar(im, ax=axes[c][j], fraction=0.046)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def ic_panel(isg_out: np.ndarray, target: np.ndarray, path: str,
             low_res: np.ndarray | None = None):
    """ISG output vs interpolation target (reference plot_IC,
    rcnn_Burgers...py:489-578), optionally with the raw low-res noisy
    measurement as a third diagnostic column."""
    if low_res is None:
        comparison_panel(isg_out, target, path,
                         title="initial state: ISG vs interp")
        return
    measurement_panel(isg_out, target, low_res, path,
                      col_names=("ISG", "interp target", "measurement"),
                      title="initial state: ISG vs interp vs measurement")


def measurement_panel(
    pred: np.ndarray,
    truth: np.ndarray,
    meas_low: np.ndarray,
    path: str,
    *,
    channel_names=("u", "v"),
    col_names=("PeRCNN", "Ref.", "Meas."),
    vlims=None,
    title: str = "",
):
    """The reference's 2x3 postProcess panel WITH the noisy-measurement
    column (train_2drd.py:445-521 postProcess_2x3): per channel, columns
    prediction / clean truth / low-res measurement.  The measurement is
    nearest-upsampled (np.kron of ones, matching the reference) to the
    prediction's grid.

    pred/truth: [H, W, C]; meas_low: [h, w, C] (h <= H).
    vlims: optional per-channel (vmin, vmax) list (the reference pins
    u/v in [0, 1] for GS); None = shared min/max of pred+truth.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = pred.shape[-1]
    scale = max(1, pred.shape[0] // meas_low.shape[0])
    fig, axes = plt.subplots(C, 3, figsize=(11, 3.5 * C), squeeze=False)
    fig.subplots_adjust(hspace=0.25, wspace=0.25)
    for c in range(C):
        if vlims is not None:
            vmin, vmax = vlims[c]
        else:
            vmin = min(pred[..., c].min(), truth[..., c].min())
            vmax = max(pred[..., c].max(), truth[..., c].max())
        meas_up = np.kron(meas_low[..., c], np.ones((scale, scale)))
        for j, (field, name) in enumerate([
            (pred[..., c], f"{channel_names[c]} ({col_names[0]})"),
            (truth[..., c], f"{channel_names[c]} ({col_names[1]})"),
            (meas_up, f"{channel_names[c]} ({col_names[2]})"),
        ]):
            im = axes[c][j].imshow(field, cmap="hot", vmin=vmin, vmax=vmax)
            axes[c][j].set_title(name, fontsize=10)
            axes[c][j].set_xticks([])
            axes[c][j].set_yticks([])
            fig.colorbar(im, ax=axes[c][j], fraction=0.046, pad=0.04)
    if title:
        fig.suptitle(title)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def pareto_panel(
    gammas,
    ls_loss,
    l0_count,
    path: str,
    *,
    selected_gamma: float | None = None,
    eq: str = "u",
):
    """Pareto-front gamma-sweep figure — the reference's select_gamma_u.png
    (LO stage-2 PDE_FIND_u.py:297-335): regression error and L0 count on
    twin y-axes over a log-scale gamma axis, with the automated knee the
    pipeline selected marked (the reference picks gamma by eye from this
    plot; pareto_select picks the knee programmatically)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gammas = np.asarray(gammas, dtype=float)
    fig, ax1 = plt.subplots(figsize=(7.0, 4.5))
    fig.subplots_adjust(bottom=0.2)
    ax1.plot(gammas, np.asarray(ls_loss, dtype=float), marker="o",
             markersize=4, color="dodgerblue", label="regression error")
    ax1.set_xscale("log")
    ax1.set_xlabel(r"$\gamma$", fontsize=14)
    ax1.set_ylabel(r"$\|\Phi\,\Xi - Z\|_2$", color="dodgerblue", fontsize=13)
    ax1.tick_params(axis="y", colors="dodgerblue", direction="in")
    ax2 = ax1.twinx()
    ax2.plot(gammas, np.asarray(l0_count, dtype=float), marker="o",
             markersize=4, color="orangered", label=r"$\ell_0$ count")
    ax2.set_ylabel(r"$\|\Xi\|_0$", color="orangered", fontsize=13)
    ax2.tick_params(axis="y", colors="orangered", direction="in")
    if selected_gamma is not None:
        ax1.axvline(float(selected_gamma), color="gray", linestyle="--",
                    linewidth=1.2)
        ax1.annotate(f"knee $\\gamma$={float(selected_gamma):.3g}",
                     xy=(float(selected_gamma), max(np.asarray(ls_loss))),
                     fontsize=10, color="gray", ha="left")
    fig.suptitle(f"Stage-2 Pareto sweep ({eq}-equation)", fontsize=12)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def frame_series(
    frames: np.ndarray,
    truth: np.ndarray,
    out_dir: str,
    *,
    name: str = "uv_comparison",
    every: int | None = None,
    max_frames: int = 25,
    meas_low: np.ndarray | None = None,
):
    """Export the comparison panel for a stride of time steps — the
    reference's `for i in range(0, steps, 10): postProcess(...)` image
    series (percnn_LO_eqn.py:526-543, files uv_comparison_NNN.png).

    frames/truth: [T, H, W, C]; meas_low: optional [T_m, h, w, C] adds the
    measurement column for the nearest available measurement frame.
    Returns the written paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    T = min(frames.shape[0], truth.shape[0])
    if every is None:
        every = max(1, T // max_frames)
    paths = []
    for t in range(0, T, every):
        path = os.path.join(out_dir, f"{name}_{t:03d}.png")
        if meas_low is not None:
            tm = min(int(round(t / max(1, (T - 1)) * (meas_low.shape[0] - 1))),
                     meas_low.shape[0] - 1)
            measurement_panel(frames[t], truth[t], meas_low[tm], path,
                              title=f"t={t}")
        else:
            comparison_panel(frames[t], truth[t], path, title=f"t={t}")
        paths.append(path)
    return paths


def isosurface_pair(
    pred_vol: np.ndarray,
    truth_vol: np.ndarray,
    path_prefix: str,
    *,
    channel_names=("u", "v"),
    level_fracs=(0.5, 0.5),
):
    """u AND v isosurfaces for prediction and truth — the reference exports
    all four (Plot3D.py:6-29, Iso_surf_{u,v}_{PeRCNN,Truth}_N).

    pred_vol/truth_vol: [D, H, W, C].  Writes
    {path_prefix}.{u,v}.{pred,truth}.html (or .png montage fallback)."""
    paths = []
    for c, cname in enumerate(channel_names[: pred_vol.shape[-1]]):
        for vol, tag in ((pred_vol, "pred"), (truth_vol, "truth")):
            path = f"{path_prefix}.{cname}.{tag}.html"
            save_isosurface_html(vol[..., c], path,
                                 level_frac=level_fracs[c])
            paths.append(path)
    return paths


def save_isosurface_html(field: np.ndarray, path: str, *, level_frac: float = 0.5):
    """3D isosurface of a [D, H, W] scalar field (reference Plot3D.py uses
    plotly; fall back to a mid-slice montage if plotly is unavailable)."""
    try:
        import plotly.graph_objects as go

        d, h, w = field.shape
        X, Y, Z = np.mgrid[0:d, 0:h, 0:w]
        level = field.min() + level_frac * (field.max() - field.min())
        fig = go.Figure(go.Isosurface(
            x=X.ravel(), y=Y.ravel(), z=Z.ravel(), value=field.ravel(),
            isomin=level, isomax=level, surface_count=1, opacity=0.6,
        ))
        fig.write_html(path)
    except ImportError:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, (sl, name) in zip(axes, [
            (field[field.shape[0] // 2], "z-mid"),
            (field[:, field.shape[1] // 2], "y-mid"),
            (field[:, :, field.shape[2] // 2], "x-mid"),
        ]):
            ax.imshow(sl, cmap="jet")
            ax.set_title(name)
            ax.axis("off")
        fig.savefig(path.replace(".html", ".png"), dpi=150)
        plt.close(fig)
