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


def ic_panel(isg_out: np.ndarray, target: np.ndarray, path: str):
    """ISG output vs interpolation target (reference plot_IC)."""
    comparison_panel(isg_out, target, path, title="initial state: ISG vs interp")


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
