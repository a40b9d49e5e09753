"""Post-processing & visualisation (reference postProcess* / Plot3D)."""

from percnn_tpu.viz.plots import comparison_panel, ic_panel, save_isosurface_html
