"""Datasets: finite-difference ground-truth generators (the reference ships
its data only via Google Drive — readme4data.txt — so the framework generates
its own), measurement noise, downsampling, and .mat/.npz I/O."""

from percnn_tpu.data.simulate import simulate, default_ic
from percnn_tpu.data.noise import add_noise
from percnn_tpu.data.pt_import import load_pt, import_reference_checkpoint
