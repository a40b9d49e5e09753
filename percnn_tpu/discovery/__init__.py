"""Stage-2/3 PDE discovery: candidate library, STRidge sparse regression,
Pareto analysis, and symbolic extraction of the learned Pi polynomial."""

from percnn_tpu.discovery.library import build_design_matrix
from percnn_tpu.discovery.stridge import STRidge, discovery_metrics, pareto_sweep
from percnn_tpu.discovery.symbolic import pi_block_expression
