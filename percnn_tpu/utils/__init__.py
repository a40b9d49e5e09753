"""Shared utilities: metrics logging, parameter counting, timing."""

from percnn_tpu.utils.metrics import MetricsLogger, rel_l2
from percnn_tpu.utils.params import count_parameters, summary_parameters
