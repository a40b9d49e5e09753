"""Governing-PDE definitions: right-hand sides, physics residuals, term
registry for the symbolic cell and the discovery library."""

from percnn_tpu.pde.systems import PDE_SYSTEMS, PDESystem
from percnn_tpu.pde.terms import TERM_REGISTRY, eval_grads, gen_library
