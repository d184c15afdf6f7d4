"""Dynamical-core workloads built on the stencil DSL (the "model zoo").

These are the framework's flagship models: the BASELINE workloads
(horizontal diffusion, vertical advection with tridiagonal solves,
finite-volume advection, semi-Lagrangian transport, spectral transforms)
written in GTScript on top of gt4py_tpu, each with a numpy-oracle path
for validation.
"""

from .dycore import MiniDycore  # noqa: F401
from .shallow_water import ShallowWater  # noqa: F401
from .fv_advection import FvAdvection  # noqa: F401
from .semi_lagrangian import semi_lagrangian_step  # noqa: F401
from .spectral import poisson_solve, spectral_filter  # noqa: F401
