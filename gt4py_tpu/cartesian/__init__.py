"""Cartesian GTScript DSL (reference: gt4py.cartesian.__init__ exports
gtscript/backend/frontend/stencil_builder/stencil_object/StencilObject;
its `loader`/`caching`/`definitions` modules are collapsed here into
stencil_builder + artifact_cache, see PARITY.md §2.3/2.5)."""

from . import (  # noqa: F401
    analysis,
    artifact_cache,
    backend,
    frontend,
    gtscript,
    ir,
    stencil_builder,
    stencil_object,
    validation,
)
from .stencil_object import StencilObject  # noqa: F401

# reference-name aliases
from . import artifact_cache as caching  # noqa: F401
from gt4py_tpu import cache_manager as gt_cache_manager  # noqa: F401
from gt4py_tpu import config  # noqa: F401
