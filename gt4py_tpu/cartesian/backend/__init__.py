"""Backend registry (reference: src/gt4py/cartesian/backend/base.py:35-152).

Backends here are *executors* over the analyzed IR rather than source-code
generators: the numpy oracle interprets with origin-shifted slicing; the
jax/pallas executors trace the same IR into XLA programs (tracing under
``jax.jit`` makes interpretation free at runtime).
"""

from __future__ import annotations

from typing import Callable, Dict

REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def _reg(cls):
        REGISTRY[name] = cls
        cls.name = name
        return cls

    return _reg


def from_name(name: str):
    if name not in REGISTRY:
        raise ValueError(
            f"Unknown backend '{name}'. Available: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]


from . import numpy_backend  # noqa: E402,F401
from . import debug_backend  # noqa: E402,F401

try:  # jax backends are optional at import time
    from . import jax_backend  # noqa: E402,F401
except ImportError:  # pragma: no cover
    pass

try:
    from . import pallas_backend  # noqa: E402,F401
except ImportError:  # pragma: no cover
    pass
