"""Backend feature matrix for test parametrization.

Reference parity: the test-exclusion matrices of
tests/next_tests/definitions.py:92-120 (per-backend skip/xfail keyed on
feature markers, ADR 0015).  Here every backend supports every feature --
unsupported patterns fall back to the XLA executor transparently -- so the
matrix records *native* support (which execution path handles the feature
in-kernel) and tests use it to assert fallbacks stay correct.
"""

from __future__ import annotations

import enum
from typing import Dict, Set


class Feature(enum.Enum):
    USES_SCAN = "scan"
    USES_VARIABLE_K_OFFSET = "variable_k"
    USES_ABSOLUTE_K = "absolute_k"
    USES_DATA_DIMS = "data_dims"
    USES_REGIONS = "regions"
    USES_WHILE = "while"
    USES_LOWER_DIM_FIELDS = "lower_dim"


#: features each backend handles natively (everything else still runs,
#: through the jax fallback path)
NATIVE_SUPPORT: Dict[str, Set[Feature]] = {
    "numpy": set(Feature),
    "jax": set(Feature),
    "pallas": {
        Feature.USES_SCAN,
        Feature.USES_VARIABLE_K_OFFSET,
        Feature.USES_ABSOLUTE_K,
        # data-dims fields run as per-component kernels (passes.
        # split_data_dims); per-point dynamic indices expand to
        # component selects / masked per-component writes in-kernel
        Feature.USES_DATA_DIMS,
        Feature.USES_REGIONS,
        Feature.USES_WHILE,
        Feature.USES_LOWER_DIM_FIELDS,
    },
}


def runs_natively(backend: str, features: Set[Feature]) -> bool:
    return features <= NATIVE_SUPPORT.get(backend, set())
