"""Global-view distributed fields (GSPMD path).

Fields stay logically global; ``distribute`` shards them over the mesh with
``NamedSharding(P("x", "y", None))``.  Stencil programs applied under
``jax.jit`` then run SPMD: XLA partitions the whole-domain slice operations
and inserts halo collective-permutes over ICI automatically.  This is the
zero-boilerplate counterpart of the explicit ``shard_map`` path in halo.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gt4py_tpu.storage import FieldStorage


def distribute(cmesh, array):
    """Shard a global (I, J, ...) array over the mesh; returns a jax array."""
    import jax

    arr = array.data if isinstance(array, FieldStorage) else array
    return jax.device_put(arr, cmesh.field_sharding(np.ndim(arr)))


def gather(array) -> np.ndarray:
    """Fetch a (possibly sharded) array fully to host."""
    return np.asarray(array.data if isinstance(array, FieldStorage) else array)


class DistributedField(FieldStorage):
    """A FieldStorage whose data is sharded over a CartesianMesh."""

    def __init__(self, cmesh, data, origin, dims=("I", "J", "K")):
        super().__init__(distribute(cmesh, data), origin, dims, backend="jax")
        self.cmesh = cmesh

    @classmethod
    def zeros(cls, cmesh, shape, dtype=np.float32, *, origin=None):
        import jax.numpy as jnp

        origin = origin or (0,) * len(shape)
        return cls(cmesh, jnp.zeros(shape, dtype=dtype), origin)

    @classmethod
    def from_array(cls, cmesh, array, *, origin=None):
        origin = origin or (0,) * np.asarray(array).ndim
        return cls(cmesh, np.asarray(array), origin)
