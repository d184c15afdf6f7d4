"""Distributed execution for the field-view DSL (GSPMD path).

The reference is single-process (SURVEY.md §2.7: no distributed code
anywhere under src/); this layer is net-new, mirroring what
``gt4py_tpu.parallel`` provides for cartesian stencils.

TPU-first design: a ``next.Field``'s data is a jax array, so distribution
is *sharding*, not new execution machinery.  ``distribute`` places the
data with a ``NamedSharding`` mapping field dimensions onto device-mesh
axes; field operators staged under ``jax.jit`` (the ``jax_jit`` backend
or any jit-wrapped composition) then run SPMD — XLA partitions the
pointwise work and inserts halo collective-permutes over ICI for the
domain-shift offsets automatically.  The vertical (K) dimension stays
on-chip (scans need the full column; the reference never splits K
either — SURVEY.md §5 "long-context analog").

Usage::

    from gt4py_tpu.parallel import CartesianMesh
    from gt4py_tpu.next import distributed as nxd

    cmesh = CartesianMesh((2, 4))
    f = nxd.distribute(f, cmesh, {I: "x", J: "y"})
    out = jax.jit(lambda f: lap(f))(f)      # SPMD; halos via ppermute
    nxd.gather(out)                          # numpy-backed global Field

Sharded unstructured remaps (gathers through a Connectivity) are
all-to-all under GSPMD; keep connectivity tables replicated and shard
only the dense horizontal dimension.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .common import Dimension, DimensionKind, Field


def _jax_mesh(mesh):
    """Accept a parallel.CartesianMesh or a raw jax Mesh."""
    return getattr(mesh, "mesh", mesh)


def infer_dim_map(field: Field, mesh) -> Dict[Dimension, str]:
    """Default dimension→mesh-axis mapping: horizontal field dims are
    assigned to mesh axes in order; vertical/local dims stay on-chip."""
    jmesh = _jax_mesh(mesh)
    axes = list(jmesh.axis_names)
    out: Dict[Dimension, str] = {}
    for d in field.dims:
        if d.kind == DimensionKind.HORIZONTAL and axes:
            out[d] = axes.pop(0)
    return out


def field_sharding(field: Field, mesh, dim_map: Optional[Dict[Dimension, str]] = None):
    """NamedSharding for ``field`` with ``dim_map`` dims sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    jmesh = _jax_mesh(mesh)
    if dim_map is None:
        dim_map = infer_dim_map(field, mesh)
    for d, ax in dim_map.items():
        if d not in field.dims:
            raise ValueError(f"dim_map names {d.value}, not a field dimension")
        if ax not in jmesh.axis_names:
            raise ValueError(f"dim_map maps {d.value} to unknown mesh axis {ax!r}")
        if d.kind == DimensionKind.VERTICAL:
            raise ValueError(
                f"refusing to shard vertical dimension {d.value}: serial-K "
                "scans need the full column on-chip (keep K local)"
            )
        n = jmesh.shape[ax]
        if len(field.domain[d]) % n:
            raise ValueError(
                f"dimension {d.value} (size {len(field.domain[d])}) does not "
                f"divide evenly over mesh axis {ax!r} ({n} devices)"
            )
    spec = P(*(dim_map.get(d) for d in field.dims))
    return NamedSharding(jmesh, spec)


def distribute(
    field: Field,
    mesh,
    dim_map: Optional[Dict[Dimension, str]] = None,
) -> Field:
    """Shard a field's data over the device mesh (global view: the domain
    is unchanged; only placement changes)."""
    import jax

    sharding = field_sharding(field, mesh, dim_map)
    return Field(field.domain, jax.device_put(field.data, sharding))


def replicate(value, mesh):
    """Place a Field (or a Connectivity's table) fully replicated on every
    device of the mesh — the right placement for neighbor tables and
    boundary masks."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .common import Connectivity

    sharding = NamedSharding(_jax_mesh(mesh), P())
    if isinstance(value, Connectivity):
        import jax.numpy as jnp

        return Connectivity(
            jax.device_put(jnp.asarray(value.table), sharding),
            source=value.source,
            codomain=value.codomain,
            local_dim=value.local_dim,
            skip_value=value.skip_value,
        )
    return Field(value.domain, jax.device_put(value.data, sharding))


def gather(field: Field) -> Field:
    """Fetch a (possibly sharded) field fully to host as a numpy-backed
    Field (oracle-compatible)."""
    return Field(field.domain, np.asarray(field.data))


def sharding_of(field: Field):
    """The jax sharding of the field's data (None for numpy-backed)."""
    return getattr(field.data, "sharding", None)
