"""Field/connectivity constructors.

Reference: src/gt4py/next/constructors.py:394-690 (empty/zeros/ones/full/
as_field/as_connectivity with allocator/device arguments -- collapsed to
jax device arrays here).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

from .common import Connectivity, Dimension, Domain, Field, UnitRange, domain_like

import jax.numpy as jnp


DomainLike = Union[Domain, dict, Sequence[Tuple[Dimension, int]]]

_as_domain = domain_like


def _ns(allocator):
    """Array namespace for an allocator spec: "numpy" builds numpy-backed
    fields (the embedded oracle), anything else jax (the product path)."""
    return np if allocator == "numpy" else jnp


def empty(domain: DomainLike, dtype=np.float64, *, allocator=None) -> Field:
    dom = _as_domain(domain)
    return Field(dom, _ns(allocator).zeros(dom.shape, dtype=dtype))


def zeros(domain: DomainLike, dtype=np.float64, *, allocator=None) -> Field:
    dom = _as_domain(domain)
    return Field(dom, _ns(allocator).zeros(dom.shape, dtype=dtype))


def ones(domain: DomainLike, dtype=np.float64, *, allocator=None) -> Field:
    dom = _as_domain(domain)
    return Field(dom, _ns(allocator).ones(dom.shape, dtype=dtype))


def full(domain: DomainLike, fill_value, dtype=np.float64, *, allocator=None) -> Field:
    dom = _as_domain(domain)
    return Field(dom, _ns(allocator).full(dom.shape, fill_value, dtype=dtype))


def as_field(
    dims_or_domain, data, *, origin: Optional[dict] = None, allocator=None
) -> Field:
    """Wrap an array as a Field.

    ``as_field((I, J), array)`` gives ranges starting at 0 (or at
    ``-origin[dim]`` when origins are passed, mirroring the reference's
    origin semantics).  ``allocator="numpy"`` keeps the data as a numpy
    array: the field then runs on the embedded numpy oracle.
    """
    data = np.asarray(data) if allocator == "numpy" else jnp.asarray(data)
    if isinstance(dims_or_domain, Domain):
        return Field(dims_or_domain, data)
    dims = tuple(dims_or_domain)
    origin = origin or {}
    ranges = []
    for d, size in zip(dims, data.shape):
        o = int(origin.get(d, 0))
        ranges.append(UnitRange(-o, size - o))
    return Field(Domain(dims, tuple(ranges)), data)


def as_connectivity(
    table,
    *,
    source: Dimension,
    codomain: Dimension,
    local_dim: Optional[Dimension] = None,
    skip_value: Optional[int] = -1,
    allocator=None,
) -> Connectivity:
    from .common import DimensionKind

    table = np.asarray(table, dtype=np.int32)
    if allocator != "numpy":
        table = jnp.asarray(table)
    if local_dim is None:
        local_dim = Dimension(
            f"{source.value}2{codomain.value}", DimensionKind.LOCAL
        )
    return Connectivity(
        table=table,
        source=source,
        codomain=codomain,
        local_dim=local_dim,
        skip_value=skip_value,
    )
