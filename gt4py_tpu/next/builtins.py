"""Field-view builtins: where/broadcast/astype, neighbor reductions, math.

Reference: src/gt4py/next/ffront/fbuiltins.py (broadcast, astype, where,
neighbor_sum/max_over/min_over, math functions).
"""

from __future__ import annotations

from typing import Union

import numpy as np

import jax.numpy as jnp

from .common import Connectivity, Dimension, Domain, Field, UnitRange, _expand


def _merge_domains(*operands) -> Domain:
    """Union of dims (first-seen order), intersection of shared ranges."""
    fields = [f for f in operands if isinstance(f, Field)]
    dims = []
    for f in fields:
        for d in f.dims:
            if d not in dims:
                dims.append(d)
    ranges = []
    for d in dims:
        r = None
        for f in fields:
            if d in f.dims:
                r = f.domain[d] if r is None else r.intersect(f.domain[d])
        ranges.append(r)
    return Domain(tuple(dims), tuple(ranges))


def where(cond: Field, a, b) -> Field:
    dom = _merge_domains(cond, a, b)
    c = _expand(cond, dom)
    av = _expand(a, dom) if isinstance(a, Field) else a
    bv = _expand(b, dom) if isinstance(b, Field) else b
    return Field(dom, jnp.where(c, av, bv))


def broadcast(field: Union[Field, float, int], dims) -> Field:
    """Declare the broadcast dimensions of a field/scalar."""
    dims = tuple(dims)
    if not isinstance(field, Field):
        big = 1 << 30
        return Field(
            Domain(dims, tuple(UnitRange(-big, big) for _ in dims)),
            jnp.asarray(field).reshape((1,) * len(dims)),
        )
    # existing dims keep ranges, new dims get unbounded broadcast ranges
    big = 1 << 30
    ranges = tuple(
        field.domain[d] if d in field.dims else UnitRange(-big, big) for d in dims
    )
    dom = Domain(dims, ranges)
    shape = tuple(
        len(field.domain[d]) if d in field.dims else 1 for d in dims
    )
    src = {d: i for i, d in enumerate(field.dims)}
    perm = [src[d] for d in dims if d in src]
    data = jnp.transpose(field.data, perm)
    return Field(dom, data.reshape(shape))


def astype(field: Field, dtype) -> Field:
    if isinstance(field, Field):
        return Field(field.domain, field.data.astype(dtype))
    return np.dtype(dtype).type(field)


def _reduce(field: Field, conn_or_dim, op, init):
    if isinstance(conn_or_dim, Connectivity):
        dim = conn_or_dim.local_dim
        skip_table = conn_or_dim.table
    else:
        dim = conn_or_dim
        skip_table = None
    ax = field.dims.index(dim)
    data = field.data
    if skip_table is not None and conn_or_dim.skip_value is not None:
        src_ax = field.dims.index(conn_or_dim.source)
        mask = jnp.asarray(skip_table) != conn_or_dim.skip_value
        # restrict the (n_source, max_neighbors) mask to the field's actual
        # (possibly domain-intersected) source/local ranges
        src_r = field.domain[conn_or_dim.source]
        loc_r = field.domain[dim]
        mask = mask[src_r.start : src_r.stop, loc_r.start : loc_r.stop]
        full_mask_shape = [1] * data.ndim
        full_mask_shape[src_ax] = mask.shape[0]
        full_mask_shape[ax] = mask.shape[1]
        mask = mask.reshape(full_mask_shape)
        data = jnp.where(mask, data, init)
    reduced = op(data, axis=ax)
    dims = field.dims[:ax] + field.dims[ax + 1 :]
    ranges = field.domain.ranges[:ax] + field.domain.ranges[ax + 1 :]
    return Field(Domain(dims, ranges), reduced)


def neighbor_sum(field: Field, axis) -> Field:
    return _reduce(field, axis, jnp.sum, 0)


def max_over(field: Field, axis) -> Field:
    return _reduce(field, axis, jnp.max, -np.inf)


def min_over(field: Field, axis) -> Field:
    return _reduce(field, axis, jnp.min, np.inf)


def _unary(fn):
    def wrapped(x):
        if isinstance(x, Field):
            return Field(x.domain, fn(x.data))
        return fn(x)

    return wrapped


sqrt = _unary(jnp.sqrt)
exp = _unary(jnp.exp)
log = _unary(jnp.log)
sin = _unary(jnp.sin)
cos = _unary(jnp.cos)
tanh = _unary(jnp.tanh)


def maximum(a, b):
    if isinstance(a, Field):
        return a._binary(b, jnp.maximum)
    if isinstance(b, Field):
        return b._rbinary(a, jnp.maximum)
    return jnp.maximum(a, b)


def minimum(a, b):
    if isinstance(a, Field):
        return a._binary(b, jnp.minimum)
    if isinstance(b, Field):
        return b._rbinary(a, jnp.minimum)
    return jnp.minimum(a, b)
