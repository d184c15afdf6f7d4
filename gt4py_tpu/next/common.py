"""Core field-view vocabulary: dimensions, ranges, domains, fields.

Reference: src/gt4py/next/common.py (Dimension :66-112, UnitRange :197,
Domain :433, Field protocol :749, Connectivity :964-1122) and the jax
namespace registration in embedded/nd_array_field.py:1055-1091.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

from gt4py_tpu import config

config.ensure_jax_config()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class DimensionKind(enum.Enum):
    HORIZONTAL = "horizontal"
    VERTICAL = "vertical"
    LOCAL = "local"


@dataclasses.dataclass(frozen=True)
class Dimension:
    value: str
    kind: DimensionKind = DimensionKind.HORIZONTAL

    def __str__(self):
        return self.value


@dataclasses.dataclass(frozen=True)
class UnitRange:
    """Half-open integer range [start, stop)."""

    start: int
    stop: int

    def __len__(self):
        return max(self.stop - self.start, 0)

    def intersect(self, other: "UnitRange") -> "UnitRange":
        return UnitRange(max(self.start, other.start), min(self.stop, other.stop))

    def shift(self, offset: int) -> "UnitRange":
        return UnitRange(self.start + offset, self.stop + offset)


@dataclasses.dataclass(frozen=True)
class Domain:
    """An ordered product of named ranges."""

    dims: Tuple[Dimension, ...]
    ranges: Tuple[UnitRange, ...]

    @classmethod
    def from_sizes(cls, **sizes: int) -> "Domain":
        dims = tuple(Dimension(k) for k in sizes)
        return cls(dims, tuple(UnitRange(0, v) for v in sizes.values()))

    def __getitem__(self, dim: Dimension) -> UnitRange:
        return self.ranges[self.dims.index(dim)]

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(len(r) for r in self.ranges)

    def __iter__(self):
        return iter(zip(self.dims, self.ranges))


@dataclasses.dataclass(frozen=True)
class FieldOffset:
    """A named shift along a dimension: ``f(Ioff[1])`` evaluates f at i+1.

    For unstructured meshes the offset names a Connectivity in the
    offset-provider mapping instead (reference: common.py offset-provider
    utilities :1181-1216).
    """

    value: str
    source: Dimension
    target: Tuple[Dimension, ...]

    def __getitem__(self, offset: int) -> "OffsetIndex":
        return OffsetIndex(self, offset)


@dataclasses.dataclass(frozen=True)
class OffsetIndex:
    offset: FieldOffset
    index: int


@dataclasses.dataclass
class Connectivity:
    """Neighbor table: maps ``source`` elements to ``codomain`` element ids.

    ``table`` has shape (n_source, max_neighbors); ``skip_value`` marks
    missing neighbors (reference: common.py:964-1122).
    """

    table: Any  # (n_source, max_neighbors) int array
    source: Dimension
    codomain: Dimension
    local_dim: Dimension
    skip_value: Optional[int] = -1

    @property
    def max_neighbors(self) -> int:
        return self.table.shape[1]


class Field:
    """A dimensioned array with a domain; operations intersect domains.

    Registered as a jax pytree: compositions of field operations can be
    ``jax.jit``-ed directly.
    """

    def __init__(self, domain: Domain, data):
        self.domain = domain
        self.data = data

    # ---- construction helpers ---- #

    @property
    def dims(self) -> Tuple[Dimension, ...]:
        return self.domain.dims

    @property
    def dtype(self):
        return np.dtype(self.data.dtype)

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def ndarray(self):
        return self.data

    def asnumpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def __repr__(self):
        dims = ", ".join(
            f"{d.value}[{r.start}:{r.stop}]" for d, r in self.domain
        )
        return f"Field<{dims}, {self.dtype}>"

    # ---- pytree protocol ---- #

    def tree_flatten(self):
        return (self.data,), self.domain

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])

    # ---- domain algebra ---- #

    def remap(self, conn: Connectivity) -> "Field":
        """Gather through a neighbor table: result dims replace the
        codomain dim with (source, local)."""
        ax = self.dims.index(conn.codomain)
        own = self.domain[conn.codomain]
        table = jnp.asarray(conn.table)
        idx = table - own.start
        safe = jnp.clip(idx, 0, self.data.shape[ax] - 1)
        gathered = jnp.take(self.data, safe.reshape(-1), axis=ax)
        new_shape = (
            self.data.shape[:ax] + table.shape + self.data.shape[ax + 1 :]
        )
        gathered = gathered.reshape(new_shape)
        # move the new (source, local) axes to the front position of ax
        dims = (
            self.dims[:ax] + (conn.source, conn.local_dim) + self.dims[ax + 1 :]
        )
        ranges = (
            self.domain.ranges[:ax]
            + (UnitRange(0, table.shape[0]), UnitRange(0, table.shape[1]))
            + self.domain.ranges[ax + 1 :]
        )
        return Field(Domain(dims, ranges), gathered)

    def __call__(self, off: Union[OffsetIndex, Connectivity, FieldOffset]) -> "Field":
        if isinstance(off, Connectivity):
            return self.remap(off)
        if isinstance(off, FieldOffset):
            raise TypeError(
                f"Offset '{off.value}' needs an index (e.g. {off.value}[1]) "
                "or pass a Connectivity"
            )
        dim = off.offset.source
        ax = self.dims.index(dim)
        ranges = list(self.domain.ranges)
        ranges[ax] = ranges[ax].shift(-off.index)
        return Field(Domain(self.dims, tuple(ranges)), self.data)

    # ---- arithmetic with broadcasting + domain intersection ---- #

    def _binary(self, other, op):
        if not isinstance(other, Field):
            return Field(self.domain, op(self.data, other))
        dims = list(self.dims)
        for d in other.dims:
            if d not in dims:
                dims.append(d)
        ranges = []
        for d in dims:
            if d in self.dims and d in other.dims:
                ranges.append(self.domain[d].intersect(other.domain[d]))
            elif d in self.dims:
                ranges.append(self.domain[d])
            else:
                ranges.append(other.domain[d])
        dom = Domain(tuple(dims), tuple(ranges))
        a = _expand(self, dom)
        b = _expand(other, dom)
        return Field(dom, op(a, b))

    def _rbinary(self, other, op):
        return Field(self.domain, op(other, self.data))

    def __add__(self, o): return self._binary(o, jnp.add)
    def __radd__(self, o): return self._rbinary(o, jnp.add)
    def __sub__(self, o): return self._binary(o, jnp.subtract)
    def __rsub__(self, o): return self._rbinary(o, jnp.subtract)
    def __mul__(self, o): return self._binary(o, jnp.multiply)
    def __rmul__(self, o): return self._rbinary(o, jnp.multiply)
    def __truediv__(self, o): return self._binary(o, jnp.true_divide)
    def __rtruediv__(self, o): return self._rbinary(o, jnp.true_divide)
    def __pow__(self, o): return self._binary(o, jnp.power)
    def __mod__(self, o): return self._binary(o, jnp.mod)
    def __neg__(self): return Field(self.domain, -self.data)
    def __pos__(self): return self
    def __abs__(self): return Field(self.domain, jnp.abs(self.data))
    def __gt__(self, o): return self._binary(o, jnp.greater)
    def __ge__(self, o): return self._binary(o, jnp.greater_equal)
    def __lt__(self, o): return self._binary(o, jnp.less)
    def __le__(self, o): return self._binary(o, jnp.less_equal)
    def __eq__(self, o): return self._binary(o, jnp.equal)  # type: ignore[override]
    def __ne__(self, o): return self._binary(o, jnp.not_equal)  # type: ignore[override]
    def __and__(self, o): return self._binary(o, jnp.logical_and)
    def __or__(self, o): return self._binary(o, jnp.logical_or)
    def __invert__(self): return Field(self.domain, jnp.logical_not(self.data))

    __hash__ = None  # type: ignore[assignment]


def _expand(f: Field, dom: Domain):
    """Broadcast/restrict a field's data onto ``dom``."""
    data = f.data
    # restrict own dims to the intersected ranges (unbounded broadcast
    # axes -- size-1 data with huge ranges -- pass through untouched)
    idx = []
    for ax, d in enumerate(f.dims):
        r = dom[d]
        own = f.domain[d]
        if data.shape[ax] == 1 and len(own) > 1:
            idx.append(slice(None))
            continue
        lo = r.start - own.start
        idx.append(slice(lo, lo + len(r)))
    data = data[tuple(idx)]
    # insert broadcast axes for missing dims (in dom order)
    shape = []
    src_ax = {d: i for i, d in enumerate(f.dims)}
    perm = [src_ax[d] for d in dom.dims if d in src_ax]
    data = jnp.transpose(data, perm) if perm != sorted(perm) else data
    it = iter(range(len(perm)))
    for d in dom.dims:
        if d in src_ax:
            shape.append(data.shape[next(it)])
        else:
            shape.append(1)
    return data.reshape(shape)


jax.tree_util.register_pytree_node(
    Field,
    lambda f: f.tree_flatten(),
    Field.tree_unflatten,
)
