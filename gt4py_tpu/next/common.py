"""Core field-view vocabulary: dimensions, ranges, domains, fields.

Reference: src/gt4py/next/common.py (Dimension :66-112 incl. the
comparison operators producing Domains, UnitRange :197 incl. Infinity,
Domain :433, Field protocol :749, Connectivity :964-1122, promote_dims
:1349) and the jax namespace registration in
embedded/nd_array_field.py:1055-1091.

TPU-first redesign note: there is exactly one ``Field`` implementation,
generic over the array namespace.  jax-backed fields are the product path
(pytree-registered, jit-traceable); numpy-backed fields are the embedded
oracle (reference runners/roundtrip.py analog) -- both run the same
domain/broadcast/offset logic, so backend semantics cannot fork.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import enum
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

from gt4py_tpu import config

config.ensure_jax_config()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


#: Sentinel magnitude for unbounded ranges (reference: common.Infinity).
#: Large enough that no real grid index reaches it, small enough that
#: shifting it by any offset cannot overflow an int64.
INFINITY: int = 1 << 60


def _xp(data):
    """Array namespace of ``data``: numpy for numpy arrays (the embedded
    oracle), jnp for everything else (jax arrays and tracers)."""
    return np if isinstance(data, np.ndarray) else jnp


class DimensionKind(enum.Enum):
    HORIZONTAL = "horizontal"
    VERTICAL = "vertical"
    LOCAL = "local"


#: promote_dims sorts by kind first (reference: common.order_dimensions)
_KIND_ORDER = {
    DimensionKind.HORIZONTAL: 0,
    DimensionKind.LOCAL: 1,
    DimensionKind.VERTICAL: 2,
}


@dataclasses.dataclass(frozen=True, eq=False)
class Dimension:
    value: str
    kind: DimensionKind = DimensionKind.HORIZONTAL

    def __str__(self):
        return self.value

    def __hash__(self):
        return hash((self.value, self.kind))

    # -- comparisons with integers build 1D Domains (reference:
    # common.py:95-118; used as the concat_where condition, e.g. ``K < 5``)

    def __eq__(self, other):
        if isinstance(other, Dimension):
            return self.value == other.value and self.kind == other.kind
        if isinstance(other, (int, np.integer)):
            return Domain((self,), (UnitRange(int(other), int(other) + 1),))
        return NotImplemented

    def __ne__(self, other):
        if isinstance(other, Dimension):
            return not self.__eq__(other)
        raise TypeError(
            "'dim != value' produces two disjoint domains; use "
            "concat_where(dim < value, ...) / concat_where(dim > value, ...)"
        )

    def __lt__(self, value: int) -> "Domain":
        return Domain((self,), (UnitRange(-INFINITY, int(value)),))

    def __le__(self, value: int) -> "Domain":
        return Domain((self,), (UnitRange(-INFINITY, int(value) + 1),))

    def __gt__(self, value: int) -> "Domain":
        return Domain((self,), (UnitRange(int(value) + 1, INFINITY),))

    def __ge__(self, value: int) -> "Domain":
        return Domain((self,), (UnitRange(int(value), INFINITY),))


def promote_dims(*dims_list: Sequence[Dimension]) -> Tuple[Dimension, ...]:
    """Canonical ordering of the union of dimensions: by kind
    (HORIZONTAL < LOCAL < VERTICAL), then lexicographically by name
    (reference: common.promote_dims :1349-1384)."""
    seen: Dict[Dimension, None] = {}
    for dims in dims_list:
        for d in dims:
            seen.setdefault(d, None)
    out = sorted(seen, key=lambda d: (_KIND_ORDER[d.kind], d.value))
    n_local = sum(1 for d in out if d.kind == DimensionKind.LOCAL)
    if n_local > 1:
        raise ValueError(
            "There are more than one dimension with DimensionKind 'LOCAL'."
        )
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class UnitRange:
    """Half-open integer range [start, stop); +-INFINITY marks unbounded."""

    start: int
    stop: int

    @classmethod
    def infinite(cls) -> "UnitRange":
        return cls(-INFINITY, INFINITY)

    @property
    def is_finite(self) -> bool:
        return self.start > -INFINITY and self.stop < INFINITY

    def is_empty(self) -> bool:
        return self.stop <= self.start

    def __len__(self):
        return max(self.stop - self.start, 0)

    def intersect(self, other: "UnitRange") -> "UnitRange":
        return UnitRange(max(self.start, other.start), min(self.stop, other.stop))

    def shift(self, offset: int) -> "UnitRange":
        lo = self.start if self.start <= -INFINITY else self.start + offset
        hi = self.stop if self.stop >= INFINITY else self.stop + offset
        return UnitRange(lo, hi)

    def __contains__(self, v: int) -> bool:
        return self.start <= v < self.stop

    def __str__(self):
        lo = "-inf" if self.start <= -INFINITY else str(self.start)
        hi = "inf" if self.stop >= INFINITY else str(self.stop)
        return f"[{lo}:{hi})"


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
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(len(r) for r in self.ranges)

    def is_empty(self) -> bool:
        return any(r.is_empty() for r in self.ranges)

    def dim_index(self, dim: Dimension) -> int:
        return self.dims.index(dim)

    def replace(self, dim: Dimension, rng: UnitRange) -> "Domain":
        i = self.dims.index(dim)
        return Domain(self.dims, self.ranges[:i] + (rng,) + self.ranges[i + 1 :])

    def intersect(self, other: "Domain") -> "Domain":
        """Intersection over shared dims; dims of ``self`` not in ``other``
        keep their range (and vice versa, appended in other's order)."""
        dims = list(self.dims) + [d for d in other.dims if d not in self.dims]
        ranges = []
        for d in dims:
            if d in self.dims and d in other.dims:
                ranges.append(self[d].intersect(other[d]))
            elif d in self.dims:
                ranges.append(self[d])
            else:
                ranges.append(other[d])
        return Domain(tuple(dims), tuple(ranges))

    def __iter__(self):
        return iter(zip(self.dims, self.ranges))

    def __contains__(self, dim: Dimension) -> bool:
        return dim in self.dims

    def __str__(self):
        return "Domain(" + ", ".join(
            f"{d.value}{r}" for d, r in zip(self.dims, self.ranges)
        ) + ")"


def _slice_range(input_range: UnitRange, s: slice) -> UnitRange:
    """Relative slice of a range: start/stop count from the range start
    when >= 0, from the stop when negative; out-of-range raises (no
    clipping, per the array API standard) — reference:
    embedded/common.py:163-178 _slice_range."""
    if s == slice(None):
        return input_range
    start = (
        input_range.start if s.start is None or s.start >= 0 else input_range.stop
    ) + (s.start or 0)
    stop = (
        input_range.start if s.stop is None or s.stop >= 0 else input_range.stop
    ) + (s.stop if s.stop is not None else len(input_range))
    if start < input_range.start or stop > input_range.stop:
        raise IndexError(
            f"slice {s} out of range {input_range} (no clipping)"
        )
    # canonical empty range: never store stop < start in a Domain
    return UnitRange(start, max(start, stop))


def _buffer_slice(own: UnitRange, r: UnitRange) -> slice:
    """Buffer index of sub-range ``r`` inside the axis spanning ``own``."""
    lo = r.start - own.start
    return slice(lo, lo + len(r))


def unit_range(r) -> UnitRange:
    """Coerce an int / (start, stop) / range / UnitRange into a UnitRange
    (reference: common.unit_range :335)."""
    if isinstance(r, UnitRange):
        return r
    if isinstance(r, (int, np.integer)):
        return UnitRange(0, int(r))
    if isinstance(r, range):
        if r.step != 1:
            raise ValueError(f"unit_range requires step 1, got {r.step}")
        return UnitRange(r.start, r.stop)
    a, b = r
    return UnitRange(int(a), int(b))


class GridType(enum.Enum):
    """(reference: common.GridType :1330)"""

    CARTESIAN = "cartesian"
    UNSTRUCTURED = "unstructured"


def is_scalar_type(value) -> bool:
    """True for python/numpy scalar values and scalar *types*
    (reference: _core.definitions.is_scalar_type)."""
    if isinstance(value, type):
        return issubclass(value, (int, float, bool, np.generic))
    return isinstance(value, (int, float, bool, complex, np.generic))


def domain_like(value) -> Domain:
    """Coerce a Domain / dict / (dim, size) sequence into a Domain."""
    if isinstance(value, Domain):
        return value
    if isinstance(value, dict):
        dims = tuple(value.keys())
        ranges = tuple(
            r
            if isinstance(r, UnitRange)
            else UnitRange(int(r[0]), int(r[1]))
            if isinstance(r, tuple)
            else UnitRange(0, int(r))
            for r in value.values()
        )
        return Domain(dims, ranges)
    dims, sizes = zip(*value)
    return Domain(
        tuple(dims),
        tuple(s if isinstance(s, UnitRange) else UnitRange(0, int(s)) for s in sizes),
    )


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


def CartesianConnectivity(domain_dim: Dimension, offset: int = 0, *,
                          codomain: Optional[Dimension] = None) -> OffsetIndex:
    """A fixed shift along a dimension, usable wherever a connectivity is
    (``f(CartesianConnectivity(I, 1))``, ``premap``); reference:
    common.CartesianConnectivity :1242."""
    if codomain is not None and codomain.value != domain_dim.value:
        raise NotImplementedError(
            "CartesianConnectivity with a relabeling codomain is not "
            "supported; use a 1D Connectivity table instead"
        )
    return OffsetIndex(
        FieldOffset(domain_dim.value, source=domain_dim, target=(domain_dim,)),
        int(offset),
    )


def domain(value) -> Domain:
    """Coerce a Domain / dict / (dim, size) sequence (reference:
    common.domain :671)."""
    return domain_like(value)


@dataclasses.dataclass
class Connectivity:
    """Neighbor table: maps ``source`` elements to ``codomain`` element ids.

    ``table`` has shape (n_source, max_neighbors); ``skip_value`` marks
    missing neighbors (reference: common.py:964-1122).  1D tables
    (shape (n_source,)) represent plain index mappings as produced by
    ``as_offset`` (reference: embedded/nd_array_field.py:944-961).

    Tables are treated as IMMUTABLE once used in a call: gather plans
    (affine_remap) and jit traces bake table content in.  Replace
    ``table`` with a new array to change connectivity (caches re-key on
    a content token); in-place mutation after first use raises because
    planning freezes the array (``writeable=False``).
    """

    table: Any  # (n_source[, max_neighbors]) int array
    source: Dimension
    codomain: Dimension
    local_dim: Optional[Dimension] = None
    skip_value: Optional[int] = -1

    @property
    def max_neighbors(self) -> int:
        return self.table.shape[1]

    @property
    def has_local_dim(self) -> bool:
        return self.table.ndim == 2 and self.local_dim is not None


#: call-time offset provider (reference: embedded/context.py + the
#: ``offset_provider=`` argument threaded through every runner): maps an
#: offset NAME to the Connectivity (neighbor table) or Dimension
#: (cartesian shift axis) it stands for during the current operator call
_OFFSET_PROVIDER: contextvars.ContextVar = contextvars.ContextVar(
    "offset_provider", default=None
)


@contextlib.contextmanager
def offset_provider_context(provider):
    """Install ``provider`` (name -> Connectivity | Dimension) for the
    duration of an operator/program call; :class:`FieldOffset`
    applications resolve through it (reference:
    fbuiltins.FieldOffset.__getitem__ :481-496)."""
    if not provider:
        yield
        return
    token = _OFFSET_PROVIDER.set(dict(provider))
    try:
        yield
    finally:
        _OFFSET_PROVIDER.reset(token)


def current_offset_provider() -> Optional[Dict[str, Any]]:
    return _OFFSET_PROVIDER.get()


def provider_fingerprint(provider) -> Optional[tuple]:
    """Hashable identity of an offset provider for jit/AOT cache keys:
    a jit trace bakes the neighbor tables in as constants, so two calls
    with different providers must not share a trace."""
    if not provider:
        return None
    items = []
    for k in sorted(provider):
        v = provider[k]
        if isinstance(v, Connectivity):
            items.append((
                k, "conn", v.source.value, v.codomain.value,
                getattr(v.local_dim, "value", None), v.skip_value,
                tuple(v.table.shape), str(np.dtype(v.table.dtype)),
                id(v.table),
            ))
        elif isinstance(v, Dimension):
            items.append((k, "dim", v.value, v.kind.value))
        else:
            items.append((k, type(v).__name__, id(v)))
    return tuple(items)


def _provider_lookup(name: str):
    prov = _OFFSET_PROVIDER.get()
    return None if prov is None else prov.get(name)


def _check_offset_connectivity(off: "FieldOffset", conn: Connectivity) -> None:
    """The provider entry must agree with the offset's declared dims:
    the field carries ``off.source`` (= the table's codomain) and the
    result carries ``off.target`` (= table source [, local dim])."""
    expected = (conn.source,) + (
        (conn.local_dim,) if conn.has_local_dim else ()
    )
    ok = (
        off.source.value == conn.codomain.value
        and len(off.target) == len(expected)
        and all(a.value == b.value for a, b in zip(off.target, expected))
    )
    if not ok:
        decl = ", ".join(d.value for d in off.target)
        got = ", ".join(d.value for d in expected)
        raise TypeError(
            f"offset_provider['{off.value}'] maps {conn.codomain.value} -> "
            f"({got}) but the offset declares source={off.source.value}, "
            f"target=({decl})"
        )


def _column_conn(prov: Connectivity, k: int) -> Connectivity:
    """Cached k-th-neighbor column view of a 2D connectivity.  Column
    gathers are hot (every ``f(V2E[k])``) and a persistent instance lets
    the affine-remap plan cache survive calls.  Keyed on the parent
    table's identity token so a REPLACED table drops the stale column
    views (tables are otherwise documented immutable once used; see
    affine_remap.plan_for)."""
    from . import affine_remap

    columns = prov.__dict__.setdefault("_column_conns", {})
    token = affine_remap.table_token(prov.table)
    key = (token, k)
    column = columns.get(key)
    if column is None:
        for stale in [kk for kk in columns if kk[0] != token]:
            del columns[stale]
        column = Connectivity(
            prov.table[:, k],
            source=prov.source,
            codomain=prov.codomain,
            local_dim=None,
            skip_value=prov.skip_value,
        )
        columns[key] = column
    return column


def _peek_conn(off) -> Optional[Connectivity]:
    """Resolve an offset application to its concrete Connectivity WITHOUT
    side effects, for multi-hop chain folding; None when the offset is a
    cartesian shift, unresolvable, or malformed (the sequential path then
    raises the proper error)."""
    try:
        if isinstance(off, Connectivity):
            return off
        if isinstance(off, FieldOffset):
            prov = _provider_lookup(off.value)
            if isinstance(prov, Connectivity):
                _check_offset_connectivity(off, prov)
                return prov
            return None
        if isinstance(off, OffsetIndex) and isinstance(off.offset, FieldOffset):
            prov = _provider_lookup(off.offset.value)
            if (
                isinstance(prov, Connectivity)
                and getattr(prov.table, "ndim", 0) == 2
            ):
                _check_offset_connectivity(off.offset, prov)
                nb = prov.table.shape[1]
                if -nb <= off.index < nb:
                    return _column_conn(prov, off.index % nb)
        return None
    except Exception:
        return None


def _maybe_compose(c1: Connectivity, c2: Connectivity):
    """The composite connectivity for the hop pair ``remap(c1)`` then
    ``remap(c2)``, or None when ineligible or unprofitable.

    Exactness: the intermediate field of the two-hop base path always
    lives on range ``[0, len(t1))`` with clip-to-range gather semantics,
    so ``comp[x, ...] = t1[clip(t2[x], 0, len(t1)-1), ...]`` gathered
    once reproduces the chain bit-for-bit -- including skip entries
    (both paths read the same clipped positions).  ROADMAP multi-hop
    item: one composite gather replaces two materialized hops, and on
    quasi-structured meshes the composite table usually refits affine,
    so indexed chains like ``v(E2V0[0], V2E1[1])`` run as dense strided
    windows end-to-end.  Reference behavior: sequential premap
    composition, src/gt4py/next/embedded/nd_array_field.py:240-376.

    Cost policy: the composite is used when it fits an affine plan, or
    when at least one original hop did NOT (one irregular gather beats
    two gathers of which one is irregular); two affine hops whose
    composite loses the structure stay sequential."""
    t1, t2 = c1.table, c2.table
    if not (isinstance(t1, np.ndarray) and isinstance(t2, np.ndarray)):
        return None
    if t2.ndim != 1 or c2.codomain.value != c1.source.value:
        return None
    from . import affine_remap

    key = (affine_remap.table_token(t1), affine_remap.table_token(t2))
    cache = c2.__dict__.setdefault("_compose_cache", {})
    if key in cache:
        return cache[key]
    for stale in [kk for kk in cache if kk[1] != key[1]]:
        del cache[stale]
    safe2 = np.clip(t2, 0, t1.shape[0] - 1)
    comp = Connectivity(
        np.ascontiguousarray(t1[safe2]),
        source=c2.source,
        codomain=c1.codomain,
        local_dim=c1.local_dim if t1.ndim == 2 else None,
        skip_value=c1.skip_value,
    )
    profitable = affine_remap.plan_for(comp) is not None or (
        affine_remap.plan_for(c1) is None or affine_remap.plan_for(c2) is None
    )
    result = comp if profitable else None
    cache[key] = result
    return result


def _fold_offset_chain(offs):
    """Fold adjacent concrete connectivity hops of a multi-offset
    application into composite Connectivities (see _maybe_compose);
    non-foldable items pass through for sequential application."""
    out = []
    cur = None  # (resolved Connectivity | None, item to apply)
    for o in offs:
        c = _peek_conn(o)
        if cur is None:
            cur = (c, o)
            continue
        pc, po = cur
        comp = _maybe_compose(pc, c) if pc is not None and c is not None else None
        if comp is not None:
            cur = (comp, comp)
        else:
            out.append(po)
            cur = (c, o)
    if cur is not None:
        out.append(cur[1])
    return out


#: types accepted anywhere a "field or scalar" is expected
Scalar = (int, float, bool, np.generic)


class Field:
    """A dimensioned array with a domain; operations intersect domains.

    jax-backed fields are registered as a pytree (jit-traceable); numpy
    arrays flow through identical code with the numpy namespace -- the
    embedded oracle.
    """

    def __init__(self, domain: Domain, data):
        self.domain = domain
        self.data = data

    # ---- annotation syntax: Field[Dims[I, J], float64] ---- #

    def __class_getitem__(cls, item):
        from . import type_system as ts

        return ts.field_annotation(item)

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

    @property
    def xp(self):
        return _xp(self.data)

    def asnumpy(self) -> np.ndarray:
        return np.asarray(self.data)

    # NOTE: deliberately NO __array__ (matching the reference Field):
    # a Field with __array__ gets silently consumed by numpy-scalar
    # binary ops (np_scalar + field coerces instead of deferring to
    # Field.__radd__), losing the domain.  Use .asnumpy()/.ndarray.

    def as_scalar(self):
        """The single value of a 0-dimensional field (reference:
        nd_array_field.py:232-237)."""
        if self.domain.ndim != 0:
            raise ValueError(
                "'as_scalar' is only valid on 0-dimensional 'Field's, got a "
                f"{self.domain.ndim}-dimensional 'Field'."
            )
        return self.dtype.type(np.asarray(self.data)[()])

    def __repr__(self):
        dims = ", ".join(f"{d.value}{r}" for d, r in self.domain)
        return f"Field<{dims}, {self.dtype}>"

    # ---- pytree protocol ---- #

    def tree_flatten(self):
        return (self.data,), self.domain

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])

    # ---- domain restriction ---- #

    def restrict(self, domain: Domain) -> "Field":
        """Slice out ``domain`` (must be contained in own domain; dims of
        ``domain`` not in the field are ignored)."""
        idx = []
        ranges = []
        for ax, d in enumerate(self.dims):
            own = self.domain[d]
            if d in domain:
                r = own.intersect(domain[d])
                if self.data.shape[ax] == 1 and len(own) > 1:
                    # unbounded broadcast axis: keep size-1 data, narrow range
                    idx.append(slice(None))
                else:
                    lo = r.start - own.start
                    idx.append(slice(lo, lo + len(r)))
                ranges.append(r)
            else:
                idx.append(slice(None))
                ranges.append(own)
        return Field(Domain(self.dims, tuple(ranges)), self.data[tuple(idx)])

    # ---- reference-style index specs (relative / absolute) ---- #
    # (reference: embedded/common.py:33-116 _relative_sub_domain /
    #  _absolute_sub_domain, nd_array_field.py:465-478 _slice)

    def _slice_spec(self, index, *, for_write: bool = False) -> Tuple[Domain, tuple]:
        """Normalize an index spec into ``(new_domain, buffer_index)``.

        Accepted forms (mirroring the reference's AnyIndexSpec):
        - ``Domain`` — absolute restriction by named ranges;
        - ``(dim, i)`` pairs (or a sequence of them) with ``i`` an int
          (drops the dimension), a ``UnitRange``/``range``/``(lo, hi)``
          (absolute restriction);
        - relative ints / slices / ``...`` in dimension order: slices are
          relative to the domain start (negative values to the stop), no
          clipping; an int selects one point and drops the dimension.

        ``for_write`` rejects specs that restrict a broadcast axis (size-1
        buffer spanning a wider range): the single stored element cannot
        represent a sub-range write.
        """
        if isinstance(index, Domain):
            index = tuple(zip(index.dims, index.ranges))
        if isinstance(index, tuple) and len(index) == 2 and isinstance(index[0], Dimension):
            index = (index,)
        if isinstance(index, Sequence) and not isinstance(index, str) and index and all(
            isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], Dimension)
            for e in index
        ):
            dom, idx = self._absolute_slice(tuple(index))
        else:
            if not isinstance(index, tuple):
                index = (index,)
            dom, idx = self._relative_slice(index)
        if for_write:
            self._check_writable(dom)
        return dom, idx

    def _check_writable(self, dom: Domain) -> None:
        for ax, d in enumerate(self.dims):
            if self.data.shape[ax] != 1 or len(self.domain[d]) <= 1:
                continue
            # broadcast axis: the write must cover the whole range (or
            # the dim was untouched) — a sub-range write would silently
            # hit every logical point
            r = dom[d] if d in dom else None
            if r is None or r != self.domain[d]:
                raise ValueError(
                    f"cannot write a sub-range of broadcast dimension "
                    f"{d.value} (size-1 buffer spans {self.domain[d]}); "
                    "materialize the field first (e.g. broadcast + copy)"
                )

    def _absolute_slice(self, pairs) -> Tuple[Domain, tuple]:
        by_dim = {}
        for d, v in pairs:
            if d not in self.dims:
                raise IndexError(
                    f"field with dims ({', '.join(x.value for x in self.dims)}) "
                    f"has no dimension {d.value}"
                )
            by_dim[d] = v
        idx, dims, ranges = [], [], []
        for ax, d in enumerate(self.dims):
            own = self.domain[d]
            broadcast_ax = self.data.shape[ax] == 1 and len(own) > 1
            if d not in by_dim:
                idx.append(slice(None))
                dims.append(d)
                ranges.append(own)
                continue
            v = by_dim[d]
            if isinstance(v, (int, np.integer)):
                if int(v) not in own:
                    raise IndexError(
                        f"index {d.value}={int(v)} out of range {own} (no clipping)"
                    )
                idx.append(0 if broadcast_ax else int(v) - own.start)
            else:
                r = unit_range(v)
                # an unbounded request bound means "to the field's edge"
                # (e.g. f[K < 5] from a Dimension comparison)
                if r.start <= -INFINITY:
                    r = UnitRange(own.start, r.stop)
                if r.stop >= INFINITY:
                    r = UnitRange(r.start, own.stop)
                if r.start < own.start or r.stop > own.stop:
                    raise IndexError(
                        f"range {d.value}{r} not contained in {own} (no clipping)"
                    )
                idx.append(slice(None) if broadcast_ax else _buffer_slice(own, r))
                dims.append(d)
                ranges.append(r)
        return Domain(tuple(dims), tuple(ranges)), tuple(idx)

    def _relative_slice(self, index) -> Tuple[Domain, tuple]:
        if Ellipsis in index:
            pos = index.index(Ellipsis)
            fill = (slice(None),) * (len(self.dims) - (len(index) - 1))
            index = index[:pos] + fill + index[pos + 1 :]
        if len(index) > len(self.dims):
            raise IndexError(
                f"cannot index {len(self.dims)}-dimensional field with "
                f"{len(index)} indices"
            )
        index = index + (slice(None),) * (len(self.dims) - len(index))
        idx, dims, ranges = [], [], []
        for ax, (d, e) in enumerate(zip(self.dims, index)):
            own = self.domain[d]
            broadcast_ax = self.data.shape[ax] == 1 and len(own) > 1
            if isinstance(e, slice):
                if e.step not in (None, 1):
                    raise IndexError("field slicing requires step 1")
                r = _slice_range(own, e)
                idx.append(slice(None) if broadcast_ax else _buffer_slice(own, r))
                dims.append(d)
                ranges.append(r)
            elif isinstance(e, (int, np.integer)):
                if not own.is_finite:
                    raise IndexError(f"cannot index unbounded range {d.value}{own}")
                p = (own.start if e >= 0 else own.stop) + int(e)
                if p not in own:
                    raise IndexError(
                        f"index {int(e)} out of range for {d.value}{own} "
                        "(no clipping)"
                    )
                idx.append(0 if broadcast_ax else p - own.start)
            else:
                raise TypeError(
                    f"unsupported field index {e!r}; use ints, slices, a "
                    "Domain, or (dim, index) pairs"
                )
        return Domain(tuple(dims), tuple(ranges)), tuple(idx)

    def __getitem__(self, index) -> "Field":
        """Restrict to a sub-domain (reference: nd_array_field.restrict
        :378-384).  Accepts a Domain, (dim, index) pairs, or relative
        ints/slices/``...`` — all strict (no clipping), and symmetric
        with ``__setitem__``; ``.restrict(domain)`` keeps the clipping
        (intersecting) semantics for internal composition.  numpy-backed
        results share the buffer (views), so writing into a restricted
        out= target reaches the caller."""
        dom, idx = self._slice_spec(index)
        return Field(dom, self.data[idx])

    def __setitem__(self, index, value) -> None:
        """Write a sub-domain in place (reference: nd_array_field.py
        :386-401; jax fields rebind functionally, :1070-1084)."""
        dom, idx = self._slice_spec(index, for_write=True)
        if isinstance(value, Field):
            if not (value.dims == dom.dims and value.domain.ranges == dom.ranges):
                raise ValueError(
                    f"incompatible Domain in assignment: source {value.domain}, "
                    f"target {dom}"
                )
            value = value.data
        if isinstance(self.data, np.ndarray):
            self.data[idx] = value
        else:
            self.data = self.data.at[idx].set(value)

    # ---- remap / premap (gather through connectivities) ---- #

    def remap(self, conn: Connectivity) -> "Field":
        """Gather through a neighbor table: result dims replace the
        codomain dim with (source[, local])."""
        xp = self.xp
        try:
            ax = self.dims.index(conn.codomain)
        except ValueError:
            raise ValueError(
                f"cannot remap: field dims "
                f"({', '.join(d.value for d in self.dims)}) do not include "
                f"the connectivity codomain {conn.codomain.value}"
            ) from None
        own = self.domain[conn.codomain]
        tshape = tuple(conn.table.shape)
        gathered = None
        if xp is not np and isinstance(conn.table, np.ndarray):
            # quasi-structured tables: gather as dense strided windows
            # (affine_remap.py) -- bit-identical to the take path, far
            # cheaper than an XLA gather on TPU; None when ineligible.
            # 1D tables (neighbor columns, as_offset with concrete
            # indices) plan as a single column; the local axis the plan
            # machinery adds is dropped again below.
            from . import affine_remap

            plan = affine_remap.plan_for(conn)
            if plan is not None:
                gathered = affine_remap.apply_table_plan(
                    plan, self.data, own.start, ax
                )
                if gathered is not None and len(tshape) == 1:
                    gathered = gathered.reshape(
                        gathered.shape[: ax + 1] + gathered.shape[ax + 2 :]
                    )
            if gathered is None:
                # truly-irregular tables: sort-routing gather (seed
                # permutation + doubling rounds, sort_route.py) -- the
                # compiled path for connectivity the affine fit declines
                from . import sort_route

                splan = sort_route.plan_for(conn)
                if splan is not None:
                    flat = sort_route.apply_gather_plan(
                        splan, self.data, own.start, ax
                    )
                    if flat is not None:
                        new_shape = (
                            self.data.shape[:ax]
                            + tshape
                            + self.data.shape[ax + 1 :]
                        )
                        gathered = flat.reshape(new_shape)
        if gathered is None:
            table = (
                np.asarray(conn.table)
                if xp is np
                else jnp.asarray(conn.table)
            )
            idx = table - own.start
            safe = xp.clip(idx, 0, self.data.shape[ax] - 1)
            gathered = xp.take(self.data, safe.reshape(-1), axis=ax)
            new_shape = self.data.shape[:ax] + tshape + self.data.shape[ax + 1 :]
            gathered = gathered.reshape(new_shape)
        if len(tshape) == 2:
            new_dims = (conn.source, conn.local_dim)
            new_ranges = (
                UnitRange(0, tshape[0]),
                UnitRange(0, tshape[1]),
            )
        else:  # 1D mapping (as_offset): codomain dim replaced by source dim
            new_dims = (conn.source,)
            new_ranges = (UnitRange(0, tshape[0]),)
        dims = self.dims[:ax] + new_dims + self.dims[ax + 1 :]
        ranges = self.domain.ranges[:ax] + new_ranges + self.domain.ranges[ax + 1 :]
        return Field(Domain(dims, ranges), gathered)

    def premap(self, *conns: Connectivity) -> "Field":
        """Compose the field with index mappings, ``(f∘c)(x) = f(c(x))``
        (reference: embedded/nd_array_field.py:240-…).  Each connectivity's
        codomain must be a dim of the field; gathers are applied one at a
        time (codomains pairwise distinct); adjacent concrete hops fold
        into one composite gather (_maybe_compose)."""
        seen = set()
        for c in conns:
            if isinstance(c, OffsetIndex):
                continue
            if c.codomain in seen:
                raise ValueError(f"duplicate codomain {c.codomain} in premap")
            seen.add(c.codomain)
        out = self
        for c in _fold_offset_chain(conns):
            if isinstance(c, OffsetIndex):  # cartesian shift: domain translation
                out = out(c)
                continue
            if c.codomain not in out.dims:
                raise ValueError(
                    f"premap codomain {c.codomain.value} not in field dims "
                    f"{[d.value for d in out.dims]}"
                )
            out = out.remap(c)
        return out

    def __call__(
        self, off: Union[OffsetIndex, Connectivity, FieldOffset], *more
    ) -> "Field":
        if more:
            # reference: NdArrayField.__call__ reduces over premap
            # (nd_array_field.py:367-376).  Adjacent concrete hops fold
            # into ONE composite gather first (_maybe_compose): indexed
            # chains like v(E2V0[0], V2E1[1]) then run as a single
            # (usually affine-windowed) gather instead of materializing
            # each intermediate.
            out = self
            for o in _fold_offset_chain((off,) + more):
                out = out.remap(o) if isinstance(o, Connectivity) else out(o)
            return out
        if isinstance(off, Connectivity):
            return self.remap(off)
        if isinstance(off, FieldOffset):
            # reference-style named offsets: the table arrives at call
            # time via offset_provider (fbuiltins.py:481-496)
            prov = _provider_lookup(off.value)
            if isinstance(prov, Connectivity):
                _check_offset_connectivity(off, prov)
                return self.remap(prov)
            if len(off.target) == 2:
                raise TypeError(
                    f"offset '{off.value}' names a neighbor connectivity; "
                    f"pass offset_provider={{'{off.value}': <Connectivity>}} "
                    "at the call"
                )
            raise TypeError(
                f"Offset '{off.value}' needs an index (e.g. {off.value}[1]) "
                "or pass a Connectivity"
            )
        prov = _provider_lookup(off.offset.value)
        if isinstance(prov, Connectivity):
            # V2E[k]: select the k-th neighbor column (reference:
            # offset_definition[NamedIndex(target[-1], k)])
            _check_offset_connectivity(off.offset, prov)
            if prov.table.ndim != 2:
                raise TypeError(
                    f"offset_provider['{off.offset.value}'] is a 1D "
                    "mapping; apply the offset without an index"
                )
            nb = prov.table.shape[1]
            if not (-nb <= off.index < nb):
                raise IndexError(
                    f"neighbor index {off.index} out of range for "
                    f"'{off.offset.value}' with {nb} neighbors"
                )
            return self.remap(_column_conn(prov, off.index % nb))
        dim = prov if isinstance(prov, Dimension) else off.offset.source
        try:
            ax = [d.value for d in self.dims].index(dim.value)
        except ValueError:
            raise TypeError(
                f"field with dims ({', '.join(d.value for d in self.dims)}) "
                f"has no dimension {dim.value} to shift along"
            ) from None
        ranges = list(self.domain.ranges)
        ranges[ax] = ranges[ax].shift(-off.index)
        return Field(Domain(self.dims, tuple(ranges)), self.data)

    # ---- arithmetic with broadcasting + domain intersection ---- #

    def _binary(self, other, opname):
        if not isinstance(other, Field):
            return Field(self.domain, getattr(self.xp, opname)(self.data, other))
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
        xp = jnp if (self.xp is jnp or other.xp is jnp) else np
        return Field(dom, getattr(xp, opname)(a, b))

    def _rbinary(self, other, opname):
        return Field(self.domain, getattr(self.xp, opname)(other, self.data))

    def __add__(self, o): return self._binary(o, "add")
    def __radd__(self, o): return self._rbinary(o, "add")
    def __sub__(self, o): return self._binary(o, "subtract")
    def __rsub__(self, o): return self._rbinary(o, "subtract")
    def __mul__(self, o): return self._binary(o, "multiply")
    def __rmul__(self, o): return self._rbinary(o, "multiply")
    def __truediv__(self, o): return self._binary(o, "true_divide")
    def __rtruediv__(self, o): return self._rbinary(o, "true_divide")
    def __floordiv__(self, o): return self._binary(o, "floor_divide")
    def __rfloordiv__(self, o): return self._rbinary(o, "floor_divide")
    def __pow__(self, o): return self._binary(o, "power")
    def __mod__(self, o): return self._binary(o, "mod")
    def __neg__(self): return Field(self.domain, -self.data)
    def __pos__(self): return self
    def __abs__(self): return Field(self.domain, self.xp.abs(self.data))
    def __gt__(self, o): return self._binary(o, "greater")
    def __ge__(self, o): return self._binary(o, "greater_equal")
    def __lt__(self, o): return self._binary(o, "less")
    def __le__(self, o): return self._binary(o, "less_equal")
    def __eq__(self, o): return self._binary(o, "equal")  # type: ignore[override]
    def __ne__(self, o): return self._binary(o, "not_equal")  # type: ignore[override]
    def __and__(self, o): return self._binary(o, "logical_and")
    def __or__(self, o): return self._binary(o, "logical_or")
    def __xor__(self, o): return self._binary(o, "logical_xor")
    def __invert__(self): return Field(self.domain, self.xp.logical_not(self.data))

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
    data = _xp(data).transpose(data, perm) if perm != sorted(perm) else data
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
