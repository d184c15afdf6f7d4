"""Test-case harness for field operators and programs.

Reference counterpart: tests/next_tests/integration_tests/cases.py
(:338-500 ``allocate``/``run``/``verify`` and the SimpleMesh fixtures).
A ``Case`` carries default sizes per dimension, an offset provider, and
the array allocator; ``allocate`` derives a field's dims/dtype from the
operator's *parsed parameter types* (the typed field-view IR), so tests
never restate shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from gt4py_tpu.next import type_system as ts
from gt4py_tpu.next.common import (
    Connectivity,
    Dimension,
    DimensionKind,
    Domain,
    Field,
    UnitRange,
)

RETURN = "return"


@dataclasses.dataclass
class Case:
    """Execution context for operator tests."""

    default_sizes: Dict[Dimension, int]
    offset_provider: Dict[str, Any] = dataclasses.field(default_factory=dict)
    allocator: str = "numpy"  # "numpy" | "jax"

    def __post_init__(self):
        # one shared initializer per case: every allocated input gets
        # globally distinct values (reference: UniqueInitializer)
        self._unique = UniqueInitializer()

    def size(self, dim: Dimension) -> int:
        if dim not in self.default_sizes:
            raise KeyError(f"no default size for dimension {dim.value}")
        return self.default_sizes[dim]


class UniqueInitializer:
    """Fills fields with distinct consecutive values (catches index bugs
    that symmetric random data can hide)."""

    def __init__(self, start: int = 1):
        self._next = start

    def __call__(self, shape, dtype):
        n = int(np.prod(shape)) if shape else 1
        data = np.arange(self._next, self._next + n, dtype=dtype).reshape(shape)
        self._next += n
        return data


class ZeroInitializer:
    def __call__(self, shape, dtype):
        return np.zeros(shape, dtype=dtype)


def _param_type(op, name: str):
    ir = getattr(op, "ir", None)
    if ir is None:
        raise TypeError(f"{op!r} has no parsed IR")
    if name == RETURN:
        rt = getattr(ir, "declared_return", None)
        if rt is None:
            raise TypeError(f"{op!r} has no declared return type")
        return rt
    for p in ir.params:
        if p.name == name:
            return p.type
    raise KeyError(f"{op!r} has no parameter {name!r}")


def allocate(
    case: Case,
    op,
    name: str,
    *,
    strategy=None,
    dtype=None,
    extend: Optional[Dict[Dimension, Tuple[int, int]]] = None,
) -> Field:
    """Allocate an argument (or ``RETURN``) of ``op`` from its parsed
    parameter type.  ``extend`` grows the domain per dimension (lower,
    upper) -- for shifted inputs that must be bigger than the output."""
    t = _param_type(op, name)
    if not isinstance(t, ts.FieldType):
        raise TypeError(f"parameter {name!r} is not a field (got {t})")
    dt = np.dtype(dtype if dtype is not None else t.dtype.kind)
    if strategy is None:
        strategy = ZeroInitializer() if name in ("out", RETURN) else case._unique
    dims = t.dims
    ranges = []
    for d in dims:
        lo, hi = 0, case.size(d)
        if extend and d in extend:
            e0, e1 = extend[d]
            lo, hi = lo - e0, hi + e1
        ranges.append(UnitRange(lo, hi))
    dom = Domain(tuple(dims), tuple(ranges))
    data = strategy(dom.shape, dt)
    if case.allocator == "jax":
        import jax.numpy as jnp

        data = jnp.asarray(data)
    return Field(dom, data)


def run(case: Case, op, *args, **kwargs):
    if "offset_provider" not in kwargs and case.offset_provider:
        kwargs["offset_provider"] = case.offset_provider
    try:
        return op(*args, **kwargs)
    except TypeError:
        kwargs.pop("offset_provider", None)
        return op(*args, **kwargs)


def verify(case: Case, op, *args, ref, rtol=1e-12, atol=1e-12, **kwargs):
    """Run ``op`` and compare the result (or the mutated ``out=`` kwarg)
    against ``ref`` (array or Field)."""
    result = run(case, op, *args, **kwargs)
    if result is None:
        result = kwargs.get("out")
    got = result.asnumpy() if isinstance(result, Field) else np.asarray(result)
    want = ref.asnumpy() if isinstance(ref, Field) else np.asarray(ref)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return result


# --------------------------------------------------------------------- #
# canonical small unstructured mesh (reference: cases.py SimpleMesh)
# --------------------------------------------------------------------- #

Vertex = Dimension("Vertex")
Edge = Dimension("Edge")
Cell = Dimension("Cell")
V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)
E2VDim = Dimension("E2V", kind=DimensionKind.LOCAL)


@dataclasses.dataclass
class SimpleMesh:
    """A 9-vertex / 12-edge structured quad patch exposed as unstructured
    connectivity tables, with skip values on the boundary (interior
    vertices have 4 incident edges, corners only 2)."""

    n_vertices: int
    n_edges: int
    v2e: Connectivity
    e2v: Connectivity

    @classmethod
    def make(cls) -> "SimpleMesh":
        # 3x3 vertices, edges: 6 horizontal + 6 vertical
        #   v0 -e0- v1 -e1- v2
        #   |e6     |e7     |e8
        #   v3 -e2- v4 -e3- v5
        #   |e9     |e10    |e11
        #   v6 -e4- v7 -e5- v8
        e2v_table = np.array(
            [
                [0, 1], [1, 2],
                [3, 4], [4, 5],
                [6, 7], [7, 8],
                [0, 3], [1, 4], [2, 5],
                [3, 6], [4, 7], [5, 8],
            ],
            dtype=np.int64,
        )
        nv = 9
        v2e_lists: list = [[] for _ in range(nv)]
        for e, (a, b) in enumerate(e2v_table):
            v2e_lists[a].append(e)
            v2e_lists[b].append(e)
        width = max(len(l) for l in v2e_lists)
        v2e_table = np.full((nv, width), -1, dtype=np.int64)
        for v, l in enumerate(v2e_lists):
            v2e_table[v, : len(l)] = l
        return cls(
            n_vertices=nv,
            n_edges=len(e2v_table),
            v2e=Connectivity(
                table=v2e_table,
                source=Vertex,
                codomain=Edge,
                local_dim=V2EDim,
                skip_value=-1,
            ),
            e2v=Connectivity(
                table=e2v_table,
                source=Edge,
                codomain=Vertex,
                local_dim=E2VDim,
                skip_value=None,  # every edge has both endpoints
            ),
        )


def grid_mesh(n: int) -> SimpleMesh:
    """An n x n structured quad patch as unstructured connectivity
    tables (the SimpleMesh layout at arbitrary scale): 2*n*(n-1) edges,
    skip values at boundary vertices.  Used by the unstructured bench
    (bench.py) at >= 1e5 edges."""
    nv = n * n
    vid = np.arange(nv).reshape(n, n)
    h = np.stack([vid[:, :-1].ravel(), vid[:, 1:].ravel()], axis=1)
    v = np.stack([vid[:-1, :].ravel(), vid[1:, :].ravel()], axis=1)
    e2v_table = np.concatenate([h, v], axis=0).astype(np.int64)
    ne = len(e2v_table)
    # incident edges per vertex, skip-padded to width 4
    counts = np.zeros(nv, dtype=np.int64)
    v2e_table = np.full((nv, 4), -1, dtype=np.int64)
    for col in (0, 1):
        vs = e2v_table[:, col]
        order = np.argsort(vs, kind="stable")
        for e, vtx in zip(order, vs[order]):
            v2e_table[vtx, counts[vtx]] = e
            counts[vtx] += 1
    return SimpleMesh(
        n_vertices=nv,
        n_edges=ne,
        v2e=Connectivity(
            table=v2e_table,
            source=Vertex,
            codomain=Edge,
            local_dim=V2EDim,
            skip_value=-1,
        ),
        e2v=Connectivity(
            table=e2v_table,
            source=Edge,
            codomain=Vertex,
            local_dim=E2VDim,
            skip_value=None,
        ),
    )


def shuffled_mesh(n: int, seed: int = 0) -> SimpleMesh:
    """The :func:`grid_mesh` topology with vertices AND edges renumbered
    by random permutations: the physics is identical but the neighbor
    tables are truly IRREGULAR -- the affine window fit provably
    declines, so gathers exercise the sort-routing compiled path
    (next/sort_route.py).  Models adaptively-refined / partitioned
    production meshes whose numbering has no exploitable structure."""
    mesh = grid_mesh(n)
    rng = np.random.default_rng(seed)
    pv = rng.permutation(mesh.n_vertices).astype(np.int64)  # old -> new
    pe = rng.permutation(mesh.n_edges).astype(np.int64)
    e2v_old = np.asarray(mesh.e2v.table)
    v2e_old = np.asarray(mesh.v2e.table)
    e2v_new = np.empty_like(e2v_old)
    e2v_new[pe] = pv[e2v_old]
    v2e_new = np.empty_like(v2e_old)
    v2e_new[pv] = np.where(v2e_old == -1, -1, pe[np.clip(v2e_old, 0, None)])
    return SimpleMesh(
        n_vertices=mesh.n_vertices,
        n_edges=mesh.n_edges,
        v2e=Connectivity(
            table=v2e_new,
            source=Vertex,
            codomain=Edge,
            local_dim=V2EDim,
            skip_value=-1,
        ),
        e2v=Connectivity(
            table=e2v_new,
            source=Edge,
            codomain=Vertex,
            local_dim=E2VDim,
            skip_value=None,
        ),
    )


def simple_mesh_case(allocator: str = "numpy") -> Tuple[Case, SimpleMesh]:
    mesh = SimpleMesh.make()
    case = Case(
        default_sizes={
            Vertex: mesh.n_vertices,
            Edge: mesh.n_edges,
            V2EDim: mesh.v2e.max_neighbors,
            E2VDim: mesh.e2v.max_neighbors,
            Dimension("K", kind=DimensionKind.VERTICAL): 6,
        },
        offset_provider={"V2E": mesh.v2e, "E2V": mesh.e2v},
        allocator=allocator,
    )
    return case, mesh
