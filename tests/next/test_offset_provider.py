"""Call-time offset providers: reference-style ``FieldOffset`` resolution
through ``offset_provider={'V2E': connectivity}`` (reference:
fbuiltins.FieldOffset.__getitem__ :481-496 resolving via
embedded/context.py's ambient provider) -- full remaps ``f(V2E)``,
neighbor selection ``f(V2E[k])``, cartesian Dimension providers,
skip-aware reductions over the local dim, and jit-cache separation
between different providers."""

import numpy as np
import pytest

from gt4py_tpu.next import (
    Dimension,
    FieldOffset,
    as_field,
    field_operator,
    neighbor_sum,
    program,
)
from gt4py_tpu.next.common import Connectivity
from gt4py_tpu.next.testing import Edge, SimpleMesh, V2EDim, Vertex
from gt4py_tpu.next.type_system import Dims

from gt4py_tpu.next import Field

float64 = np.float64

V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
I = Dimension("I")
Ioff = FieldOffset("Ioff", source=I, target=(I,))


@pytest.fixture(params=["numpy", "jax"])
def alloc(request):
    return request.param


@pytest.fixture
def mesh():
    return SimpleMesh.make()


def _edge_vals(mesh, alloc):
    return as_field((Edge,), np.arange(mesh.n_edges, dtype=np.float64) + 1.0,
                    allocator=alloc)


def _oracle_gather(mesh, evals):
    t = mesh.v2e.table
    safe = np.clip(t, 0, len(evals) - 1)
    return evals[safe], t != mesh.v2e.skip_value


def test_provider_remap_matches_direct_connectivity(mesh, alloc):
    @field_operator
    def via_offset(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E), axis=V2EDim)

    e = _edge_vals(mesh, alloc)
    got = via_offset(e, offset_provider={"V2E": mesh.v2e})
    vals, mask = _oracle_gather(mesh, e.asnumpy())
    np.testing.assert_allclose(got.asnumpy(), np.where(mask, vals, 0).sum(axis=1))


def test_neighbor_selection_index(mesh, alloc):
    @field_operator
    def first_nb(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return e(V2E[0])

    e = _edge_vals(mesh, alloc)
    got = first_nb(e, offset_provider={"V2E": mesh.v2e})
    # every vertex has at least one incident edge: column 0 has no skips
    expected = e.asnumpy()[mesh.v2e.table[:, 0]]
    np.testing.assert_array_equal(got.asnumpy(), expected)
    assert got.dims == (Vertex,)


def test_cartesian_dimension_provider(alloc):
    @field_operator
    def diff(a: Field[Dims[I], float64]) -> Field[Dims[I], float64]:
        return a(Ioff[1]) - a

    a = as_field((I,), np.arange(8, dtype=np.float64) ** 2, allocator=alloc)
    # provider value is a Dimension (reference: CartesianConnectivity)
    got = diff(a, offset_provider={"Ioff": I})
    raw = a.asnumpy()
    np.testing.assert_array_equal(got.asnumpy(), raw[1:] - raw[:-1])
    # ... and without a provider the offset's declared source still works
    got2 = diff(a)
    np.testing.assert_array_equal(got2.asnumpy(), raw[1:] - raw[:-1])


def test_provider_inside_program(mesh, alloc):
    @field_operator
    def via_offset(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E), axis=V2EDim)

    @program
    def prog(e: Field[Dims[Edge], float64], out: Field[Dims[Vertex], float64]):
        via_offset(e, out=out)

    e = _edge_vals(mesh, alloc)
    out = as_field((Vertex,), np.zeros(mesh.n_vertices), allocator=alloc)
    prog(e, out, offset_provider={"V2E": mesh.v2e})
    vals, mask = _oracle_gather(mesh, e.asnumpy())
    np.testing.assert_allclose(out.asnumpy(), np.where(mask, vals, 0).sum(axis=1))


def test_missing_provider_raises(mesh, alloc):
    @field_operator
    def via_offset(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E), axis=V2EDim)

    with pytest.raises(TypeError, match="offset_provider"):
        via_offset(_edge_vals(mesh, alloc))


def test_mismatched_provider_raises(mesh, alloc):
    @field_operator
    def via_offset(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E), axis=V2EDim)

    with pytest.raises(TypeError, match="declares source"):
        # e2v maps Vertex -> Edge ids: wrong direction for V2E
        via_offset(_edge_vals(mesh, alloc), offset_provider={"V2E": mesh.e2v})


def test_jit_cache_separates_providers(mesh):
    """Two providers with same-shaped tables must not share a jit trace
    (the table is a trace constant)."""
    @field_operator
    def first_nb(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return e(V2E[0])

    op = first_nb.with_backend("jax_jit")
    e = _edge_vals(mesh, "jax")
    got1 = op(e, offset_provider={"V2E": mesh.v2e})

    reversed_table = mesh.v2e.table[::-1].copy()
    other = Connectivity(
        table=reversed_table, source=Vertex, codomain=Edge,
        local_dim=V2EDim, skip_value=-1,
    )
    got2 = op(e, offset_provider={"V2E": other})
    np.testing.assert_array_equal(
        got1.asnumpy(), e.asnumpy()[mesh.v2e.table[:, 0]]
    )
    np.testing.assert_array_equal(
        got2.asnumpy(), e.asnumpy()[reversed_table[:, 0]]
    )


def test_provider_return_type_deduction(mesh):
    """Static typing of f(V2E): source dim replaced by declared target."""
    @field_operator
    def gather(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex, V2EDim], float64]:
        return e(V2E)

    e = _edge_vals(mesh, "numpy")
    got = gather(e, offset_provider={"V2E": mesh.v2e})
    assert got.dims == (Vertex, V2EDim)
    assert got.shape == (mesh.n_vertices, mesh.v2e.max_neighbors)
