"""Unstructured depth: sparse (local-dimension) fields, skip-value
semantics, unstructured scans, and the cases-style allocate/verify
harness (reference: tests/next_tests/integration_tests/cases.py:338-500,
src/gt4py/next/common.py:964-1122)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Field,
    as_field,
    field_operator,
    neighbor_sum,
    scan_operator,
)
from gt4py_tpu.next.testing import (
    RETURN,
    Case,
    SimpleMesh,
    UniqueInitializer,
    V2EDim,
    Vertex,
    Edge,
    allocate,
    simple_mesh_case,
    verify,
)
from gt4py_tpu.next.type_system import Dims

K = Dimension("K", kind=DimensionKind.VERTICAL)

float64 = np.float64


@pytest.fixture(params=["numpy", "jax"])
def case_mesh(request):
    return simple_mesh_case(allocator=request.param)


def test_allocate_from_param_types(case_mesh):
    case, mesh = case_mesh

    @field_operator
    def op(
        e: Field[Dims[Edge], float64], w: Field[Dims[Vertex, V2EDim], float64]
    ) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(w, axis=V2EDim)

    e = allocate(case, op, "e")
    w = allocate(case, op, "w")
    out = allocate(case, op, RETURN)
    assert e.dims == (Edge,) and e.shape == (mesh.n_edges,)
    assert w.dims == (Vertex, V2EDim)
    assert w.shape == (mesh.n_vertices, mesh.v2e.max_neighbors)
    assert out.shape == (mesh.n_vertices,)
    # UniqueInitializer: all values distinct across the two inputs
    vals = np.concatenate([e.asnumpy().ravel(), w.asnumpy().ravel()])
    assert len(np.unique(vals)) == len(vals)


def test_sparse_weighted_neighbor_sum_with_skips(case_mesh):
    """A sparse (Vertex, V2EDim) weight field multiplies the remapped edge
    values; skipped neighbor slots (boundary vertices of the quad patch)
    must not contribute even though the weight there is nonzero."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def weighted(
        e: Field[Dims[Edge], float64], w: Field[Dims[Vertex, V2EDim], float64]
    ) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(w * e(V2E), axis=V2E)

    e = allocate(case, weighted, "e", strategy=UniqueInitializer(1))
    w = allocate(case, weighted, "w", strategy=UniqueInitializer(100))

    ev, wv = e.asnumpy(), w.asnumpy()
    tab = mesh.v2e.table
    expect = np.zeros(mesh.n_vertices)
    for v in range(mesh.n_vertices):
        for s, nb in enumerate(tab[v]):
            if nb != mesh.v2e.skip_value:
                expect[v] += wv[v, s] * ev[nb]

    verify(case, weighted, e, w, ref=expect)


def test_remap_of_sparse_vertex_field(case_mesh):
    """e2v remap of a vertex field gives an (Edge, E2VDim) sparse field;
    reducing it sums the two endpoint values per edge."""
    case, mesh = case_mesh
    E2V = mesh.e2v

    @field_operator
    def endpoint_sum(v: Field[Dims[Vertex], float64]) -> Field[Dims[Edge], float64]:
        return neighbor_sum(v(E2V), axis=E2V)

    v = allocate(case, endpoint_sum, "v", strategy=UniqueInitializer(1))
    vv = v.asnumpy()
    expect = vv[mesh.e2v.table].sum(axis=1)
    verify(case, endpoint_sum, v, ref=expect)


def test_unstructured_scan(case_mesh):
    """scan_operator over the vertical axis of a (Vertex, K) field -- the
    unstructured-horizontal scan (reference: scan over unstructured
    domains, next/ffront/decorator.py scan_operator)."""
    case, _ = case_mesh

    @scan_operator(axis=K, forward=True, init=0.0)
    def cumsum(carry: float, x: float) -> float:
        return carry + x

    nv, nk = case.size(Vertex), 6
    rng = np.random.default_rng(5)
    data = rng.random((nv, nk))
    q = as_field((Vertex, K), data)
    r = cumsum(q)
    np.testing.assert_allclose(r.asnumpy(), np.cumsum(data, axis=1), rtol=1e-14)


def test_unstructured_scan_with_neighbor_reduction(case_mesh):
    """Compose: reduce edge values onto vertices, then scan the resulting
    (Vertex, K) field down the column."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def gather(e: Field[Dims[Edge, K], float64]) -> Field[Dims[Vertex, K], float64]:
        return neighbor_sum(e(V2E), axis=V2E)

    @scan_operator(axis=K, forward=False, init=0.0)
    def back_cumsum(carry: float, x: float) -> float:
        return carry + x

    rng = np.random.default_rng(6)
    nk = 6
    data = rng.random((mesh.n_edges, nk))
    e = as_field((Edge, K), data)
    g = gather(e)

    tab = mesh.v2e.table
    mask = tab != mesh.v2e.skip_value
    expect_g = np.einsum(
        "vs,vsk->vk", mask.astype(float), data[np.clip(tab, 0, None)]
    )
    np.testing.assert_allclose(g.asnumpy(), expect_g, rtol=1e-13)

    r = back_cumsum(g)
    expect = np.flip(np.cumsum(np.flip(expect_g, axis=1), axis=1), axis=1)
    np.testing.assert_allclose(r.asnumpy(), expect, rtol=1e-13)


def test_skip_value_mesh_matches_reference_layout():
    mesh = SimpleMesh.make()
    # corners of the 3x3 patch have exactly 2 edges, interior vertex 4
    counts = (mesh.v2e.table != -1).sum(axis=1)
    assert counts[0] == 2 and counts[4] == 4
    assert mesh.v2e.max_neighbors == 4
