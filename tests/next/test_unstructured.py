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
    E2VDim,
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


# --------------------------------------------------------------------- #
# round 3: reference multi-feature patterns (VERDICT #7) --
# multi-hop connectivity chains, reductions over composite expressions,
# where inside reductions, sparse outputs, sparse+scan compositions
# (reference: tests/next_tests/integration_tests/feature_tests/
# ffront_tests/test_reductions.py, test_external_local_field.py,
# test_execution.py composed-shift cases)
# --------------------------------------------------------------------- #

from gt4py_tpu.next import FieldOffset, broadcast, max_over, min_over, where


def _v2e_ref(mesh, edge_vals, reduce_fn):
    """numpy oracle for a skip-aware V2E reduction of per-edge values."""
    tab = mesh.v2e.table
    mask = tab != mesh.v2e.skip_value
    gathered = edge_vals[np.clip(tab, 0, None)]
    return reduce_fn(gathered, mask)


def test_max_over_min_over_with_skip_values(case_mesh):
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def vmax(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return max_over(e(V2E), axis=V2E)

    @field_operator
    def vmin(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return min_over(e(V2E), axis=V2E)

    rng = np.random.default_rng(31)
    ev = rng.normal(size=mesh.n_edges)  # negative values: skips must not win
    e = as_field((Edge,), ev)
    exp_max = _v2e_ref(mesh, ev, lambda g, m: np.where(m, g, -np.inf).max(axis=1))
    exp_min = _v2e_ref(mesh, ev, lambda g, m: np.where(m, g, np.inf).min(axis=1))
    np.testing.assert_allclose(vmax(e).asnumpy(), exp_max, rtol=1e-14)
    np.testing.assert_allclose(vmin(e).asnumpy(), exp_min, rtol=1e-14)


def test_reduction_over_composite_expression(case_mesh):
    """reference test_reduction_expression_in_call: the reduced operand is
    an arithmetic expression of several sparse gathers, not a bare remap."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def composite(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        tmp = e(V2E)
        return 3.0 * neighbor_sum(-e(V2E) * tmp * 2.0, axis=V2E)

    rng = np.random.default_rng(32)
    ev = rng.random(mesh.n_edges)
    e = as_field((Edge,), ev)
    exp = 3.0 * _v2e_ref(
        mesh, ev, lambda g, m: np.where(m, -g * g * 2.0, 0.0).sum(axis=1)
    )
    np.testing.assert_allclose(composite(e).asnumpy(), exp, rtol=1e-13)


def test_reduction_with_common_subexpression(case_mesh):
    """reference test_reduction_with_common_expression: flux(V2E)+flux(V2E)."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def twice(flux: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(flux(V2E) + flux(V2E), axis=V2E)

    rng = np.random.default_rng(33)
    ev = rng.random(mesh.n_edges)
    exp = 2.0 * _v2e_ref(mesh, ev, lambda g, m: np.where(m, g, 0.0).sum(axis=1))
    np.testing.assert_allclose(
        twice(as_field((Edge,), ev)).asnumpy(), exp, rtol=1e-13
    )


def test_reduction_expression_with_where_and_scalar(case_mesh):
    """reference test_reduction_expression_with_where_and_scalar: a vertex
    mask broadcast against the sparse (Vertex, V2E) operand, scalar arm."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def masked(
        mask: Field[Dims[Vertex], bool], e: Field[Dims[Edge], float64]
    ) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E) + where(mask, e(V2E), 1.0), axis=V2E)

    rng = np.random.default_rng(34)
    ev = rng.random(mesh.n_edges)
    mv = rng.random(mesh.n_vertices) > 0.5
    tab = mesh.v2e.table
    valid = tab != mesh.v2e.skip_value
    g = ev[np.clip(tab, 0, None)]
    exp = np.where(valid, g + np.where(mv[:, None], g, 1.0), 0.0).sum(axis=1)
    got = masked(as_field((Vertex,), mv), as_field((Edge,), ev))
    np.testing.assert_allclose(got.asnumpy(), exp, rtol=1e-13)


def test_multi_hop_remap_chain(case_mesh):
    """reference test_composed_unstructured_shift: two indexed hops
    (Vertex --E2V[0]--> Edge --V2E[1]--> Vertex), chained call and
    multi-offset single call must agree."""
    case, mesh = case_mesh
    E2V, V2E = mesh.e2v, mesh.v2e
    # reference convention: source = the dim the field lives on before the
    # hop (= table codomain), target = (table source, local dim)
    E2V0 = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    V2E1 = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))

    @field_operator
    def chained(v: Field[Dims[Vertex], float64]) -> Field[Dims[Vertex], float64]:
        e = v(E2V0[0])      # first endpoint of each edge
        return e(V2E1[1])   # second incident edge of each vertex

    @field_operator
    def one_call(v: Field[Dims[Vertex], float64]) -> Field[Dims[Vertex], float64]:
        return v(E2V0[0], V2E1[1])

    rng = np.random.default_rng(35)
    vv = rng.random(mesh.n_vertices)
    v = as_field((Vertex,), vv)
    # every vertex of the 3x3 patch has >= 2 incident edges: column 1 of
    # v2e has no skips, so the chain is total
    exp = vv[mesh.e2v.table[:, 0]][mesh.v2e.table[:, 1]]
    for op in (chained, one_call):
        got = op(v, offset_provider={"E2V": E2V, "V2E": V2E})
        np.testing.assert_allclose(got.asnumpy(), exp, rtol=1e-15)


def test_multi_hop_gather_then_reduce(case_mesh):
    """V2E∘E2V composition under a reduction: gather both endpoint values
    of every incident edge and reduce twice (vertex -> its edges -> their
    endpoints)."""
    case, mesh = case_mesh
    V2E, E2V = mesh.v2e, mesh.e2v

    @field_operator
    def two_level(v: Field[Dims[Vertex], float64]) -> Field[Dims[Vertex], float64]:
        endpoint_sum = neighbor_sum(v(E2V), axis=E2V)   # per-edge
        return neighbor_sum(endpoint_sum(V2E), axis=V2E)  # back to vertices

    rng = np.random.default_rng(36)
    vv = rng.random(mesh.n_vertices)
    per_edge = vv[mesh.e2v.table].sum(axis=1)
    exp = _v2e_ref(mesh, per_edge, lambda g, m: np.where(m, g, 0.0).sum(axis=1))
    got = two_level(as_field((Vertex,), vv))
    np.testing.assert_allclose(got.asnumpy(), exp, rtol=1e-13)


def test_sparse_field_output(case_mesh):
    """reference test_write_local_field: an operator may RETURN the sparse
    (Vertex, V2EDim) gather itself."""
    case, mesh = case_mesh
    V2E = mesh.v2e

    @field_operator
    def gather(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex, V2EDim], float64]:
        return e(V2E)

    rng = np.random.default_rng(37)
    ev = rng.random(mesh.n_edges)
    got = gather(as_field((Edge,), ev)).asnumpy()
    tab = mesh.v2e.table
    valid = tab != mesh.v2e.skip_value
    exp = ev[np.clip(tab, 0, None)]
    np.testing.assert_allclose(
        np.where(valid, got, 0.0), np.where(valid, exp, 0.0), rtol=1e-15
    )


def test_sparse_reduction_feeding_scan(case_mesh):
    """sparse + scan composition: a skip-aware neighbor reduction of a 3D
    (Edge, K) field feeds a forward scan with a scalar coefficient."""
    case, mesh = case_mesh
    V2E = mesh.v2e
    nk = 6

    @field_operator
    def gather(e: Field[Dims[Edge, K], float64]) -> Field[Dims[Vertex, K], float64]:
        return neighbor_sum(e(V2E) * 0.5, axis=V2E)

    @scan_operator(axis=K, forward=True, init=0.0)
    def damp(carry: float, x: float, w: float) -> float:
        return carry * w + x

    rng = np.random.default_rng(38)
    data = rng.random((mesh.n_edges, nk))
    g = gather(as_field((Edge, K), data))
    got = damp(g, 0.25).asnumpy()

    tab = mesh.v2e.table
    valid = tab != mesh.v2e.skip_value
    red = np.einsum("vs,vsk->vk", valid.astype(float), 0.5 * data[np.clip(tab, 0, None)])
    exp = np.zeros_like(red)
    acc = np.zeros(mesh.n_vertices)
    for k in range(nk):
        acc = acc * 0.25 + red[:, k]
        exp[:, k] = acc
    np.testing.assert_allclose(got, exp, rtol=1e-13)


def test_reduction_of_k_shifted_sparse_operand(case_mesh):
    """reference test_reduction_execution_with_offset: the reduced operand
    carries a cartesian K shift below the remap."""
    case, mesh = case_mesh
    V2E = mesh.v2e
    Koff = FieldOffset("Koff", source=K, target=(K,))
    nk = 5

    @field_operator
    def shifted_sum(e: Field[Dims[Edge, K], float64]) -> Field[Dims[Vertex, K], float64]:
        return neighbor_sum(e(Koff[1])(V2E), axis=V2E)

    rng = np.random.default_rng(39)
    data = rng.random((mesh.n_edges, nk))
    got = shifted_sum(
        as_field((Edge, K), data), offset_provider={"Koff": K}
    )
    tab = mesh.v2e.table
    valid = tab != mesh.v2e.skip_value
    red = np.einsum(
        "vs,vsk->vk", valid.astype(float), data[np.clip(tab, 0, None)][:, :, 1:]
    )
    # the +1 K shift moves the result's domain to start at K=-1
    # (reference domain semantics); positions K=0..nk-2 hold the
    # shifted reduction
    assert got.domain[K].start == -1
    np.testing.assert_allclose(got.asnumpy()[:, 1:], red, rtol=1e-13)
