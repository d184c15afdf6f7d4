"""concat_where / premap / as_offset / numpy-oracle allocator tests.

Reference semantics: src/gt4py/next/ffront/experimental.py (as_offset :17,
concat_where :22) with the embedded implementations in
embedded/nd_array_field.py (_concat_where :905, premap :240,
_as_offset :944) and Dimension comparison operators common.py:95-118.
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Domain,
    FieldOffset,
    UnitRange,
    as_connectivity,
    as_field,
    as_offset,
    broadcast,
    concat_where,
    premap,
)

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Koff = FieldOffset("Koff", source=K, target=(K,))

ALLOCATORS = [None, "numpy"]  # jax product path + embedded numpy oracle


def test_dimension_comparisons_build_domains():
    d = K < 5
    assert isinstance(d, Domain)
    assert d.dims == (K,)
    assert d.ranges[0].stop == 5 and not d.ranges[0].is_finite
    assert (K >= 2).ranges[0].start == 2
    assert (K == 3).ranges[0] == UnitRange(3, 4)
    assert (K <= 3).ranges[0].stop == 4
    assert (K > 3).ranges[0].start == 4
    # dim-to-dim comparison stays boolean
    assert (K == K) is True
    assert K != I
    with pytest.raises(TypeError):
        K != 3


@pytest.mark.parametrize("alloc", ALLOCATORS)
def test_concat_where_scalar_boundary(alloc):
    f = as_field((K,), np.arange(10.0), allocator=alloc)
    r = concat_where(K < 3, 100.0, f)
    assert isinstance(r.data, np.ndarray) == (alloc == "numpy")
    np.testing.assert_array_equal(r.asnumpy(), [100, 100, 100, 3, 4, 5, 6, 7, 8, 9])
    # upper boundary via >=
    r2 = concat_where(K >= 8, -1.0, f)
    np.testing.assert_array_equal(r2.asnumpy(), [0, 1, 2, 3, 4, 5, 6, 7, -1, -1])


@pytest.mark.parametrize("alloc", ALLOCATORS)
def test_concat_where_2d(alloc):
    g = as_field((I, K), np.arange(20.0).reshape(4, 5), allocator=alloc)
    h = as_field((I, K), -np.arange(20.0).reshape(4, 5), allocator=alloc)
    r = concat_where(K >= 2, g, h)
    assert r.dims == (I, K)
    np.testing.assert_array_equal(r.asnumpy()[:, :2], h.asnumpy()[:, :2])
    np.testing.assert_array_equal(r.asnumpy()[:, 2:], g.asnumpy()[:, 2:])


def test_concat_where_non_overlapping_fields():
    # boundary-condition pattern: separate fields supply separate regions
    top = as_field((K,), np.full(2, 7.0))  # K [0,2)
    rest = as_field((K,), np.arange(8.0), origin={K: -2})  # K [2,10)
    r = concat_where(K < 2, top, rest)
    assert r.domain[K] == UnitRange(0, 10)
    np.testing.assert_array_equal(r.asnumpy(), [7, 7, 0, 1, 2, 3, 4, 5, 6, 7])


def test_concat_where_gap_is_error():
    top = as_field((K,), np.full(2, 7.0))  # [0,2)
    rest = as_field((K,), np.arange(5.0), origin={K: -4})  # [4,9)
    with pytest.raises(ValueError, match="non-contiguous"):
        concat_where(K < 2, top, rest)


def test_concat_where_tuple_and_errors():
    f = as_field((K,), np.arange(4.0))
    g = as_field((K,), np.ones(4))
    rt = concat_where(K < 2, (f, g), (g, f))
    assert isinstance(rt, tuple) and len(rt) == 2
    np.testing.assert_array_equal(rt[0].asnumpy(), [0, 1, 1, 1])
    with pytest.raises(NotImplementedError, match="1D domain"):
        concat_where(Domain((I, K), (UnitRange(0, 1), UnitRange(0, 1))), 1.0, 2.0)
    with pytest.raises(ValueError, match="unbounded"):
        concat_where(K < 2, 1.0, 2.0)


@pytest.mark.parametrize("alloc", ALLOCATORS)
def test_as_offset_dynamic_shift(alloc):
    idx = as_field((K,), np.array([2, -1, 0, 1, 0], dtype=np.int64), allocator=alloc)
    data = as_field((K,), np.array([10.0, 20.0, 30.0, 40.0, 50.0]), allocator=alloc)
    shifted = data(as_offset(Koff, idx))
    np.testing.assert_array_equal(shifted.asnumpy(), [30, 10, 30, 50, 50])
    assert shifted.dims == (K,)


def test_as_offset_requires_integer_field():
    bad = as_field((K,), np.arange(3.0))
    with pytest.raises(TypeError, match="integer"):
        as_offset(Koff, bad)


@pytest.mark.parametrize("alloc", ALLOCATORS)
def test_premap_gather(alloc):
    Vertex, Edge = Dimension("Vertex"), Dimension("Edge")
    conn = as_connectivity(
        np.array([[0, 1], [1, 2], [2, 0]]),
        source=Edge, codomain=Vertex, allocator=alloc,
    )
    vf = as_field((Vertex,), np.array([1.0, 2.0, 3.0]), allocator=alloc)
    pm = premap(vf, conn)
    assert pm.asnumpy().tolist() == [[1, 2], [2, 3], [3, 1]]
    assert pm.dims[0] == Edge and pm.dims[1].kind == DimensionKind.LOCAL


def test_premap_errors():
    vf = as_field((I,), np.arange(4.0))
    conn = as_connectivity(np.array([[0]]), source=J, codomain=K)
    with pytest.raises(ValueError, match="codomain"):
        vf.premap(conn)
    with pytest.raises(ValueError, match="duplicate"):
        c2 = as_connectivity(np.array([[0]]), source=J, codomain=I)
        vf.premap(c2, c2)


def test_oracle_matches_product_on_composition():
    """The numpy-backed oracle and jax-backed product path run the same
    Field code; results must agree exactly."""
    from gt4py_tpu.next import where

    rng = np.random.default_rng(0)
    fa, ga = rng.random((10, 6)), rng.random((10, 6))

    def pipeline(f, g):
        lap = f(Ioff[1]) + f(Ioff[-1]) - 2.0 * f
        sel = where(g > 0.5, lap, 0.0)
        return concat_where(K < 1, 99.0, sel)

    r_jax = pipeline(as_field((I, K), fa), as_field((I, K), ga))
    r_np = pipeline(
        as_field((I, K), fa, allocator="numpy"),
        as_field((I, K), ga, allocator="numpy"),
    )
    assert isinstance(r_np.data, np.ndarray)
    assert not isinstance(r_jax.data, np.ndarray)
    np.testing.assert_array_equal(r_np.asnumpy(), r_jax.asnumpy())
    assert r_np.dims == r_jax.dims == (I, K)


def test_scan_oracle_matches_product():
    from gt4py_tpu.next import scan_operator

    @scan_operator(axis=K, forward=False, init=0.0)
    def acc(c: float, x: float, w: float) -> float:
        return c * w + x

    rng = np.random.default_rng(1)
    q = rng.random((4, 7))
    r_jax = acc(as_field((I, K), q), 0.5)
    r_np = acc(as_field((I, K), q, allocator="numpy"), 0.5)
    assert isinstance(r_np.data, np.ndarray)
    np.testing.assert_array_equal(r_np.asnumpy(), r_jax.asnumpy())


def test_field_restrict_getitem():
    f = as_field((I, K), np.arange(20.0).reshape(4, 5))
    sub = f[Domain((K,), (UnitRange(1, 3),))]
    assert sub.domain[K] == UnitRange(1, 3)
    assert sub.domain[I] == UnitRange(0, 4)
    np.testing.assert_array_equal(sub.asnumpy(), f.asnumpy()[:, 1:3])
    # relative indexing drops the dimension (tests/next/test_field_indexing.py
    # covers the full index-spec surface)
    assert f[0].dims == (K,)


def test_gamma_and_cbrt_builtins():
    """gamma/cbrt complete the reference fbuiltins math set
    (src/gt4py/next/ffront/fbuiltins.py:326-348)."""
    import scipy.special as sps

    from gt4py_tpu.next import Dimension, Field, as_field, field_operator
    from gt4py_tpu.next.builtins import cbrt, gamma

    I = Dimension("I")
    vals = np.array([0.5, 1.0, 2.5, -0.5])
    for alloc in ("numpy", "jax"):
        f = as_field((I,), vals.copy(), allocator=alloc)
        np.testing.assert_allclose(gamma(f).asnumpy(), sps.gamma(vals), rtol=1e-10)
        np.testing.assert_allclose(cbrt(f).asnumpy(), np.cbrt(vals), rtol=1e-12)

    @field_operator
    def op(a: Field) -> Field:
        return gamma(a) + cbrt(a)

    f = as_field((I,), vals.copy())
    np.testing.assert_allclose(
        op(f).asnumpy(), sps.gamma(vals) + np.cbrt(vals), rtol=1e-10
    )


def test_where_scalar_operands_under_jit():
    """where() on all-scalar operands must stage under jax.jit (review
    fix: np.where raised TracerArrayConversionError on tracers)."""
    import jax

    from gt4py_tpu.next.builtins import where

    assert where(np.bool_(True), 1.0, 2.0) == 1.0

    @jax.jit
    def f(s):
        return where(s > 0.25, 1.0, 2.0)

    assert float(f(0.5)) == 1.0
    assert float(f(0.1)) == 2.0


@pytest.mark.parametrize("alloc", ALLOCATORS)
def test_where_tuple_branches(alloc):
    """where() distributes over tuple branches (reference
    WhereBuiltinFunction, fbuiltins.py:219-252)."""
    from gt4py_tpu.next.builtins import where

    a = as_field((I, K), np.arange(12.0).reshape(3, 4), allocator=alloc)
    b = as_field((I, K), -np.ones((3, 4)), allocator=alloc)
    m = a > 5.0
    t1, t2 = where(m, (a, b), (b, a))
    np.testing.assert_array_equal(
        t1.asnumpy(), np.where(a.asnumpy() > 5.0, a.asnumpy(), b.asnumpy())
    )
    np.testing.assert_array_equal(
        t2.asnumpy(), np.where(a.asnumpy() > 5.0, b.asnumpy(), a.asnumpy())
    )
    with pytest.raises(TypeError):
        where(m, (a, b), a)
    with pytest.raises(TypeError):
        where(m, (a, b), (a, b, a))


def test_where_tuple_in_operator():
    """Tuple-valued where() through the parsed frontend + jit backend."""
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, backends

    @gtx.field_operator
    def swap(
        a: Field[Dims[I, K], gtx.float64], b: Field[Dims[I, K], gtx.float64]
    ) -> tuple[Field[Dims[I, K], gtx.float64], Field[Dims[I, K], gtx.float64]]:
        return gtx.where(a > 5.0, (a, b), (b, a))

    a = as_field((I, K), np.arange(12.0).reshape(3, 4))
    b = as_field((I, K), -np.ones((3, 4)))
    hi, lo = swap.with_backend(backends.jax_jit)(a, b)
    np.testing.assert_array_equal(
        hi.asnumpy(), np.where(a.asnumpy() > 5.0, a.asnumpy(), b.asnumpy())
    )
    np.testing.assert_array_equal(
        lo.asnumpy(), np.where(a.asnumpy() > 5.0, b.asnumpy(), a.asnumpy())
    )


def test_as_scalar():
    """as_scalar() extracts the value of a 0-d field
    (nd_array_field.py:232-237).  Fields deliberately have no __array__
    (matching the reference): numpy-scalar ops must defer to the Field's
    reflected operators, not coerce the data away."""
    f = as_field((I, K), np.arange(12.0).reshape(3, 4))
    assert f[1, 2].as_scalar() == 6.0
    assert isinstance(f[1, 2].as_scalar(), np.float64)
    with pytest.raises(ValueError):
        f.as_scalar()
    # numpy scalar + Field keeps the Field wrapper (reflected op)
    r = np.float64(1.0) + f
    assert hasattr(r, "domain") and r.dims == (I, K)


def test_multi_offset_call():
    """f(off1, off2) applies shifts left-to-right (reference:
    NdArrayField.__call__ reduces over premap, nd_array_field.py:367-376),
    eagerly and inside the parsed DSL."""
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field

    data = np.arange(20.0).reshape(4, 5)
    f = as_field((I, K), data)
    r = f(Ioff[1], Koff[1])
    assert r.domain[I] == UnitRange(-1, 3) and r.domain[K] == UnitRange(-1, 4)

    @gtx.field_operator
    def diag(g: Field[Dims[I, K], gtx.float64]) -> Field[Dims[I, K], gtx.float64]:
        return g(Ioff[1], Koff[1]) - g

    np.testing.assert_array_equal(
        diag(f).asnumpy(), data[1:, 1:] - data[:-1, :-1]
    )
