"""Field-view DSL tests (reference patterns:
tests/next_tests/integration_tests/cases.py verification style)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Field,
    FieldOffset,
    UnitRange,
    as_connectivity,
    as_field,
    broadcast,
    field_operator,
    max_over,
    neighbor_sum,
    program,
    scan_operator,
    where,
    zeros,
)

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Joff = FieldOffset("Joff", source=J, target=(J,))

Vertex = Dimension("Vertex")
Edge = Dimension("Edge")


def test_field_arithmetic_and_domain_intersection():
    a = as_field((I,), np.arange(10.0))
    b = as_field((I,), np.arange(10.0) * 2)

    @field_operator
    def add(x: Field, y: Field) -> Field:
        return x + y

    r = add(a, b)
    np.testing.assert_array_equal(r.asnumpy(), np.arange(10.0) * 3)

    # shifted operand shrinks the domain
    @field_operator
    def diff(x: Field) -> Field:
        return x(Ioff[1]) - x

    d = diff(a)
    assert d.domain[I] == UnitRange(0, 9)
    np.testing.assert_array_equal(d.asnumpy(), np.ones(9))


def test_laplacian_2d():
    rng = np.random.default_rng(0)
    inp = as_field((I, J), rng.random((8, 8)))

    @field_operator
    def lap(f: Field) -> Field:
        return (
            -4.0 * f
            + f(Ioff[1])
            + f(Ioff[-1])
            + f(Joff[1])
            + f(Joff[-1])
        )

    r = lap(inp)
    assert r.domain[I] == UnitRange(1, 7)
    x = inp.asnumpy()
    expected = (
        -4.0 * x[1:-1, 1:-1] + x[2:, 1:-1] + x[:-2, 1:-1] + x[1:-1, 2:] + x[1:-1, :-2]
    )
    np.testing.assert_allclose(r.asnumpy(), expected, rtol=1e-14)


def test_broadcast_and_where():
    a = as_field((I,), np.array([1.0, -2.0, 3.0, -4.0]))

    @field_operator
    def relu(f: Field) -> Field:
        return where(f > 0.0, f, 0.0)

    np.testing.assert_array_equal(relu(a).asnumpy(), [1.0, 0.0, 3.0, 0.0])

    b = broadcast(5.0, (I, J))
    c = as_field((I, J), np.ones((3, 3)))
    np.testing.assert_array_equal((b + c).asnumpy(), np.full((3, 3), 6.0))


def test_out_and_program():
    a = as_field((I,), np.arange(6.0))
    out = zeros({I: 6})

    @field_operator
    def double(f: Field) -> Field:
        return f * 2.0

    @program
    def prog(f: Field, o: Field):
        double(f, out=o)

    prog(a, out)
    np.testing.assert_array_equal(out.asnumpy(), np.arange(6.0) * 2)


def test_unstructured_neighbor_sum():
    """Edge-to-vertex gather + reduction over an unstructured mesh
    (reference: Connectivity semantics, next/common.py:964-1122)."""
    # a tiny mesh: 4 vertices, 4 edges in a ring; each vertex touches 2 edges
    v2e_table = np.array([[0, 3], [0, 1], [1, 2], [2, 3]])
    V2E = as_connectivity(v2e_table, source=Vertex, codomain=Edge)

    edge_vals = as_field((Edge,), np.array([10.0, 20.0, 30.0, 40.0]))

    @field_operator
    def sum_edges(e: Field) -> Field:
        return neighbor_sum(e(V2E), axis=V2E)

    r = sum_edges(edge_vals)
    np.testing.assert_array_equal(r.asnumpy(), [50.0, 30.0, 50.0, 70.0])


def test_neighbor_sum_with_skip_values():
    v2e_table = np.array([[0, 1], [1, -1]])  # second vertex has 1 neighbor
    V2E = as_connectivity(v2e_table, source=Vertex, codomain=Edge)
    edge_vals = as_field((Edge,), np.array([5.0, 7.0]))

    @field_operator
    def s(e: Field) -> Field:
        return neighbor_sum(e(V2E), axis=V2E)

    np.testing.assert_array_equal(s(edge_vals).asnumpy(), [12.0, 7.0])

    @field_operator
    def m(e: Field) -> Field:
        return max_over(e(V2E), axis=V2E)

    np.testing.assert_array_equal(m(edge_vals).asnumpy(), [7.0, 7.0])


def test_scan_operator_cumsum():
    rng = np.random.default_rng(1)
    q = as_field((I, K), rng.random((4, 7)))

    @scan_operator(axis=K, forward=True, init=0.0)
    def cumsum(carry: float, x: float) -> float:
        return carry + x

    r = cumsum(q)
    np.testing.assert_allclose(r.asnumpy(), np.cumsum(q.asnumpy(), axis=1), rtol=1e-14)


def test_scan_operator_backward_and_scalar_arg():
    q = as_field((K,), np.ones(5))

    @scan_operator(axis=K, forward=False, init=0.0)
    def back_acc(carry: float, x: float, w: float) -> float:
        return carry * w + x

    r = back_acc(q, 0.5)
    # backward: r[4]=1, r[3]=1.5, r[2]=1.75, ...
    expected = np.array([1.9375, 1.875, 1.75, 1.5, 1.0])
    np.testing.assert_allclose(r.asnumpy(), expected, rtol=1e-14)


def test_tridiagonal_solve_scan():
    """Thomas algorithm as two scan_operators (the reference's canonical
    scan example)."""
    rng = np.random.default_rng(2)
    shape = (3, 8)
    a = as_field((I, K), rng.random(shape) * 0.1)
    b = as_field((I, K), 2.0 + rng.random(shape))
    c = as_field((I, K), rng.random(shape) * 0.1)
    d = as_field((I, K), rng.random(shape))

    @scan_operator(axis=K, forward=True, init=(0.0, 0.0))
    def fwd(carry, a_k, b_k, c_k, d_k):
        cp_prev, dp_prev = carry
        denom = b_k - a_k * cp_prev
        return (c_k / denom, (d_k - a_k * dp_prev) / denom)

    @scan_operator(axis=K, forward=False, init=0.0)
    def bwd(x_next, cp_k, dp_k):
        return dp_k - cp_k * x_next

    cp, dp = fwd(a, b, c, d)
    x = bwd(cp, dp).asnumpy()

    an, bn, cn, dn = (f.asnumpy() for f in (a, b, c, d))
    recon = bn * x
    recon[:, 1:] += an[:, 1:] * x[:, :-1]
    recon[:, :-1] += cn[:, :-1] * x[:, 1:]
    np.testing.assert_allclose(recon, dn, rtol=1e-10, atol=1e-12)


def test_jit_composition():
    """Field operators compose under jax.jit (Field is a pytree)."""
    import jax

    a = as_field((I,), np.arange(8.0))

    @field_operator
    def f(x: Field) -> Field:
        return x * 2.0 + 1.0

    jitted = jax.jit(lambda x: f(x))
    r = jitted(a)
    assert isinstance(r, Field)
    np.testing.assert_array_equal(r.asnumpy(), np.arange(8.0) * 2 + 1)


def test_where_weak_literal_keeps_field_dtype():
    """where(cond, 0.0, f32_field) must stay float32: builtin-call
    arguments with weak types are cast to the deduced operand kind like
    binary-operator operands (regression: np.float64(0.0) literal
    materialization silently upcast whole f32 pipelines to f64)."""
    import numpy as np

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, where

    I = gtx.Dimension("I")
    FT = Field[Dims[I], gtx.float32]

    @gtx.field_operator
    def clip(f: FT) -> FT:
        g = where(f > 0.5, 0.0, f)
        return gtx.maximum(g, 0.25)

    for alloc in (None, "numpy"):
        f = gtx.as_field((I,), np.linspace(0, 1, 7, dtype=np.float32),
                         allocator=alloc)
        r = clip(f)
        assert r.dtype == np.float32, (alloc, r.dtype)
        np.testing.assert_array_equal(
            r.asnumpy(),
            np.maximum(
                np.where(f.asnumpy() > 0.5, np.float32(0.0), f.asnumpy()),
                np.float32(0.25),
            ),
        )


def test_where_tuple_weak_literal_keeps_dtype():
    """Weak literals inside TUPLE where() branches cast member-by-member
    (per-member operand kinds recorded by the typing rule)."""
    import numpy as np

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, where

    I = gtx.Dimension("I")
    FT = Field[Dims[I], gtx.float32]

    @gtx.field_operator
    def tup(f: FT) -> tuple[FT, FT]:
        return where(f > 0.5, (0.0, f), (f, 0.0))

    for alloc in (None, "numpy"):
        f = gtx.as_field((I,), np.linspace(0, 1, 5, dtype=np.float32),
                         allocator=alloc)
        a, b = tup(f)
        assert a.dtype == np.float32 and b.dtype == np.float32, alloc


def test_weak_result_into_integer_out_rejected():
    """A weak (all-literal) float result adapts to FLOAT out dtypes but
    is rejected for integer/bool outs (silent truncation)."""
    import numpy as np
    import pytest as _pytest

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, where
    from gt4py_tpu.next.frontend import FieldViewError

    I = gtx.Dimension("I")
    FT = Field[Dims[I], gtx.float64]

    @gtx.field_operator
    def wf(f: FT):
        return where(f > 0.0, 0.75, 1.25)

    # rejected at definition time (param annotations are complete)
    with _pytest.raises(FieldViewError, match="cannot write"):

        @gtx.program
        def to_int(f: FT, o: Field[Dims[I], gtx.int32]):
            wf(f, out=o)

    @gtx.program
    def to_f32(f: FT, o: Field[Dims[I], gtx.float32]):
        wf(f, out=o)

    o = gtx.as_field((I,), np.zeros(5, np.float32))
    to_f32(gtx.as_field((I,), np.ones(5)), o)
    assert o.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(o.ndarray), np.full(5, 0.75, np.float32))
