"""Domain inference (access extents) tests.

Reference analog: transforms/infer_domain.py + past_process_args --
input domains derived from the output domain and operator offsets.
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Dims,
    Domain,
    Field,
    FieldOffset,
    UnitRange,
    as_field,
    field_operator,
    program,
    scan_operator,
    zeros,
)
from gt4py_tpu.next.extents import FULL, operator_extents, required_domains
from gt4py_tpu.next.frontend import FieldViewError

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Joff = FieldOffset("Joff", source=J, target=(J,))

IJ = Field[Dims[I, J], gtx.float64]


@field_operator
def lap(f: IJ) -> IJ:
    return -4.0 * f + f(Ioff[1]) + f(Ioff[-1]) + f(Joff[1]) + f(Joff[-1])


@field_operator
def laplap(f: IJ) -> IJ:
    return lap(lap(f))


def test_extents_single_op():
    ext = operator_extents(lap)
    assert ext["f"][I] == (-1, 1)
    assert ext["f"][J] == (-1, 1)


def test_extents_compose_through_calls():
    ext = operator_extents(laplap)
    assert ext["f"][I] == (-2, 2)
    assert ext["f"][J] == (-2, 2)


def test_required_domains():
    out = Domain((I, J), (UnitRange(0, 10), UnitRange(0, 8)))
    req = required_domains(laplap, out)
    assert req["f"][I] == UnitRange(-2, 12)
    assert req["f"][J] == UnitRange(-2, 10)


def test_scan_marks_axis_full():
    @scan_operator(axis=K, forward=True, init=0.0)
    def cum(c: float, x: float) -> float:
        return c + x

    @field_operator
    def wrap(f: Field) -> Field:
        return cum(f)

    ext = operator_extents(wrap)
    assert ext["f"][K] is FULL


def test_connectivity_marks_dim_full():
    E = Dimension("Edge")
    V = Dimension("Vertex")
    V2E = gtx.as_connectivity(np.array([[0, 1]]), source=V, codomain=E)

    @field_operator
    def g(e: Field) -> Field:
        return gtx.neighbor_sum(e(V2E), axis=V2E)

    ext = operator_extents(g)
    assert ext["e"][E] is FULL


def test_program_rejects_uncovered_halo():
    @program
    def prog(f: IJ, o: IJ):
        lap(f, out=o)

    f = as_field((I, J), np.random.default_rng(0).random((10, 10)))
    out = zeros({I: 10, J: 10})  # same domain: halo not covered
    with pytest.raises(FieldViewError, match="must cover"):
        prog(f, out)

    # with a properly haloed input it runs
    f2 = as_field((I, J), np.zeros((12, 12)), origin={I: 1, J: 1})
    prog(f2, out)  # out [0,10) needs f2 [-1,11): satisfied

    # or with an explicit restricted domain (closure-bound)
    out2 = zeros({I: 10, J: 10})
    dom = Domain((I, J), (UnitRange(1, 9), UnitRange(1, 9)))

    @program
    def prog_dom2(f: IJ, o: IJ):
        lap(f, out=o, domain=dom)

    prog_dom2(f, out2)
    inner = out2.asnumpy()[1:9, 1:9]
    x = f.asnumpy()
    expected = (
        -4.0 * x[1:-1, 1:-1] + x[2:, 1:-1] + x[:-2, 1:-1] + x[1:-1, 2:] + x[1:-1, :-2]
    )
    np.testing.assert_allclose(inner, expected, rtol=1e-14)


def test_program_dict_domain_literal():
    """domain={I: (0, n)} dict literals parse, type-check and execute
    (reference: past_passes accept dict domain= arguments)."""

    @field_operator
    def shift(x: IJ) -> IJ:
        return x(Ioff[1])

    @program
    def prog(x: IJ, o: IJ):
        shift(x, out=o, domain={I: (0, 4), J: (0, 4)})

    x = as_field((I, J), np.arange(20.0).reshape(5, 4))
    o = zeros({I: 4, J: 4})
    prog(x, o)
    np.testing.assert_array_equal(o.asnumpy(), x.asnumpy()[1:])

    # bad key type rejected with location
    with pytest.raises(FieldViewError, match="keys must be dimensions"):
        @program
        def bad(x: IJ, o: IJ):
            shift(x, out=o, domain={1: (0, 4)})

    # bad range rejected
    with pytest.raises(FieldViewError, match="integer"):
        @program
        def bad2(x: IJ, o: IJ):
            shift(x, out=o, domain={I: (0.0, 4.0)})


def test_concat_where_vertical_demand_is_piecewise():
    """The domain checker must NOT hull a concat_where branch's vertical
    offsets over the whole out domain: the interior branch's K-1 read
    under ``K < 1`` needs no extra plane (runtime piece algebra
    validates exactly).  r5: previously such programs were rejected with
    'must cover K[-1:...)' unless the caller passed domain=."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, backends, concat_where, program

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Koff = gtx.FieldOffset("Koff", source=K, target=(K,))
    F = Field[Dims[I, J, K], gtx.float64]

    @gtx.field_operator
    def bc_op(lap: F, sfc: F) -> F:
        return concat_where(K < 1, sfc * 10.0, lap(Koff[-1]) + lap)

    @program
    def prog(lap: F, sfc: F, b: F):
        bc_op(lap, sfc, out=b)

    N, M, NK = 8, 6, 5
    rng = np.random.default_rng(0)

    def mk(wrap):
        dom = gtx.Domain(
            (I, J, K),
            (gtx.UnitRange(0, N), gtx.UnitRange(0, M), gtx.UnitRange(0, NK)),
        )
        return (
            gtx.Field(dom, wrap(rng.random((N, M, NK)))),
            gtx.Field(dom, wrap(rng.random((N, M, NK)))),
            gtx.Field(dom, wrap(np.zeros((N, M, NK)))),
        )

    rng = np.random.default_rng(0)
    refs = mk(np.asarray)
    prog.with_backend(backends.numpy_oracle)(*refs)  # exact-cover buffers pass
    rng = np.random.default_rng(0)
    gots = mk(jnp.asarray)
    prog.with_backend(backends.jax_jit)(*gots)
    np.testing.assert_allclose(
        gots[2].asnumpy(), refs[2].asnumpy(), rtol=1e-12, atol=0
    )
