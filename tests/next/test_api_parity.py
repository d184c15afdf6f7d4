"""Reference __all__ parity of gt4py_tpu.next: every public name the
reference exports (src/gt4py/next/__init__.py) that maps to a capability
here must exist and behave (CartesianConnectivity, GridType, IndexType,
domain/unit_range helpers, is_scalar_type, neg, module-level
wait_for_compilation)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dims, Field


I = gtx.Dimension("I")
J = gtx.Dimension("J")


def test_reference_all_coverage():
    # the reference's __all__ minus deliberately-absent machinery
    # (device plumbing, iterator/ITIR modules, dace/gtfn module handles)
    ref_names = """
        CartesianConnectivity Connectivity Dimension DimensionKind Dims
        Domain Field FieldOffset GridType IndexType UnitRange abs arccos
        arccosh arcsin arcsinh arctan arctanh as_connectivity as_field
        astype broadcast cbrt ceil cos cosh domain empty exp
        field_operator float32 float64 floor fmod full gamma int16 int32
        int64 int8 is_scalar_type isfinite isinf isnan log max_over
        maximum min_over minimum neg neighbor_sum ones power program
        scan_operator sin sinh sqrt tan tanh trunc uint16 uint32 uint64
        uint8 unit_range wait_for_compilation where zeros
    """.split()
    missing = [n for n in ref_names if not hasattr(gtx, n)]
    assert not missing, f"missing reference exports: {missing}"


def test_unit_range_and_domain():
    assert gtx.unit_range(5) == gtx.UnitRange(0, 5)
    assert gtx.unit_range((2, 7)) == gtx.UnitRange(2, 7)
    assert gtx.unit_range(range(1, 4)) == gtx.UnitRange(1, 4)
    with pytest.raises(ValueError, match="step"):
        gtx.unit_range(range(0, 10, 2))
    d = gtx.domain({I: 4, J: (1, 5)})
    assert d[I] == gtx.UnitRange(0, 4) and d[J] == gtx.UnitRange(1, 5)


def test_grid_type_and_index_type():
    assert gtx.GridType.CARTESIAN.value == "cartesian"
    assert gtx.GridType.UNSTRUCTURED.value == "unstructured"
    assert np.dtype(gtx.IndexType) == np.dtype(np.int32)


def test_is_scalar_type():
    assert gtx.is_scalar_type(3) and gtx.is_scalar_type(np.float32(1.5))
    assert gtx.is_scalar_type(np.int64)
    assert not gtx.is_scalar_type(np.zeros(3))
    assert not gtx.is_scalar_type(gtx.as_field((I,), np.zeros(3)))


@pytest.mark.parametrize("alloc", ["numpy", "jax"])
def test_cartesian_connectivity_shift(alloc):
    f = gtx.as_field((I,), np.arange(8.0) ** 2, allocator=alloc)
    shifted = f(gtx.CartesianConnectivity(I, 1))
    d = (shifted - f).asnumpy()
    raw = f.asnumpy()
    np.testing.assert_array_equal(d, raw[1:] - raw[:-1])
    # premap composes cartesian connectivities too
    same = f.premap(gtx.CartesianConnectivity(I, 0))
    np.testing.assert_array_equal(same.asnumpy(), raw)
    with pytest.raises(NotImplementedError):
        gtx.CartesianConnectivity(I, 1, codomain=J)


@pytest.mark.parametrize("alloc", ["numpy", "jax"])
def test_neg_builtin_in_operator(alloc):
    @gtx.field_operator
    def negate(a: Field[Dims[I], gtx.float64]) -> Field[Dims[I], gtx.float64]:
        return gtx.neg(a) + 1.0

    f = gtx.as_field((I,), np.arange(5.0), allocator=alloc)
    np.testing.assert_array_equal(negate(f).asnumpy(), 1.0 - np.arange(5.0))
    # int-preserving like abs
    @gtx.field_operator
    def negi(a: Field[Dims[I], gtx.int64]) -> Field[Dims[I], gtx.int64]:
        return gtx.neg(a)

    fi = gtx.as_field((I,), np.arange(5), allocator=alloc)
    out = negi(fi)
    assert out.dtype == np.dtype(np.int64)


def test_module_level_wait_for_compilation():
    @gtx.field_operator
    def op(a: Field[Dims[I], gtx.float64]) -> Field[Dims[I], gtx.float64]:
        return a * 2.0

    @gtx.program
    def prog(a: Field[Dims[I], gtx.float64], out: Field[Dims[I], gtx.float64]):
        op(a, out=out)

    a = gtx.as_field((I,), np.arange(6.0))
    p = prog.with_backend("jax_jit")
    p.compile((a, gtx.as_field((I,), np.zeros(6))), wait=False)
    gtx.wait_for_compilation()          # drains ALL pools, module-level
    out = gtx.as_field((I,), np.zeros(6))
    p(a, out)
    np.testing.assert_array_equal(out.asnumpy(), 2.0 * np.arange(6.0))
