"""Hypothesis-driven operator suites (next-DSL analog of the cartesian
StencilTestSuite harness -- reference: cartesian/testing/suites.py).

Each suite declares just the operator; the harness derives input
structure from its typed signature, draws shapes / domain offsets /
values, and checks every backend against the numpy oracle (values,
dims AND result domains)."""

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dims, Field, concat_where, where
from gt4py_tpu.next.suites import OperatorTestSuite

I = gtx.Dimension("I")
J = gtx.Dimension("J")
K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
Koff = gtx.FieldOffset("Koff", source=K, target=(K,))
F64 = Field[Dims[I, J, K], gtx.float64]
F32 = Field[Dims[I, J, K], gtx.float32]


@gtx.field_operator
def _lap(a: F64) -> F64:
    return a(Ioff[1]) + a(Ioff[-1]) + a(Joff[1]) + a(Joff[-1]) - 4.0 * a


class TestLapSuite(OperatorTestSuite):
    operator = _lap


@gtx.field_operator
def _limited_flux(a: F64, b: F64, w: gtx.float64) -> F64:
    fx = a(Ioff[1]) - a
    lim = where(fx * (b(Ioff[1]) - b) > 0.0, 0.0, fx)
    return lim * w + gtx.minimum(a, b)


class TestLimiterSuite(OperatorTestSuite):
    operator = _limited_flux


@gtx.field_operator
def _pair(a: F32) -> tuple[F32, F32]:
    mid = a(Ioff[1]) + a(Ioff[-1]) - 2.0 * a
    return (mid + a, mid - a)


class TestTupleSuite(OperatorTestSuite):
    operator = _pair


@gtx.field_operator
def _bc(a: F64) -> F64:
    interior = 0.5 * (a(Koff[-1]) + a)
    return concat_where(K < 1, a * 10.0, interior)


class TestConcatWhereSuite(OperatorTestSuite):
    operator = _bc


@gtx.scan_operator(axis=K, forward=True, init=0.0)
def _damped(carry: gtx.float64, x: gtx.float64) -> gtx.float64:
    return carry * 0.8 + x


class TestScanSuite(OperatorTestSuite):
    operator = _damped
    dims = (I, J, K)
    shape_range = (3, 8)
