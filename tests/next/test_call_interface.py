"""Operator call interface: arbitrary positional/keyword argument mixes
(reference: tests/next_tests/.../test_arg_call_interface.py permutation
tests), from Python, from operators, from programs, and on scans."""

import itertools

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Field,
    as_field,
    field_operator,
    program,
    scan_operator,
    zeros,
)
from gt4py_tpu.next.frontend import FieldViewError
from gt4py_tpu.next.type_system import Dims

I = Dimension("I")
K = Dimension("K", kind=DimensionKind.VERTICAL)
IF = Field[Dims[I], np.float64]


@field_operator
def _fo(a: IF, b: IF, c: IF) -> IF:
    return a * 2.0 * b - c


def _vals():
    return {
        n: as_field((I,), np.random.default_rng(i).random(5))
        for i, n in enumerate("abc")
    }


def _perms(names):
    for npos in range(len(names) + 1):
        for kw in itertools.permutations(names[npos:]):
            yield names[:npos], kw


@pytest.mark.parametrize("spec", list(_perms(("a", "b", "c"))))
def test_python_call_permutations(spec):
    vals = _vals()
    expect = vals["a"].asnumpy() * 2 * vals["b"].asnumpy() - vals["c"].asnumpy()
    pos_names, kw_names = spec
    r = _fo(*[vals[n] for n in pos_names], **{n: vals[n] for n in kw_names})
    np.testing.assert_array_equal(r.asnumpy(), expect)


def test_call_errors():
    vals = _vals()
    with pytest.raises(TypeError, match="multiple values"):
        _fo(vals["a"], a=vals["a"], b=vals["b"], c=vals["c"])
    with pytest.raises(TypeError, match="unexpected keyword"):
        _fo(vals["a"], vals["b"], vals["c"], d=1.0)
    with pytest.raises(TypeError, match="missing arguments"):
        _fo(vals["a"], b=vals["b"])
    with pytest.raises(FieldViewError, match="takes 3 arguments"):
        _fo(vals["a"])


def test_kwargs_in_operator_from_operator():
    @field_operator
    def outer(a: IF, b: IF, c: IF) -> IF:
        return _fo(a, c=c, b=b)

    vals = _vals()
    expect = vals["a"].asnumpy() * 2 * vals["b"].asnumpy() - vals["c"].asnumpy()
    r = outer(vals["a"], vals["b"], vals["c"])
    np.testing.assert_array_equal(r.asnumpy(), expect)


def test_kwargs_in_program_call():
    @program
    def prog(a: IF, b: IF, c: IF, out: IF):
        _fo(a, b=b, c=c, out=out)

    vals = _vals()
    expect = vals["a"].asnumpy() * 2 * vals["b"].asnumpy() - vals["c"].asnumpy()
    o = zeros({I: 5})
    prog(vals["a"], vals["b"], vals["c"], o)
    np.testing.assert_array_equal(o.asnumpy(), expect)


def test_scan_call_kwargs():
    @scan_operator(axis=K, forward=True, init=0.0)
    def sc(carry: np.float64, x: np.float64, w: np.float64) -> np.float64:
        return carry + x * w

    xk = as_field((K,), np.arange(4.0))
    wk = as_field((K,), np.ones(4) * 2)
    r1 = sc(xk, wk)
    for r in (sc(x=xk, w=wk), sc(xk, w=wk)):
        np.testing.assert_array_equal(r.asnumpy(), r1.asnumpy())
