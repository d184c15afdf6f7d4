"""FVIR text round-trip: unparse -> reparse through the real frontend
(reference analog: the ITIR pretty printer + pretty parser)."""

import numpy as np

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    Field,
    FieldOffset,
    as_field,
    field_operator,
    neighbor_sum,
    where,
)
from gt4py_tpu.next.type_system import Dims
from gt4py_tpu.next.unparse import reparse, unparse

I = Dimension("I")
J = Dimension("J")
Ioff = FieldOffset("Ioff", source=I, target=(I,))

float64 = np.float64


def test_unparse_reparse_field_operator():
    @field_operator
    def op(a: Field[Dims[I, J], float64], b: Field[Dims[I, J], float64], s: float64
           ) -> Field[Dims[I, J], float64]:
        t0 = a(Ioff[1]) - b
        t1 = where(t0 > 0.25, t0 * s, a + 1.5)
        if 3 > 2:
            t1 = t1 + 0.0
        return t1 - (a * b)

    txt = unparse(op.ir)
    assert "def op(" in txt and "where(" in txt and "Ioff[1]" in txt
    ir2 = reparse(op.ir)
    # idempotent text (canonical form)
    assert unparse(ir2) == txt

    # semantics preserved: interpret both IRs over the same inputs
    from gt4py_tpu.next.interpreter import Interpreter

    rng = np.random.default_rng(0)
    a = as_field((I, J), rng.random((6, 5)))
    b = as_field((I, J), rng.random((6, 5)))

    def run(ir):
        env = dict(ir.closure)
        env.update({"a": a, "b": b, "s": np.float64(0.7)})
        return Interpreter(ir, env).run().asnumpy()

    np.testing.assert_array_equal(run(op.ir), run(ir2))


def test_unparse_reparse_unstructured():
    Vertex = Dimension("Vertex")
    Edge = Dimension("Edge")
    V2E = gtx.as_connectivity(
        np.array([[0, 1], [1, -1]]), source=Vertex, codomain=Edge
    )

    @field_operator
    def s(e: Field[Dims[Edge], float64]) -> Field[Dims[Vertex], float64]:
        return neighbor_sum(e(V2E), axis=V2E)

    ir2 = reparse(s.ir)
    assert unparse(ir2) == unparse(s.ir)
