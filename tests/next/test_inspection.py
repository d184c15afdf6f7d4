"""Program inspection: jaxpr-based analog of the ITIR pretty printer
(reference: next/iterator/pretty_printer.py)."""

import numpy as np


def test_describe_field_operator():
    from gt4py_tpu.next import common, constructors, inspection
    from gt4py_tpu.next.ffront import field_operator

    I = common.Dimension("I")

    @field_operator
    def shiftadd(a, b):
        return a + b

    f = constructors.as_field((I,), np.arange(8, dtype=np.float64))
    g = constructors.as_field((I,), np.ones(8))
    text = inspection.describe(shiftadd, f, g)
    assert "program shiftadd" in text
    assert "Field<I[0:8]; float64>" in text
    assert "add" in text  # the jaxpr op


def test_format_field():
    from gt4py_tpu.next import common, constructors, inspection

    I = common.Dimension("I")
    from gt4py_tpu.next.common import Domain, UnitRange

    f = constructors.as_field(
        Domain((I,), (UnitRange(2, 6),)), np.zeros(4, dtype=np.float32)
    )
    assert inspection.format_field(f) == "Field<I[2:6]; float32>"
