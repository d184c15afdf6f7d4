"""Typed frontend tests: restricted-subset parsing, source-located
errors, type deduction, program validation.

Reference patterns: src/gt4py/next/ffront/func_to_foast.py (parser
rejections), foast_passes/type_deduction.py (promotion/builtin rules),
past_passes (program out= typing).
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Dims,
    Field,
    FieldOffset,
    as_field,
    field_operator,
    float32,
    float64,
    int32,
    program,
    scan_operator,
    where,
    zeros,
)
from gt4py_tpu.next.frontend import FieldViewError

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))

IJField = Field[Dims[I, J], float64]
IField = Field[Dims[I], float64]


# ------------------------------------------------------------------ #
# parser rejections (located)
# ------------------------------------------------------------------ #


def test_rejects_for_loop():
    with pytest.raises(FieldViewError, match="for loops"):
        @field_operator
        def bad(f: IField) -> IField:
            for _ in range(3):
                f = f + 1.0
            return f


def test_rejects_while_and_with():
    with pytest.raises(FieldViewError, match="while loops"):
        @field_operator
        def bad(f: IField) -> IField:
            while True:
                pass
            return f


def test_rejects_undefined_symbol_with_location():
    with pytest.raises(FieldViewError, match="undefined symbol 'qux'") as ei:
        @field_operator
        def bad(f: IField) -> IField:
            return f + qux  # noqa: F821
    assert "test_frontend.py" in str(ei.value)
    assert "return f + qux" in str(ei.value)  # source excerpt with caret


def test_rejects_python_builtin_calls():
    with pytest.raises(FieldViewError, match="builtin 'print'"):
        @field_operator
        def bad(f: IField) -> IField:
            g = print(f)
            return f


def test_attribute_access_constant_inlined_or_rejected():
    # statically resolvable chains (module constants) are inlined
    @field_operator
    def ok(f: IField) -> IField:
        return f + np.pi

    r = ok(as_field((I,), np.zeros(2)))
    np.testing.assert_allclose(r.asnumpy(), [np.pi, np.pi])

    # attribute access on non-collection runtime values is outside the DSL
    # (named collections DO have members -- see test_named_collections.py)
    with pytest.raises(FieldViewError, match="cannot access attribute"):
        @field_operator
        def bad(f: IField) -> IField:
            return f + f.data


def test_rejects_missing_return():
    with pytest.raises(FieldViewError, match="missing 'return'"):
        @field_operator
        def bad(f: IField) -> IField:
            g = f + 1.0


def test_rejects_starargs():
    with pytest.raises(FieldViewError, match="plain positional parameters"):
        @field_operator
        def bad(*fields):
            return fields[0]


def test_rejects_list_comprehension():
    with pytest.raises(FieldViewError, match="unsupported expression"):
        @field_operator
        def bad(f: IField) -> IField:
            g = [f for _ in (1,)]
            return f


def test_rejects_chained_comparison():
    with pytest.raises(FieldViewError, match="chained comparisons"):
        @field_operator
        def bad(f: IField) -> IField:
            return where(0.0 < f < 1.0, f, 0.0)


def test_rejects_string_literal_expression():
    with pytest.raises(FieldViewError, match="unsupported literal"):
        @field_operator
        def bad(f: IField) -> IField:
            return f + "nope"


# ------------------------------------------------------------------ #
# type deduction (static, from complete annotations)
# ------------------------------------------------------------------ #


def test_static_return_type():
    @field_operator
    def lap(f: IJField) -> IJField:
        return -2.0 * f + f(Ioff[1]) + f(Ioff[-1])

    rt = lap.return_type
    assert isinstance(rt, gtx.type_system.FieldType)
    assert rt.dims == (I, J)
    assert np.dtype(rt.dtype.kind) == np.float64


def test_rejects_dtype_mix_statically():
    F32 = Field[Dims[I], float32]
    F64 = Field[Dims[I], float64]
    with pytest.raises(FieldViewError, match="could not promote"):
        @field_operator
        def bad(a: F32, b: F64) -> F64:
            return a + b


def test_float_literal_rejected_with_int_field():
    IntF = Field[Dims[I], int32]
    with pytest.raises(FieldViewError, match="float literal"):
        @field_operator
        def bad(a: IntF) -> IntF:
            return a + 0.5


def test_weak_literal_adapts_to_f32():
    F32 = Field[Dims[I], float32]

    @field_operator
    def scale(a: F32) -> F32:
        return a * 2.0 + 1.0

    rt = scale.return_type
    assert np.dtype(rt.dtype.kind) == np.float32
    # execution preserves f32 on both backends (bitwise-equal paths)
    x = np.linspace(0, 1, 8, dtype=np.float32)
    r_jax = scale(as_field((I,), x))
    r_np = scale(as_field((I,), x.copy(), allocator="numpy"))
    assert r_jax.dtype == np.float32
    assert r_np.dtype == np.float32
    np.testing.assert_array_equal(r_jax.asnumpy(), r_np.asnumpy())


def test_declared_return_mismatch():
    with pytest.raises(FieldViewError, match="declares return type"):
        @field_operator
        def bad(a: IField) -> Field[Dims[I], float32]:
            return a + 1.0


def test_arithmetic_on_bool_rejected():
    with pytest.raises(FieldViewError, match="arithmetic needs numeric"):
        @field_operator
        def bad(a: IField) -> IField:
            return (a > 0.0) + 1.0


def test_boolop_requires_logical():
    with pytest.raises(FieldViewError, match="'and' needs bool"):
        @field_operator
        def bad(a: IField) -> IField:
            return where(a and 1.0, a, 0.0)


def test_offset_needs_index():
    with pytest.raises(FieldViewError, match="needs an index"):
        @field_operator
        def bad(a: IField) -> IField:
            return a(Ioff)


def test_offset_along_missing_dim():
    Joff = FieldOffset("Joff", source=J, target=(J,))
    with pytest.raises(FieldViewError, match="without that dimension"):
        @field_operator
        def bad(a: IField) -> IField:
            return a(Joff[1])


def test_astype_rule():
    @field_operator
    def cast(a: IField) -> Field[Dims[I], float32]:
        return gtx.astype(a, float32)

    assert np.dtype(cast.return_type.dtype.kind) == np.float32
    r = cast(as_field((I,), np.arange(4.0)))
    assert r.dtype == np.float32


def test_where_condition_must_be_bool():
    with pytest.raises(FieldViewError, match="must be a bool"):
        @field_operator
        def bad(a: IField) -> IField:
            return where(a, a, 0.0)


def test_tuple_index_out_of_range():
    with pytest.raises(FieldViewError, match="out of range"):
        @field_operator
        def bad(a: IField) -> IField:
            t = (a, a + 1.0)
            return t[2]


def test_tuple_unpack_arity_error():
    with pytest.raises(FieldViewError, match="cannot unpack 2 values into 3"):
        @field_operator
        def bad(a: IField) -> IField:
            x, y, z = (a, a)
            return x


def test_deferred_params_checked_at_call():
    @field_operator
    def add(a: Field, b: Field) -> Field:  # bare Field: deferred
        return a + b

    f32 = as_field((I,), np.zeros(4, np.float32))
    f64 = as_field((I,), np.zeros(4, np.float64))
    with pytest.raises(FieldViewError, match="could not promote"):
        add(f32, f64)
    # and a valid call works
    assert add(f64, f64).dtype == np.float64


def test_nested_operator_call_typing():
    @field_operator
    def inner(a: IField) -> IField:
        return a + 1.0

    @field_operator
    def outer(a: IField) -> IField:
        return inner(a) * 2.0

    r = outer(as_field((I,), np.arange(3.0)))
    np.testing.assert_array_equal(r.asnumpy(), [2.0, 4.0, 6.0])


def test_scan_carry_type_mismatch():
    @scan_operator(axis=K, forward=True, init=0.0)
    def s(carry: float, x: float) -> float:
        return carry + x

    # int field against the declared float scalar param: located rejection
    qi = as_field((K,), np.arange(5, dtype=np.int64))
    with pytest.raises(FieldViewError, match="expects float64, got int64"):
        s(qi)


def test_augassign_and_ifexp():
    @field_operator
    def op(a: IField, flag: bool) -> IField:
        b = a * 1.0
        b += 2.0
        c = b if flag else b * 0.0
        return c

    r = op(as_field((I,), np.ones(3)), True)
    np.testing.assert_array_equal(r.asnumpy(), [3.0, 3.0, 3.0])
    r0 = op(as_field((I,), np.ones(3)), False)
    np.testing.assert_array_equal(r0.asnumpy(), [0.0, 0.0, 0.0])


def test_if_statement_scalar_condition():
    @field_operator
    def op(a: IField, flag: bool) -> IField:
        if flag:
            b = a + 1.0
        else:
            b = a - 1.0
        return b

    np.testing.assert_array_equal(
        op(as_field((I,), np.zeros(2)), True).asnumpy(), [1.0, 1.0]
    )
    np.testing.assert_array_equal(
        op(as_field((I,), np.zeros(2)), False).asnumpy(), [-1.0, -1.0]
    )


# ------------------------------------------------------------------ #
# program validation
# ------------------------------------------------------------------ #


def test_program_out_dtype_mismatch():
    @field_operator
    def double(f: IField) -> IField:
        return f * 2.0

    F32 = Field[Dims[I], float32]
    with pytest.raises(FieldViewError, match="dtype"):
        @program
        def prog(f: IField, o: F32):
            double(f, out=o)


def test_program_missing_out_dim():
    @field_operator
    def lap2(f: IJField) -> IJField:
        return f * 2.0

    OField = Field[Dims[I], float64]
    with pytest.raises(FieldViewError, match="missing from out="):
        @program
        def prog(f: IJField, o: OField):
            lap2(f, out=o)


def test_program_rejects_return():
    with pytest.raises(FieldViewError, match="do not return"):
        @program
        def prog(f: IField):
            return f


def test_program_rejects_non_call_statements():
    with pytest.raises(FieldViewError, match="sequences of operator calls"):
        @program
        def prog(f: IField):
            f + 1.0


def test_program_execution_and_binding():
    @field_operator
    def double(f: Field) -> Field:
        return f * 2.0

    @program
    def prog(f: Field, o: Field):
        double(f, out=o)

    a = as_field((I,), np.arange(6.0))
    out = zeros({I: 6})
    prog(a, out)
    np.testing.assert_array_equal(out.asnumpy(), np.arange(6.0) * 2)
    # keyword binding
    out2 = zeros({I: 6})
    prog(f=a, o=out2)
    np.testing.assert_array_equal(out2.asnumpy(), np.arange(6.0) * 2)
    # bound args
    out3 = zeros({I: 6})
    prog.with_bound_args(f=a)(out3)
    np.testing.assert_array_equal(out3.asnumpy(), np.arange(6.0) * 2)


def test_located_error_points_at_line():
    try:
        @field_operator
        def op_with_error(f: IField) -> IField:
            g = f + 1.0
            return g + unknown_thing  # noqa: F821
    except FieldViewError as e:
        msg = str(e)
        assert "unknown_thing" in msg
        assert "^" in msg  # caret excerpt
    else:
        pytest.fail("expected FieldViewError")
