"""Named collections: NamedTuple / dataclass types as operator and program
parameters, member access, in-operator construction, and collection
returns (reference:
tests/next_tests/integration_tests/feature_tests/ffront_tests/test_named_collections.py).

In-IR, a named collection is an ordered tuple; the class identity lives on
the TupleType (``names``/``origin``) and instances are reconstructed at
the operator boundary."""

import dataclasses
from typing import NamedTuple

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    Field,
    as_field,
    backends,
    field_operator,
    program,
    zeros,
)
from gt4py_tpu.next.frontend import FieldViewError
from gt4py_tpu.next.type_system import Dims

I = Dimension("I")
J = Dimension("J")
F = Field[Dims[I, J], np.float32]


class VelNT(NamedTuple):
    u: F
    v: F


@dataclasses.dataclass
class VelDC:
    u: F
    v: F


def _uv(seed=0):
    rng = np.random.default_rng(seed)
    u = as_field((I, J), rng.random((4, 5), dtype=np.float32))
    v = as_field((I, J), rng.random((4, 5), dtype=np.float32))
    return u, v


@pytest.mark.parametrize("cls", [VelNT, VelDC])
def test_member_access_on_parameter(cls):
    @field_operator
    def mag(vel: cls) -> F:  # type: ignore[valid-type]
        return vel.u + vel.v

    u, v = _uv()
    r = mag(cls(u=u, v=v))
    np.testing.assert_array_equal(r.asnumpy(), u.asnumpy() + v.asnumpy())


@pytest.mark.parametrize("cls", [VelNT, VelDC])
def test_construct_inside_and_instance_return(cls):
    @field_operator
    def make(a: F, b: F) -> cls:  # type: ignore[valid-type]
        return cls(u=a + b, v=a - b)

    u, v = _uv(1)
    out = make(u, v)
    assert isinstance(out, cls)
    np.testing.assert_array_equal(out.u.asnumpy(), u.asnumpy() + v.asnumpy())
    np.testing.assert_array_equal(out.v.asnumpy(), u.asnumpy() - v.asnumpy())


def test_positional_construction():
    @field_operator
    def make(a: F, b: F) -> VelNT:
        return VelNT(a, b)

    u, v = _uv(2)
    out = make(u, v)
    assert isinstance(out, VelNT)
    np.testing.assert_array_equal(out.u.asnumpy(), u.asnumpy())


@pytest.mark.parametrize("cls", [VelNT, VelDC])
def test_program_with_collection_in_and_out(cls):
    @field_operator
    def make(a: F, b: F) -> cls:  # type: ignore[valid-type]
        return cls(u=a + b, v=a - b)

    @program
    def prog(vel: cls, out: cls):  # type: ignore[valid-type]
        make(vel.u, vel.v, out=out)

    u, v = _uv(3)
    o = cls(
        u=zeros({I: 4, J: 5}, np.float32), v=zeros({I: 4, J: 5}, np.float32)
    )
    prog(cls(u=u, v=v), o)
    # member Fields are shared objects: the write reaches the caller's
    # collection in place
    np.testing.assert_array_equal(o.u.asnumpy(), u.asnumpy() + v.asnumpy())
    np.testing.assert_array_equal(o.v.asnumpy(), u.asnumpy() - v.asnumpy())


def test_nested_mixed_collections():
    class Pair(NamedTuple):
        a: F
        vel: VelNT

    @field_operator
    def nested(p: Pair) -> F:
        return p.vel.u + p.a

    u, v = _uv(4)
    r = nested(Pair(a=u, vel=VelNT(u=v, v=u)))
    np.testing.assert_array_equal(r.asnumpy(), v.asnumpy() + u.asnumpy())


def test_collection_with_jit_backend():
    @field_operator
    def mag(vel: VelNT) -> F:
        return vel.u + vel.v

    u, v = _uv(5)
    r = mag.with_backend(backends.jax_jit)(VelNT(u=u, v=v))
    np.testing.assert_array_equal(np.asarray(r.data), u.asnumpy() + v.asnumpy())


def test_jit_cache_distinguishes_same_shaped_collections():
    """TupleType equality is structural (names excluded), but the jit
    trace cache must key on names: an unannotated operator traced for one
    collection class must not silently reuse the trace for another."""

    class A(NamedTuple):
        u: F
        v: F

    class B(NamedTuple):
        x: F
        y: F

    @field_operator
    def mag(vel):
        return vel.u + vel.v

    u, v = _uv(6)
    mj = mag.with_backend(backends.jax_jit)
    r = mj(A(u=u, v=v))
    np.testing.assert_array_equal(np.asarray(r.data), u.asnumpy() + v.asnumpy())
    with pytest.raises(FieldViewError, match="not a member"):
        mj(B(x=u, y=v))


def test_unannotated_operator_constructs_collection():
    @field_operator
    def make(a, b):
        return VelNT(u=a, v=b)

    u, v = _uv(7)
    out = make(u, v)
    assert isinstance(out, VelNT)


def test_collection_flows_into_unannotated_callee():
    """Member names survive into nested unannotated operators (both at
    deduction -- _strip_weak keeps names -- and at runtime: dataclass
    instances canonicalize to name-carrying namedtuple mirrors)."""

    @field_operator
    def mag(vel):
        return vel.u + vel.v

    @field_operator
    def outer_nt(vel: VelNT) -> F:
        return mag(vel)

    @field_operator
    def outer_dc(vel: VelDC) -> F:
        return mag(vel)

    u, v = _uv(8)
    np.testing.assert_array_equal(
        outer_nt(VelNT(u=u, v=v)).asnumpy(), u.asnumpy() + v.asnumpy()
    )
    np.testing.assert_array_equal(
        outer_dc(VelDC(u=u, v=v)).asnumpy(), u.asnumpy() + v.asnumpy()
    )


def test_member_out_target_under_backend():
    """out=vel.u (a collection member) classifies the collection param as
    an output: backends must not convert its Fields to copies."""

    @field_operator
    def add(a: F, b: F) -> F:
        return a + b

    @program
    def prog(a: F, b: F, vel_out: VelNT):
        add(a, b, out=vel_out.u)
        add(a, a, out=vel_out.v)

    u, v = _uv(9)
    o = VelNT(
        u=zeros({I: 4, J: 5}, np.float32), v=zeros({I: 4, J: 5}, np.float32)
    )
    prog.with_backend(backends.jax_eager)(u, v, o)
    np.testing.assert_array_equal(np.asarray(o.u.data), u.asnumpy() + v.asnumpy())
    np.testing.assert_array_equal(np.asarray(o.v.data), 2 * u.asnumpy())


def test_program_jit_with_collection_out():
    @field_operator
    def make(a: F, b: F) -> VelNT:
        return VelNT(u=a + b, v=a - b)

    @program
    def prog(vel: VelNT, out: VelNT):
        make(vel.u, vel.v, out=out)

    u, v = _uv(10)
    o = VelNT(
        u=zeros({I: 4, J: 5}, np.float32), v=zeros({I: 4, J: 5}, np.float32)
    )
    prog.with_backend(backends.jax_jit)(VelNT(u=u, v=v), o)
    np.testing.assert_array_equal(np.asarray(o.u.data), u.asnumpy() + v.asnumpy())
    np.testing.assert_array_equal(np.asarray(o.v.data), u.asnumpy() - v.asnumpy())


def test_unknown_member_rejected():
    with pytest.raises(FieldViewError, match="not a member"):

        @field_operator
        def bad(vel: VelNT) -> F:
            return vel.w


def test_missing_member_in_ctor_rejected():
    with pytest.raises(FieldViewError, match="missing"):

        @field_operator
        def bad(a: F) -> VelNT:
            return VelNT(u=a)


def test_wrong_member_dtype_rejected():
    F64 = Field[Dims[I, J], np.float64]

    with pytest.raises(FieldViewError, match="member 'u' expects"):

        @field_operator
        def bad(a: F64) -> VelNT:
            return VelNT(u=a, v=a)
