"""Execution backends for operators and programs (reference: the
program_processors/runners dispatch -- roundtrip, gtfn CPU/GPU).  Here a
backend picks the array namespace and jit staging over the same typed-IR
interpreter; ``with_backend`` returns a NEW operator/program (reference
decorator semantics), the original stays embedded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    DimensionKind,
    Field,
    as_field,
    backends,
    field_operator,
    program,
    scan_operator,
    zeros,
)
from gt4py_tpu.next.type_system import Dims

I = Dimension("I")
K = Dimension("K", kind=DimensionKind.VERTICAL)
IF = Field[Dims[I], np.float64]


@field_operator
def _double_plus(a: IF, b: IF) -> IF:
    return a * 2.0 + b


def _inputs(ns):
    xp = np if ns == "numpy" else jnp
    return as_field((I,), xp.arange(5.0)), as_field((I,), xp.ones(5))


def test_numpy_oracle_backend_converts_jax_inputs():
    a, b = _inputs("jax")
    op = _double_plus.with_backend(backends.numpy_oracle)
    r = op(a, b)
    assert isinstance(r.data, np.ndarray)
    np.testing.assert_array_equal(r.asnumpy(), np.arange(5.0) * 2 + 1)
    assert _double_plus._backend is None  # original untouched


def test_jax_jit_backend_compiles_field_operator():
    a, b = _inputs("numpy")
    op = _double_plus.with_backend(backends.jax_jit)
    r = op(a, b)
    assert isinstance(r.data, jax.Array)
    np.testing.assert_array_equal(np.asarray(r.data), np.arange(5.0) * 2 + 1)
    # second call reuses the jit cache (same shapes -> no retrace error)
    r2 = op(a, b)
    np.testing.assert_array_equal(np.asarray(r2.data), np.asarray(r.data))


def test_backend_names_and_reference_aliases():
    assert _double_plus.with_backend("roundtrip")._backend is backends.numpy_oracle
    assert _double_plus.with_backend("gtfn_cpu")._backend is backends.jax_jit
    assert backends.run_gtfn is backends.jax_jit
    assert backends.gtfn_gpu is backends.jax_jit
    assert _double_plus.with_backend(None)._backend is None
    with pytest.raises(ValueError, match="unknown backend"):
        _double_plus.with_backend("cuda")


def test_program_with_backend_roundtrip_and_jit():
    @program
    def prog(a: IF, b: IF, out: IF):
        _double_plus(a, b, out=out)

    a, b = _inputs("numpy")
    expect = np.arange(5.0) * 2 + 1

    out = zeros({I: 5})
    prog.with_backend(backends.numpy_oracle)(a, b, out)
    np.testing.assert_array_equal(out.asnumpy(), expect)

    out2 = zeros({I: 5})
    pj = prog.with_backend(backends.jax_jit)
    pj(a, b, out2)
    np.testing.assert_array_equal(out2.asnumpy(), expect)
    assert pj._pool is not None  # compiled through the AOT pool
    pj(a, b, out2)  # cached variant

    assert prog._backend is None and prog._pool is None


def test_scan_operator_with_backend():
    @scan_operator(axis=K, forward=True, init=0.0)
    def csum(c: np.float64, x: np.float64) -> np.float64:
        return c + x

    x = as_field((K,), np.arange(6.0))
    s_np = csum.with_backend(backends.numpy_oracle)(x)
    assert isinstance(s_np.data, np.ndarray)
    np.testing.assert_array_equal(s_np.asnumpy(), np.cumsum(np.arange(6.0)))
    s_j = csum.with_backend(backends.jax_eager)(x)
    assert isinstance(s_j.data, jax.Array)
    np.testing.assert_array_equal(np.asarray(s_j.data), np.cumsum(np.arange(6.0)))
