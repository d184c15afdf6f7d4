"""CPU-reachable coverage of the Mosaic-only tracer branches.

``JaxTracer.mosaic`` is normally True only on real TPU hardware
(pallas_backend sets ``tracer.mosaic = not interpret``), so the CPU suite
exercised those branches zero times -- in round 2 a NameError inside one of
them (`_F16_DTYPES` used but never defined) survived an 837-test green run
and broke every on-chip kernel.  ``GT4PY_TPU_FORCE_MOSAIC_TRACE`` forces
``mosaic=True`` under interpret mode; the workarounds (f32 upcasts around
16-bit scalar arith / cmpf / negf and scalar native calls) are numerically
transparent, so results must stay bit-identical to the oracle.

These tests fail with NameError on the round-2 snapshot (ca217ed) and pass
after the fix.
"""

import ml_dtypes
import numpy as np
import pytest

from gt4py_tpu import config
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import PARALLEL, FORWARD, bfloat16, computation, interval, sqrt
from gt4py_tpu.testing.program_gen import run_differential_case

FieldBF = gtscript.Field[bfloat16]
Field16 = gtscript.Field[np.float16]
Field64 = gtscript.Field[np.float64]


@pytest.fixture(autouse=True)
def _force_mosaic(monkeypatch):
    monkeypatch.setattr(config, "FORCE_MOSAIC_TRACE", True)
    yield


def test_f16_dtypes_constant_defined():
    """Tripwire: the set the mosaic guards consult exists and is right."""
    from gt4py_tpu.cartesian.backend.jax_backend import _F16_DTYPES

    assert np.dtype(ml_dtypes.bfloat16) in _F16_DTYPES
    assert np.dtype(np.float16) in _F16_DTYPES
    assert np.dtype(np.float32) not in _F16_DTYPES


def _run(defn, backend, fields, scalars=None, name_suffix=""):
    st = gtscript.stencil(
        backend=backend, name=f"{defn.__name__}_{backend}_mosaic{name_suffix}"
    )(defn)
    arrs = {k: v.copy() for k, v in fields.items()}
    st(**arrs, **(scalars or {}))
    return {k: np.asarray(v, dtype=np.float64) for k, v in arrs.items()}


def _parity(defn, fields, scalars=None, dtype_tag=""):
    ora = _run(defn, "numpy", fields, scalars, dtype_tag)
    res = _run(defn, "pallas", fields, scalars, dtype_tag)
    for k in fields:
        np.testing.assert_array_equal(res[k], ora[k], err_msg=k)
    assert any(np.abs(ora[k]).max() > 0 for k in fields)


def _mk(seed, shape, dtype):
    rng = np.random.default_rng(seed)
    return (0.25 + rng.random(shape)).astype(dtype)


# Each stencil targets one `self.mosaic and ...` guard in jax_backend._eval.


@pytest.mark.parametrize("dtype", [bfloat16, np.float16], ids=["bf16", "f16"])
def test_mosaic_scalar_neg_16bit(dtype):
    """UnaryOp NEG on a 16-bit scalar (no 16-bit negf on the scalar core)."""
    FieldT = gtscript.Field[dtype]

    def defn_neg(inp: FieldT, out: FieldT, *, w: dtype):
        with computation(PARALLEL), interval(...):
            out = inp + (-w)

    fields = {
        "inp": _mk(0, (8, 8, 3), dtype),
        "out": np.zeros((8, 8, 3), dtype=dtype),
    }
    _parity(defn_neg, fields, {"w": dtype(0.375)}, np.dtype(dtype).name)


@pytest.mark.parametrize("dtype", [bfloat16, np.float16], ids=["bf16", "f16"])
def test_mosaic_comparison_16bit(dtype):
    """BinaryOp comparison on 16-bit vectors (no 16-bit cmpf on v5e)."""
    FieldT = gtscript.Field[dtype]

    def defn_cmp(inp: FieldT, out: FieldT):
        with computation(PARALLEL), interval(...):
            if inp > 0.5:
                out = inp
            else:
                out = -inp

    fields = {
        "inp": _mk(1, (8, 8, 3), dtype),
        "out": np.zeros((8, 8, 3), dtype=dtype),
    }
    _parity(defn_cmp, fields, dtype_tag=np.dtype(dtype).name)


@pytest.mark.parametrize("dtype", [bfloat16, np.float16], ids=["bf16", "f16"])
def test_mosaic_scalar_scalar_binop_16bit(dtype):
    """Scalar x scalar 16-bit arith (no 16-bit arith on the scalar core)."""
    FieldT = gtscript.Field[dtype]

    def defn_ss(inp: FieldT, out: FieldT, *, a: dtype, b: dtype):
        with computation(PARALLEL), interval(...):
            out = inp * (a - b)

    fields = {
        "inp": _mk(2, (8, 8, 3), dtype),
        "out": np.zeros((8, 8, 3), dtype=dtype),
    }
    _parity(defn_ss, fields, {"a": dtype(1.5), "b": dtype(0.25)}, np.dtype(dtype).name)


@pytest.mark.parametrize("dtype", [bfloat16, np.float16], ids=["bf16", "f16"])
def test_mosaic_scalar_native_call_16bit(dtype):
    """NativeFuncCall with all-scalar 16-bit args (no 16-bit libcalls)."""
    FieldT = gtscript.Field[dtype]

    def defn_nat(inp: FieldT, out: FieldT, *, w: dtype):
        with computation(PARALLEL), interval(...):
            out = inp + sqrt(w)

    fields = {
        "inp": _mk(3, (8, 8, 3), dtype),
        "out": np.zeros((8, 8, 3), dtype=dtype),
    }
    _parity(defn_nat, fields, {"w": dtype(2.25)}, np.dtype(dtype).name)


def test_mosaic_guards_inert_for_f64():
    """Wide dtypes take the guard's *condition* path (where the round-2
    NameError actually fired) without entering the workaround body."""

    def defn_f64(inp: Field64, out: Field64, *, w: np.float64):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp * (-w)
            with interval(1, None):
                out = out[0, 0, -1] + (inp if inp > 0.5 else -inp) + sqrt(w)

    fields = {
        "inp": _mk(4, (8, 8, 6), np.float64),
        "out": np.zeros((8, 8, 6), dtype=np.float64),
    }
    _parity(defn_f64, fields, {"w": np.float64(0.5)})


# Differential fuzz sweep with the forced-mosaic tracer: the corpus hits
# guard conditions across every dtype/op mix the generator produces.


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_forced_mosaic_bf16(seed):
    run_differential_case(
        seed,
        backends=("pallas",),
        dtype=np.dtype(ml_dtypes.bfloat16),
        rtol=0.02,
        atol=0.01,
    )


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_forced_mosaic_f64(seed):
    run_differential_case(seed, backends=("pallas",))
