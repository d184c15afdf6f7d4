"""End-to-end tests of the numpy oracle backend against hand-written numpy.

Workloads mirror the reference's canonical stencil registry
(reference: tests/cartesian_tests/integration_tests/multi_feature_tests/
stencil_definitions.py).
"""

import numpy as np
import pytest

from gt4py_tpu import storage
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import (
    BACKWARD,
    FORWARD,
    PARALLEL,
    computation,
    horizontal,
    interval,
    region,
    I,
    J,
    K,
    sqrt,
)

Field3D = gtscript.Field[np.float64]

BACKEND = "numpy"


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random(shape)


def test_copy_stencil():
    @gtscript.stencil(backend=BACKEND)
    def copy_stencil(field_a: Field3D, field_b: Field3D):
        with computation(PARALLEL), interval(...):
            field_b = field_a[0, 0, 0]

    a = rand(8, 9, 10)
    b = np.zeros((8, 9, 10))
    copy_stencil(a, b, origin=(0, 0, 0), domain=(8, 9, 10))
    np.testing.assert_array_equal(a, b)


def test_arithmetic_and_scalar():
    @gtscript.stencil(backend=BACKEND)
    def arith(field_a: Field3D, field_b: Field3D, *, alpha: float):
        with computation(PARALLEL), interval(...):
            field_a = (((field_b + 42.0) - 42.0) * alpha) / 2.0 % 42.0

    a = np.zeros((5, 5, 5))
    b = rand(5, 5, 5)
    arith(a, b, alpha=3.0, origin=(0, 0, 0))
    np.testing.assert_array_equal(a, (((b + 42.0) - 42.0) * 3.0) / 2.0 % 42.0)


def test_laplacian_with_temporary():
    @gtscript.stencil(backend=BACKEND)
    def lap(out_f: Field3D, in_f: Field3D):
        with computation(PARALLEL), interval(...):
            out_f = -4.0 * in_f[0, 0, 0] + (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )

    n = 12
    inp = rand(n, n, 4)
    out = np.zeros((n, n, 4))
    lap(out, inp, origin=(1, 1, 0), domain=(n - 2, n - 2, 4))
    expected = (
        -4.0 * inp[1:-1, 1:-1]
        + inp[2:, 1:-1]
        + inp[:-2, 1:-1]
        + inp[1:-1, 2:]
        + inp[1:-1, :-2]
    )
    np.testing.assert_allclose(out[1:-1, 1:-1], expected, rtol=1e-12, atol=1e-12)
    # halo untouched
    assert np.all(out[0, :, :] == 0.0)


def hdiff_reference(in_field, coeff):
    """Hand-written horizontal diffusion with flux limiter (halo 2)."""
    lap = 4.0 * in_field[1:-1, 1:-1] - (
        in_field[2:, 1:-1] + in_field[:-2, 1:-1] + in_field[1:-1, 2:] + in_field[1:-1, :-2]
    )
    res1 = lap[1:, 1:-1] - lap[:-1, 1:-1]
    flx = np.where(res1 * (in_field[2:-1, 2:-2] - in_field[1:-2, 2:-2]) > 0, 0.0, res1)
    res2 = lap[1:-1, 1:] - lap[1:-1, :-1]
    fly = np.where(res2 * (in_field[2:-2, 2:-1] - in_field[2:-2, 1:-2]) > 0, 0.0, res2)
    out = in_field[2:-2, 2:-2] - coeff[2:-2, 2:-2] * (
        flx[1:, :] - flx[:-1, :] + fly[:, 1:] - fly[:, :-1]
    )
    return out


def test_horizontal_diffusion():
    @gtscript.stencil(backend=BACKEND)
    def horizontal_diffusion(in_field: Field3D, out_field: Field3D, coeff: Field3D):
        with computation(PARALLEL), interval(...):
            lap_field = 4.0 * in_field[0, 0, 0] - (
                in_field[1, 0, 0] + in_field[-1, 0, 0] + in_field[0, 1, 0] + in_field[0, -1, 0]
            )
            res = lap_field[1, 0, 0] - lap_field[0, 0, 0]
            flx_field = 0 if (res * (in_field[1, 0, 0] - in_field[0, 0, 0])) > 0 else res
            res = lap_field[0, 1, 0] - lap_field[0, 0, 0]
            fly_field = 0 if (res * (in_field[0, 1, 0] - in_field[0, 0, 0])) > 0 else res
            out_field = in_field[0, 0, 0] - coeff[0, 0, 0] * (
                flx_field[0, 0, 0] - flx_field[-1, 0, 0]
                + fly_field[0, 0, 0] - fly_field[0, -1, 0]
            )

    n, k = 16, 5
    inp = rand(n, n, k, seed=1)
    coeff = rand(n, n, k, seed=2)
    out = np.zeros((n, n, k))
    horizontal_diffusion(inp, out, coeff, origin=(2, 2, 0), domain=(n - 4, n - 4, k))

    expected = hdiff_reference(inp, coeff)
    np.testing.assert_allclose(out[2:-2, 2:-2], expected, rtol=1e-12, atol=1e-12)


def tridiag_reference(inf, diag, sup, rhs):
    """Thomas algorithm, same operation order as the stencil."""
    ni, nj, nk = diag.shape
    sup = sup.copy()
    rhs = rhs.copy()
    out = np.empty_like(rhs)
    sup[:, :, 0] = sup[:, :, 0] / diag[:, :, 0]
    rhs[:, :, 0] = rhs[:, :, 0] / diag[:, :, 0]
    for k in range(1, nk):
        denom = diag[:, :, k] - sup[:, :, k - 1] * inf[:, :, k]
        sup[:, :, k] = sup[:, :, k] / denom
        rhs[:, :, k] = (rhs[:, :, k] - inf[:, :, k] * rhs[:, :, k - 1]) / denom
    out[:, :, -1] = rhs[:, :, -1]
    for k in range(nk - 2, -1, -1):
        out[:, :, k] = rhs[:, :, k] - sup[:, :, k] * out[:, :, k + 1]
    return out


def test_tridiagonal_solver():
    @gtscript.stencil(backend=BACKEND)
    def tridiagonal_solver(
        inf: Field3D, diag: Field3D, sup: Field3D, rhs: Field3D, out: Field3D
    ):
        with computation(FORWARD):
            with interval(0, 1):
                sup = sup / diag
                rhs = rhs / diag
            with interval(1, None):
                sup = sup / (diag - sup[0, 0, -1] * inf)
                rhs = (rhs - inf * rhs[0, 0, -1]) / (diag - sup[0, 0, -1] * inf)
        with computation(BACKWARD):
            with interval(-1, None):
                out = rhs
            with interval(0, -1):
                out = rhs - sup * out[0, 0, 1]

    ni, nj, nk = 6, 7, 12
    inf = rand(ni, nj, nk, seed=3) * 0.1
    diag = rand(ni, nj, nk, seed=4) + 2.0
    sup = rand(ni, nj, nk, seed=5) * 0.1
    rhs = rand(ni, nj, nk, seed=6)

    expected = tridiag_reference(inf, diag, sup, rhs)

    out = np.zeros_like(rhs)
    sup2, rhs2 = sup.copy(), rhs.copy()
    tridiagonal_solver(inf, diag, sup2, rhs2, out, origin=(0, 0, 0))
    np.testing.assert_allclose(out, expected, rtol=1e-12, atol=1e-12)

    # verify the solve: A x = rhs
    x = out
    recon = np.empty_like(rhs)
    recon[:, :, 0] = diag[:, :, 0] * x[:, :, 0] + sup[:, :, 0] * x[:, :, 1]
    for k in range(1, nk - 1):
        recon[:, :, k] = (
            inf[:, :, k] * x[:, :, k - 1]
            + diag[:, :, k] * x[:, :, k]
            + sup[:, :, k] * x[:, :, k + 1]
        )
    recon[:, :, -1] = inf[:, :, -1] * x[:, :, -2] + diag[:, :, -1] * x[:, :, -1]
    np.testing.assert_allclose(recon, rhs, rtol=1e-10, atol=1e-12)


def test_runtime_if_and_while():
    @gtscript.stencil(backend=BACKEND)
    def runtime_if(field_a: Field3D, field_b: Field3D):
        with computation(BACKWARD), interval(...):
            if field_a > 0.0:
                field_b = -1.0
                field_a = -field_a
            else:
                field_b = 1.0

    a = rand(5, 5, 5) - 0.5
    a0 = a.copy()
    b = np.zeros((5, 5, 5))
    runtime_if(a, b, origin=(0, 0, 0))
    np.testing.assert_array_equal(b, np.where(a0 > 0, -1.0, 1.0))
    np.testing.assert_array_equal(a, np.where(a0 > 0, -a0, a0))


def test_while_loop():
    @gtscript.stencil(backend=BACKEND)
    def while_stencil(field_a: Field3D):
        with computation(PARALLEL), interval(...):
            while field_a > 1.0:
                field_a = field_a / 2.0

    a = rand(4, 4, 4) * 10.0
    a0 = a.copy()
    while_stencil(a, origin=(0, 0, 0))
    expected = a0.copy()
    m = expected > 1.0
    while m.any():
        expected[m] = expected[m] / 2.0
        m = expected > 1.0
    np.testing.assert_allclose(a, expected, rtol=1e-15)


def test_forward_sequential_semantics():
    """FORWARD accumulation: out[k] = out[k-1] + in[k]."""

    @gtscript.stencil(backend=BACKEND)
    def cumsum(inp: Field3D, out: Field3D):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp

    a = rand(3, 4, 9)
    out = np.zeros_like(a)
    cumsum(a, out, origin=(0, 0, 0))
    np.testing.assert_allclose(out, np.cumsum(a, axis=2), rtol=1e-12, atol=1e-12)


def test_intervals():
    @gtscript.stencil(backend=BACKEND)
    def large_k_interval(in_field: Field3D, out_field: Field3D):
        with computation(PARALLEL):
            with interval(0, 6):
                out_field = in_field
            with interval(6, -10):
                out_field = in_field + 1
            with interval(-10, None):
                out_field = in_field

    a = rand(4, 4, 20)
    out = np.zeros_like(a)
    large_k_interval(a, out, origin=(0, 0, 0))
    expected = a.copy()
    expected[:, :, 6:10] += 1
    np.testing.assert_allclose(out, expected)


def test_min_k_size_validation():
    @gtscript.stencil(backend=BACKEND)
    def large_k_interval(in_field: Field3D, out_field: Field3D):
        with computation(PARALLEL):
            with interval(0, 6):
                out_field = in_field
            with interval(6, -10):
                out_field = in_field + 1
            with interval(-10, None):
                out_field = in_field

    a = rand(4, 4, 8)
    out = np.zeros_like(a)
    with pytest.raises(Exception, match="K size"):
        large_k_interval(a, out, origin=(0, 0, 0))


def test_horizontal_regions():
    @gtscript.stencil(backend=BACKEND)
    def horizontal_regions(field_in: Field3D, field_out: Field3D):
        with computation(PARALLEL), interval(...):
            field_out = field_in
            with horizontal(
                region[I[0] : I[0] + 2, J[0] : J[0] + 2],
                region[I[-1] - 2 : I[-1], J[-1] - 2 : J[-1]],
            ):
                field_out = field_in + 1.0

    n = 8
    a = rand(n, n, 3)
    out = np.zeros_like(a)
    horizontal_regions(a, out, origin=(0, 0, 0))
    expected = a.copy()
    # I[-1] resolves to the last point (exclusive end): region covers
    # indices [n-3, n-1) on each axis.
    expected[0:2, 0:2] += 1.0
    expected[n - 3 : n - 1, n - 3 : n - 1] += 1.0
    np.testing.assert_allclose(out, expected)


def test_externals_and_inlined():
    @gtscript.stencil(backend=BACKEND, externals={"DO_IT": True, "FACTOR": 3.0})
    def ext_stencil(inp: Field3D, out: Field3D):
        from __externals__ import DO_IT, FACTOR

        with computation(PARALLEL), interval(...):
            if __INLINED(DO_IT):
                out = inp * FACTOR
            else:
                out = inp

    from gt4py_tpu.cartesian.gtscript import __INLINED  # noqa: F401

    a = rand(4, 4, 4)
    out = np.zeros_like(a)
    ext_stencil(a, out, origin=(0, 0, 0))
    np.testing.assert_allclose(out, a * 3.0)


def test_function_inlining():
    @gtscript.function
    def avg_plus(b):
        return 0.5 * (b[0, 1, 0] + b[0, -1, 0])

    @gtscript.stencil(backend=BACKEND)
    def use_fn(inp: Field3D, out: Field3D):
        with computation(PARALLEL), interval(...):
            out = avg_plus(inp)

    n = 8
    a = rand(n, n, 3)
    out = np.zeros((n, n, 3))
    use_fn(a, out, origin=(0, 1, 0), domain=(n, n - 2, 3))
    expected = 0.5 * (a[:, 2:, :] + a[:, :-2, :])
    np.testing.assert_allclose(out[:, 1:-1], expected, rtol=1e-15)


def test_function_multiple_returns():
    @gtscript.function
    def minmax(a, b):
        return min(a, b), max(a, b)

    @gtscript.stencil(backend=BACKEND)
    def use_fn(in_a: Field3D, in_b: Field3D, lo: Field3D, hi: Field3D):
        with computation(PARALLEL), interval(...):
            lo, hi = minmax(in_a, in_b)

    a, b = rand(4, 4, 4, seed=1), rand(4, 4, 4, seed=2)
    lo, hi = np.zeros_like(a), np.zeros_like(a)
    use_fn(a, b, lo, hi, origin=(0, 0, 0))
    np.testing.assert_allclose(lo, np.minimum(a, b))
    np.testing.assert_allclose(hi, np.maximum(a, b))


def test_storage_api():
    @gtscript.stencil(backend=BACKEND)
    def lap(out_f: Field3D, in_f: Field3D):
        with computation(PARALLEL), interval(...):
            out_f = -4.0 * in_f[0, 0, 0] + (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )

    n = 10
    inp = storage.from_array(rand(n, n, 4), backend=BACKEND, aligned_index=(1, 1, 0))
    out = storage.zeros((n, n, 4), backend=BACKEND, aligned_index=(1, 1, 0))
    # origin from storage aligned_index; domain inferred from shapes & halos
    lap(out, inp)
    ref = np.asarray(inp)
    expected = (
        -4.0 * ref[1:-1, 1:-1]
        + ref[2:, 1:-1]
        + ref[:-2, 1:-1]
        + ref[1:-1, 2:]
        + ref[1:-1, :-2]
    )
    np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1], expected, rtol=1e-12, atol=1e-12)


def test_variable_k_offset():
    @gtscript.stencil(backend=BACKEND)
    def var_k(inp: Field3D, idx: gtscript.Field[np.int64], out: Field3D):
        with computation(PARALLEL), interval(...):
            out = inp[0, 0, idx]

    nk = 6
    a = rand(4, 4, nk)
    shifts = np.ones((4, 4, nk), dtype=np.int64)
    out = np.zeros_like(a)
    var_k(a, shifts, out, origin=(0, 0, 0))
    expected = np.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)
    np.testing.assert_allclose(out, expected)


def test_data_dimensions():
    @gtscript.stencil(backend=BACKEND)
    def vec_norm(
        vec: gtscript.Field[(np.float64, (3,))], out: Field3D
    ):
        with computation(PARALLEL), interval(...):
            out = sqrt(
                vec[0, 0, 0][0] ** 2 + vec[0, 0, 0][1] ** 2 + vec[0, 0, 0][2] ** 2
            )

    v = rand(4, 4, 4, 3)
    out = np.zeros((4, 4, 4))
    vec_norm(v, out, origin=(0, 0, 0))
    np.testing.assert_allclose(out, np.sqrt((v**2).sum(axis=-1)), rtol=1e-12, atol=1e-12)


def test_race_validation():
    from gt4py_tpu.cartesian.validation import GTScriptValidationError

    with pytest.raises(Exception):

        @gtscript.stencil(backend=BACKEND)
        def racy(a: Field3D, b: Field3D):
            with computation(PARALLEL), interval(...):
                b = a[1, 0, 0]
                a = b  # a written and read with horizontal offset


def test_lower_dimensional_fields():
    Field2D = gtscript.Field[gtscript.IJ, np.float64]

    @gtscript.stencil(backend=BACKEND)
    def temporary_stencil(field_a: Field3D, field_b: Field2D, *, scalar_in: float):
        with computation(PARALLEL), interval(...):
            tmp = field_a * scalar_in
        with computation(FORWARD), interval(0, 1):
            field_b += tmp

    a = rand(5, 6, 7)
    b = np.zeros((5, 6))
    temporary_stencil(a, b, scalar_in=2.0, origin=(0, 0, 0))
    np.testing.assert_allclose(b, 2.0 * a[:, :, 0], rtol=1e-15)
