"""Regressions for the round-1 code-review findings."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import (
    FORWARD,
    PARALLEL,
    computation,
    interval,
    I,
    J,
    K,
)

Field3D = gtscript.Field[np.float64]
BACKENDS = ["numpy", "jax"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_while_under_if_terminates(backend):
    """A while nested in a field conditional must not loop forever for
    points outside the outer mask."""

    @gtscript.stencil(backend=backend)
    def st(flag: Field3D, x: Field3D):
        with computation(PARALLEL), interval(...):
            if flag > 0.0:
                while x < 5.0:
                    x = x + 1.0

    flag = np.array([[[1.0, -1.0]]] * 2).reshape(2, 1, 2)
    x = np.zeros((2, 1, 2))
    st(flag, x, origin=(0, 0, 0))
    # masked-in points reach 5; masked-out points stay 0
    np.testing.assert_array_equal(x[:, :, 0], 5.0)
    np.testing.assert_array_equal(x[:, :, 1], 0.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_temp_first_assigned_in_while_body(backend):
    @gtscript.stencil(backend=backend)
    def st(x: Field3D):
        with computation(PARALLEL), interval(...):
            while x < 5.0:
                t = x + 1.0
                x = t

    x = np.zeros((2, 2, 2))
    st(x, origin=(0, 0, 0))
    np.testing.assert_array_equal(x, 5.0)


def test_all_origin_selects_present_axes():
    """'_all_' 3-component origins map onto a lower-dim field's own axes."""

    @gtscript.stencil(backend="numpy")
    def st(a: gtscript.Field[gtscript.JK, np.float64], out: Field3D):
        with computation(PARALLEL), interval(...):
            out = a

    a = np.zeros((8, 6))
    a[2:, :] = 7.0  # J origin 2 region
    out = np.zeros((4, 6, 6))
    st(a, out, origin={"_all_": (9, 2, 0), "out": (0, 0, 0)}, domain=(4, 6, 6))
    # the JK field must use origin (J=2, K=0), not (9, 2)
    np.testing.assert_array_equal(out, 7.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_nested_axis_shift_arithmetic(backend):
    """field[I + 1 - 2] must mean offset -1, not -2."""

    @gtscript.stencil(backend=backend)
    def st(a: Field3D, out: Field3D):
        with computation(PARALLEL), interval(...):
            out = a[I + 1 - 2, J, K]

    a = np.arange(6.0).reshape(6, 1, 1) * np.ones((6, 2, 2))
    out = np.zeros((6, 2, 2))
    st(a, out, origin=(1, 0, 0), domain=(4, 2, 2))
    np.testing.assert_array_equal(out[1:5], a[0:4])


@pytest.mark.parametrize("backend", BACKENDS)
def test_variable_k_in_serial_loop(backend):
    """Variable-K reads inside FORWARD loops (oracle used to crash)."""

    @gtscript.stencil(backend=backend)
    def st(inp: Field3D, off: gtscript.Field[np.int64], out: Field3D):
        with computation(FORWARD), interval(...):
            out = inp[0, 0, off]

    nk = 5
    a = np.arange(nk, dtype=np.float64).reshape(1, 1, nk) * np.ones((3, 3, nk))
    off = np.ones((3, 3, nk), dtype=np.int64)
    out = np.zeros_like(a)
    st(a, off, out, origin=(0, 0, 0))
    expected = np.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)
    np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("backend", BACKENDS)
def test_variable_k_on_subinterval(backend):
    @gtscript.stencil(backend=backend)
    def st(inp: Field3D, off: gtscript.Field[np.int64], out: Field3D):
        with computation(PARALLEL), interval(1, None):
            out = inp[0, 0, off]

    nk = 5
    a = np.arange(nk, dtype=np.float64).reshape(1, 1, nk) * np.ones((2, 2, nk))
    off = np.zeros((2, 2, nk), dtype=np.int64)
    out = np.zeros_like(a)
    st(a, off, out, origin=(0, 0, 0))
    np.testing.assert_array_equal(out[:, :, 1:], a[:, :, 1:])
    np.testing.assert_array_equal(out[:, :, 0], 0.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_absolute_k_scalar_clips(backend):
    """Out-of-range .at(K=) literals clip like the array path."""

    @gtscript.stencil(backend=backend)
    def st(inp: Field3D, out: Field3D, *, idx: int):
        with computation(PARALLEL), interval(...):
            out = inp.at(K=idx)

    a = np.arange(4.0).reshape(1, 1, 4) * np.ones((2, 2, 4))
    out = np.zeros_like(a)
    st(a, out, idx=7, origin=(0, 0, 0))
    np.testing.assert_array_equal(out, 3.0)
    st(a, out, idx=-1, origin=(0, 0, 0))
    np.testing.assert_array_equal(out, 0.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_temp_k_halo_cross_loop(backend):
    """A temporary read at a K offset in a later loop gets a K halo."""

    @gtscript.stencil(backend=backend)
    def st(inp: Field3D, out: Field3D):
        with computation(PARALLEL), interval(...):
            tmp = inp * 2.0
        with computation(FORWARD), interval(...):
            out = tmp[0, 0, 1]

    nk = 4
    a = np.arange(nk, dtype=np.float64).reshape(1, 1, nk) * np.ones((2, 2, nk))
    out = np.full((2, 2, nk), -1.0)
    st(a, out, origin=(0, 0, 0))
    # interior levels read the next level's doubled value; the top level
    # reads the (zero-initialized) halo plane
    np.testing.assert_array_equal(out[:, :, :-1], 2.0 * a[:, :, 1:])
    np.testing.assert_array_equal(out[:, :, -1], 0.0)


def test_while_condition_function_call_rejected():
    from gt4py_tpu.cartesian.frontend import GTScriptSyntaxError

    @gtscript.function
    def helper(x):
        return x * 2.0

    with pytest.raises(GTScriptSyntaxError, match="while conditions"):

        @gtscript.stencil(backend="numpy")
        def st(x: Field3D):
            with computation(PARALLEL), interval(...):
                while helper(x) < 3.0:
                    x = x + 1.0


def test_keyword_only_params_not_positional():
    from gt4py_tpu.cartesian.stencil_object import ArgumentError

    @gtscript.stencil(backend="numpy")
    def st(a: Field3D, *, w: float):
        with computation(PARALLEL), interval(...):
            a = a * w

    arr = np.ones((2, 2, 2))
    with pytest.raises(ArgumentError, match="keyword-only"):
        st(arr, 2.0, origin=(0, 0, 0))
    st(arr, w=2.0, origin=(0, 0, 0))
    np.testing.assert_array_equal(arr, 2.0)


def test_debug_backend_alias():
    @gtscript.stencil(backend="debug")
    def st(a: Field3D, b: Field3D):
        with computation(PARALLEL), interval(...):
            b = a

    a, b = np.ones((2, 2, 2)), np.zeros((2, 2, 2))
    st(a, b, origin=(0, 0, 0))
    np.testing.assert_array_equal(b, 1.0)


def test_gridio_numpy_fallback(tmp_path, monkeypatch):
    import gt4py_tpu.io as gio

    monkeypatch.setattr(gio, "_lib", None)
    monkeypatch.setattr(gio, "_build_failed", True)  # force the fallback
    arr = np.random.default_rng(0).random((3, 4))
    p = str(tmp_path / "g.gtg")
    gio.save_grid(p, arr)
    dt, shape = gio.probe_grid(p)
    assert shape == (3, 4)
    np.testing.assert_array_equal(gio.load_grid(p), arr)


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_masked_write_in_extended_unit(backend):
    """A field masked-written inside an `if` grouped with larger-extent
    sibling writes is computed over the whole unit extent; its buffer must
    be allocated to that extent (fuzzer seeds 93/282/333: numpy oracle
    broadcast ValueError when `small`'s buffer only covered its own reads).
    Reference analog: per-assignment HorizontalExecutions keep extents
    separate (gtc/passes/oir_optimizations/horizontal_execution_merging.py);
    our coarser if-units must instead extend the allocation."""

    @gtscript.stencil(backend=backend)
    def st(inp: Field3D, out: Field3D):
        with computation(PARALLEL), interval(...):
            tmp = inp + 1.0
            small = inp * 2.0
            if inp > 0.5:
                small = tmp
                big = inp
            else:
                big = -inp
            out = big[1, 0, 0] + big[-1, 0, 0] + small

    rng = np.random.default_rng(7)
    inp = rng.random((10, 9, 4))
    out = np.zeros((10, 9, 4))
    st(inp, out, origin=(1, 1, 0), domain=(8, 7, 4))

    tmp = inp + 1.0
    small = np.where(inp > 0.5, tmp, inp * 2.0)
    big = np.where(inp > 0.5, inp, -inp)
    expect = big[2:, 1:-1] + big[:-2, 1:-1] + small[1:-1, 1:-1]
    np.testing.assert_allclose(out[1:-1, 1:-1], expect, rtol=1e-13)


def test_api_write_halo_requirement():
    """An API output masked-written in an extended unit gains a write-halo
    boundary requirement, enforced at call validation."""

    @gtscript.stencil(backend="numpy")
    def st(inp: Field3D, out: Field3D, out2: Field3D):
        with computation(PARALLEL), interval(...):
            if inp > 0.5:
                out2 = inp
                big = inp
            else:
                out2 = -inp
                big = inp * 3.0
            out = big[1, 0, 0] + big[-1, 0, 0]

    from gt4py_tpu.cartesian.stencil_object import ArgumentError

    inp = np.random.default_rng(0).random((10, 9, 4))
    o, o2 = np.zeros((10, 9, 4)), np.zeros((8, 7, 4))
    with pytest.raises(ArgumentError, match="halo requirement"):
        st(inp, o, o2, domain=(8, 7, 4),
           origin={"inp": (1, 1, 0), "out": (1, 1, 0), "out2": (0, 0, 0)})
