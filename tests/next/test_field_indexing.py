"""Field restriction / assignment index specs.

Reference semantics: relative ints/slices/Ellipsis and absolute
(dim, index) pairs restrict a field's domain; int indices drop the
dimension; slices never clip (embedded/common.py:33-116 sub_domain,
:163-178 _slice_range; nd_array_field.py:378-401 restrict/__setitem__,
:1070-1084 jax functional __setitem__).
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dims, Field
from gt4py_tpu.next.common import Domain, UnitRange

I = gtx.Dimension("I")
J = gtx.Dimension("J")
K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)


def _mk(allocator=None):
    data = np.arange(20, dtype=np.float32).reshape(4, 5)
    return gtx.as_field((I, J), data, allocator=allocator), data


class TestRelativeIndexing:
    def test_slice_first_dim(self):
        f, data = _mk()
        r = f[1:-1]
        assert r.domain == Domain((I, J), (UnitRange(1, 3), UnitRange(0, 5)))
        np.testing.assert_array_equal(r.asnumpy(), data[1:3])

    def test_tuple_of_slices(self):
        f, data = _mk()
        r = f[1:3, 2:5]
        assert r.domain.shape == (2, 3)
        np.testing.assert_array_equal(r.asnumpy(), data[1:3, 2:5])

    def test_int_drops_dimension(self):
        f, data = _mk()
        r = f[2]
        assert r.dims == (J,)
        np.testing.assert_array_equal(r.asnumpy(), data[2])
        r2 = f[-1, 1:4]
        assert r2.dims == (J,)
        np.testing.assert_array_equal(r2.asnumpy(), data[3, 1:4])

    def test_ellipsis(self):
        f, data = _mk()
        r = f[..., 1:-1]
        assert r.domain == Domain((I, J), (UnitRange(0, 4), UnitRange(1, 4)))
        np.testing.assert_array_equal(r.asnumpy(), data[:, 1:4])

    def test_relative_to_nonzero_start(self):
        # slices are relative to the domain start, not absolute indices
        f, _ = _mk()
        g = f[1:-1]  # I[1:3)
        h = g[1:]  # relative: I[2:3)
        assert h.domain[I] == UnitRange(2, 3)

    def test_no_clipping(self):
        f, _ = _mk()
        with pytest.raises(IndexError):
            f[0:9]
        with pytest.raises(IndexError):
            f[10]
        with pytest.raises(IndexError):
            f[1, 2, 3]

    def test_step_rejected(self):
        f, _ = _mk()
        with pytest.raises(IndexError):
            f[::2]

    def test_empty_slice_canonical_range(self):
        # crossing bounds yield a canonical empty range, never stop<start
        f, _ = _mk()
        r = f[2:-5]  # start 2, stop -1 -> empty
        assert r.domain[I] == UnitRange(2, 2)
        assert r.domain[I].is_empty() and r.shape[0] == 0

    def test_domain_getitem_is_strict(self):
        # f[Domain] is strict like (dim, range) pairs and __setitem__;
        # .restrict() keeps the intersecting semantics
        f, _ = _mk()
        over = Domain((I,), (UnitRange(2, 99),))
        with pytest.raises(IndexError):
            f[over]
        assert f.restrict(over).domain[I] == UnitRange(2, 4)
        # unbounded request bounds clamp to the field's edge (K < 5 style)
        half = f[I < 2]
        assert half.domain[I] == UnitRange(0, 2)


class TestAbsoluteIndexing:
    def test_named_range_pair(self):
        f, data = _mk()
        r = f[(J, (1, 4))]
        assert r.domain == Domain((I, J), (UnitRange(0, 4), UnitRange(1, 4)))
        np.testing.assert_array_equal(r.asnumpy(), data[:, 1:4])

    def test_named_int_drops_dim(self):
        f, data = _mk()
        r = f[(J, 2)]
        assert r.dims == (I,)
        np.testing.assert_array_equal(r.asnumpy(), data[:, 2])

    def test_pair_list(self):
        f, data = _mk()
        r = f[[(I, UnitRange(1, 3)), (J, 2)]]
        assert r.dims == (I,)
        assert r.domain[I] == UnitRange(1, 3)
        np.testing.assert_array_equal(r.asnumpy(), data[1:3, 2])

    def test_unknown_dim(self):
        f, _ = _mk()
        with pytest.raises(IndexError):
            f[(K, 1)]

    def test_containment_enforced(self):
        f, _ = _mk()
        with pytest.raises(IndexError):
            f[(I, (2, 9))]
        with pytest.raises(IndexError):
            f[(I, 17)]


class TestSetitem:
    def test_numpy_in_place(self):
        f, data = _mk(allocator="numpy")
        f[1:3, 2] = -7.0
        np.testing.assert_array_equal(np.asarray(f.ndarray)[:, 2], [2, -7, -7, 17])

    def test_jax_functional(self):
        f, _ = _mk()
        f[1] = 5.0
        out = np.asarray(f.ndarray)
        np.testing.assert_array_equal(out[1], np.full(5, 5.0))
        assert out[0, 0] == 0.0

    def test_field_value_domain_checked(self):
        f, _ = _mk(allocator="numpy")
        # matching source domain: writes land
        src = gtx.as_field((I, J), np.full((2, 5), 9.0, np.float32), allocator="numpy")
        assert src.domain == f[0:2].domain
        f[0:2] = src
        np.testing.assert_array_equal(np.asarray(f.ndarray)[0], np.full(5, 9.0))
        # mismatching source domain: rejected
        bad = gtx.as_field((I, J), np.ones((3, 5), np.float32), allocator="numpy")
        with pytest.raises(ValueError):
            f[0:2] = bad

    def test_named_setitem(self):
        f, _ = _mk(allocator="numpy")
        f[(I, 0)] = 3.0
        np.testing.assert_array_equal(np.asarray(f.ndarray)[0], np.full(5, 3.0))

    def test_broadcast_axis_write_rejected(self):
        """Writing a sub-range of a broadcast (size-1 buffer) axis would
        silently hit every logical point; rejected instead."""
        from gt4py_tpu.next import broadcast

        f = gtx.as_field((I,), np.arange(4.0))
        b = broadcast(f, (I, J))  # J is a size-1 broadcast axis
        with pytest.raises(ValueError, match="broadcast dimension"):
            b[:, 0:1] = 99.0
        with pytest.raises(ValueError, match="broadcast dimension"):
            b[(J, 0)] = 99.0


class TestOutSlicing:
    """out= with a restricted field: numpy-backed restriction is a VIEW,
    so writes reach the caller's buffer (reference embedded behavior)."""

    def test_numpy_out_view(self):
        @gtx.field_operator
        def add(
            a: Field[Dims[I, J], gtx.float32], b: Field[Dims[I, J], gtx.float32]
        ) -> Field[Dims[I, J], gtx.float32]:
            return a + b

        a = gtx.as_field((I, J), np.ones((4, 5), np.float32), allocator="numpy")
        b = gtx.as_field((I, J), np.ones((4, 5), np.float32), allocator="numpy")
        out = gtx.as_field((I, J), np.zeros((4, 5), np.float32), allocator="numpy")
        view = out[1:-1]
        assert view.ndarray.base is out.ndarray
        add(a[1:-1], b[1:-1], out=view)
        np.testing.assert_array_equal(
            np.asarray(out.ndarray)[:, 0], [0.0, 2.0, 2.0, 0.0]
        )


class TestProgramOutSlicing:
    """Program-body ``out=field[slices]`` (reference:
    past_to_itir._compute_field_slice :188-208)."""

    def _setup(self):
        @gtx.field_operator
        def add(
            a: Field[Dims[I, J], gtx.float64], b: Field[Dims[I, J], gtx.float64]
        ) -> Field[Dims[I, J], gtx.float64]:
            return a + b

        @gtx.program
        def prog(
            a: Field[Dims[I, J], gtx.float64],
            b: Field[Dims[I, J], gtx.float64],
            out: Field[Dims[I, J], gtx.float64],
        ):
            add(a, b, out=out[1:-1, :])

        return add, prog

    def test_embedded_jax(self):
        _, prog = self._setup()
        a = gtx.as_field((I, J), np.ones((4, 5)))
        b = gtx.as_field((I, J), np.ones((4, 5)))
        o = gtx.as_field((I, J), np.zeros((4, 5)))
        prog(a, b, o)
        np.testing.assert_array_equal(
            np.asarray(o.ndarray)[:, 0], [0.0, 2.0, 2.0, 0.0]
        )

    def test_embedded_numpy_oracle(self):
        _, prog = self._setup()
        a = gtx.as_field((I, J), np.ones((4, 5)), allocator="numpy")
        b = gtx.as_field((I, J), np.ones((4, 5)), allocator="numpy")
        o = gtx.as_field((I, J), np.zeros((4, 5)), allocator="numpy")
        from gt4py_tpu.next import backends

        prog.with_backend(backends.numpy_oracle)(a, b, o)
        np.testing.assert_array_equal(
            np.asarray(o.ndarray)[:, 0], [0.0, 2.0, 2.0, 0.0]
        )

    def test_jit_program(self):
        _, prog = self._setup()
        from gt4py_tpu.next import backends

        pj = prog.with_backend(backends.jax_jit)
        a = gtx.as_field((I, J), np.ones((4, 5)))
        b = gtx.as_field((I, J), np.ones((4, 5)))
        o = gtx.as_field((I, J), np.zeros((4, 5)))
        pj(a, b, o)
        np.testing.assert_array_equal(
            np.asarray(o.ndarray)[:, 0], [0.0, 2.0, 2.0, 0.0]
        )

    def test_out_slice_out_of_range(self):
        from gt4py_tpu.next.frontend import FieldViewError

        @gtx.field_operator
        def ident(
            a: Field[Dims[I, J], gtx.float64]
        ) -> Field[Dims[I, J], gtx.float64]:
            return a

        @gtx.program
        def prog2(
            a: Field[Dims[I, J], gtx.float64],
            out: Field[Dims[I, J], gtx.float64],
        ):
            ident(a, out=out[0:99, :])

        a = gtx.as_field((I, J), np.ones((2, 5)))
        o = gtx.as_field((I, J), np.zeros((2, 5)))
        with pytest.raises(FieldViewError, match="out of range"):
            prog2(a, o)

    def test_out_slice_partial_coverage_is_located_error(self):
        """Inputs that cannot cover a sliced out= target raise the domain
        check's located error instead of a silently shrunk write."""
        add, _ = self._setup()
        from gt4py_tpu.next.frontend import FieldViewError

        @gtx.program
        def prog3(
            a: Field[Dims[I, J], gtx.float64],
            b: Field[Dims[I, J], gtx.float64],
            out: Field[Dims[I, J], gtx.float64],
        ):
            add(a, b, out=out[1:-1, :])

        a = gtx.as_field((I, J), np.ones((2, 5)))
        b = gtx.as_field((I, J), np.ones((2, 5)))
        o = gtx.as_field((I, J), np.zeros((4, 5)))
        with pytest.raises(FieldViewError, match="must cover"):
            prog3(a, b, o)

    def test_slicing_rejected_in_operators(self):
        from gt4py_tpu.next.frontend import FieldViewError

        with pytest.raises(FieldViewError, match="only allowed on out="):

            @gtx.field_operator
            def bad(a: Field[Dims[I, J], gtx.float64]) -> Field[Dims[I, J], gtx.float64]:
                return a[1:-1]

    def test_text_round_trip(self):
        _, prog = self._setup()
        from gt4py_tpu.next.unparse import reparse, unparse

        text = unparse(prog.ir)
        assert "out[1:-1, :]" in text
        ir2 = reparse(prog.ir)
        from gt4py_tpu.next.unparse import unparse as up

        assert up(ir2) == text
