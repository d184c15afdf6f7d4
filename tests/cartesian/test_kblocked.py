"""Deep-K serial scans execute as K-blocked Pallas kernel passes.

Columns too deep for whole-column VMEM residency used to fall back to the
XLA executor (round-2 deferral).  Now each vertical loop becomes one pass,
cross-loop / K-offset temporaries are promoted to HBM buffers, and every
pass runs as a sequence of mode-B kernels over K blocks; the serial carry
flows through the threaded buffer's already-written planes.

Reference analog: FillFlushToLocalKCaches
(/root/reference/src/gt4py/cartesian/gtc/passes/oir_optimizations/caches.py:256)
-- the reference fills/flushes a register K-cache per block of the sequential
loop; here the "cache" is the VMEM tile window and the fill/flush targets are
the promoted HBM buffers.

These run in interpret mode on CPU; the same drivers execute on real Mosaic
via GT4PY_TPU_TEST_PLATFORM=tpu (tests/test_tpu_chip.py covers the on-chip
leg).
"""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.backend import pallas_backend
from gt4py_tpu.cartesian.gtscript import (
    BACKWARD,
    FORWARD,
    PARALLEL,
    computation,
    interval,
)

F = gtscript.Field[np.float64]

_SEQ = 0


def _run_pair(defn, args0, *, domain, origin=(0, 0, 0), expect_kb=True):
    """Run ``defn`` on numpy and pallas; assert the pallas run used the
    K-blocked plan with zero XLA fallbacks and matches the oracle."""
    global _SEQ
    _SEQ += 1
    res = {}
    for be in ("numpy", "pallas"):
        st = gtscript.stencil(backend=be, name=f"kb{_SEQ}_{be}")(defn)
        a = {k: v.copy() for k, v in args0.items()}
        before = len(pallas_backend.FALLBACK_EVENTS)
        st(**a, origin=origin, domain=domain)
        if be == "pallas":
            events = pallas_backend.FALLBACK_EVENTS[before:]
            assert not events, f"pallas fell back to XLA: {events}"
            plan = pallas_backend.LAST_PLAN.get(f"kb{_SEQ}_{be}")
            if expect_kb:
                assert plan and plan.get("kblocked"), plan
        res[be] = a
    for k in args0:
        np.testing.assert_allclose(
            res["pallas"][k], res["numpy"][k], rtol=1e-12, atol=0,
            err_msg=f"field {k}",
        )
    return pallas_backend.LAST_PLAN.get(f"kb{_SEQ}_pallas")


def _mk(shape, seed, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return lo + (hi - lo) * rng.random(shape)


def test_tridiagonal_dk512_runs_kblocked():
    def tridiag(inf: F, diag: F, sup: F, rhs: F, out: F):
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

    shape = (12, 12, 512)
    args = dict(
        inf=_mk(shape, 1, -0.3, 0.0),
        diag=_mk(shape, 2, 2.0, 3.0),
        sup=_mk(shape, 3, -0.3, 0.0),
        rhs=_mk(shape, 4),
        out=np.zeros(shape),
    )
    plan = _run_pair(
        tridiag, args, domain=(8, 8, 512), origin=(2, 2, 0)
    )
    assert plan["passes"] == 2
    # both the forward and backward pass block the 512 column
    assert all(kb < 512 for kb in plan["KB"]), plan


def test_promoted_cross_loop_temporary():
    # tmp is written in the FORWARD loop and read (with a K offset) in the
    # BACKWARD loop: it must be promoted to an HBM fill/flush buffer.
    def two_pass(a: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                tmp = a
            with interval(1, None):
                tmp = tmp[0, 0, -1] * 0.5 + a
        with computation(BACKWARD):
            with interval(-1, None):
                out = tmp
            with interval(0, -1):
                out = tmp + 0.25 * out[0, 0, 1]

    shape = (10, 10, 512)
    args = dict(a=_mk(shape, 7), out=np.zeros(shape))
    plan = _run_pair(two_pass, args, domain=shape)
    assert plan["promoted"], plan
    assert plan["passes"] == 2


def test_axis_position_rebases_across_blocks():
    # bare K in an expression is AxisPosition: block-relative evaluation
    # must still see GLOBAL K coordinates (+b0 rebase) or every block
    # beyond the first computes with wrong indices.
    def with_k(a: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = a * K
            with interval(1, None):
                out = out[0, 0, -1] + a * K

    shape = (9, 9, 600)
    args = dict(a=_mk(shape, 11), out=np.zeros(shape))
    _run_pair(with_k, args, domain=shape)


def test_non_power_of_two_depth():
    # dK=2000: ragged final block (2000 = 3*512 + 464) must carry correctly.
    def cumsum(a: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = a
            with interval(1, None):
                out = out[0, 0, -1] + a

    shape = (8, 8, 2000)
    args = dict(a=_mk(shape, 13), out=np.zeros(shape))
    _run_pair(cumsum, args, domain=shape)


def test_sections_crossing_block_boundaries():
    # interval edges that are not block-aligned: clipping must split the
    # section across blocks without dropping or duplicating planes.
    def staged(a: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = a
            with interval(1, 700):
                out = out[0, 0, -1] + a
            with interval(700, -3):
                out = out[0, 0, -1] + 2.0 * a
            with interval(-3, None):
                out = out[0, 0, -1] - a

    shape = (8, 8, 2048)
    args = dict(a=_mk(shape, 17), out=np.zeros(shape))
    _run_pair(staged, args, domain=shape)


def test_backward_only_deep_scan():
    def back(a: F, out: F):
        with computation(BACKWARD):
            with interval(-1, None):
                out = a
            with interval(0, -1):
                out = 0.5 * out[0, 0, 1] + a

    shape = (8, 8, 2048)
    args = dict(a=_mk(shape, 19), out=np.zeros(shape))
    plan = _run_pair(back, args, domain=shape)
    assert plan["passes"] == 1


def test_shallow_k_does_not_use_kblocked():
    # control: a dK=16 scan stays on the whole-column kernel path.
    def cumsum(a: F, out: F):
        with computation(FORWARD):
            with interval(0, 1):
                out = a
            with interval(1, None):
                out = out[0, 0, -1] + a

    shape = (16, 16, 16)
    args = dict(a=_mk(shape, 23), out=np.zeros(shape))
    plan = _run_pair(cumsum, args, domain=shape, expect_kb=False)
    assert not (plan or {}).get("kblocked"), plan


def test_parallel_cross_statement_k_dependency():
    """Regression (round-3 review): a PARALLEL statement reading a
    sibling statement's output at a K offset must see the fully-updated
    planes -- per-loop blocking interleaved the statements per block and
    served stale planes at every block boundary.  PARALLEL loops now
    split into one pass per STATEMENT."""
    def two_stmt(inp: F, out: F):
        with computation(PARALLEL):
            with interval(0, -1):
                tmp = inp * 2.0
            with interval(0, -1):
                out = tmp[0, 0, 1]

    shape = (12, 12, 512)
    args = dict(inp=_mk(shape, 29), out=np.zeros(shape))
    plan = _run_pair(two_stmt, args, domain=shape, expect_kb=False)
    # whichever plan executes it (whole-column kernel or K-blocked),
    # parity is the invariant; if blocked, tmp must have been promoted
    if plan and plan.get("kblocked"):
        assert plan["promoted"], plan
