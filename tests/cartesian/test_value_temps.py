"""SSA value temporaries in pallas kernels (no per-temp VMEM scratch).

Single-assign PARALLEL temporaries are kept as values -- computed once
over their extent, sliced/rolled per read -- instead of scratch arrays.
These tests pin the classifier, the planner's liveness-peak accounting,
and numeric parity for the trickier write forms (partial-interval cover,
masked writes under ``if``) in interpret mode; the on-chip suite drives
the same machinery on real Mosaic.
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


def _backend_of(stencil_obj):
    return pallas_backend.PallasBackend(stencil_obj.analysis, {})


def test_fv_step_temps_all_value_eligible():
    from gt4py_tpu.models.fv_advection import make_fv_step

    st = make_fv_step(np.float32, backend="pallas")
    be = _backend_of(st)
    temps = set(be.analysis.stencil.temp_decls)
    assert temps, "fv_step lost its temporaries?"
    assert be._value_temp_names() == frozenset(temps)


def test_liveness_peak_below_sum():
    from gt4py_tpu.models.fv_advection import make_fv_step

    st = make_fv_step(np.float32, backend="pallas")
    be = _backend_of(st)
    vts = be._value_temp_names()
    assert len(vts) > 10
    peak = be._value_peak_bytes(lambda name: 1)
    # dozens of temps, but only a handful live at once
    assert peak < len(vts) / 2, (peak, len(vts))


def test_serial_and_while_temps_stay_refs():
    @gtscript.stencil(backend="pallas", name="vt_cls")
    def mixed(a: F, out: F, out2: F):
        with computation(PARALLEL), interval(...):
            ptmp = a * 2.0          # value-eligible
            wtmp = a
            while wtmp < 1.0:       # while-written: must stay a ref
                wtmp = wtmp + 0.5
            out = ptmp + wtmp
        with computation(FORWARD):
            with interval(0, 1):
                stmp = a            # serial-section temp: ref
                out2 = stmp
            with interval(1, None):
                stmp = stmp[0, 0, -1] + a
                out2 = stmp

    be = _backend_of(mixed)
    vts = be._value_temp_names()
    temps = set(be.analysis.stencil.temp_decls)
    assert "ptmp" in vts
    assert "wtmp" not in vts
    assert not any(t.startswith("stmp") and t in vts for t in temps)


@pytest.mark.parametrize("shape", [(10, 11, 6)])
def test_partial_interval_value_temp_parity(shape):
    # the temp's single write covers only part of its K range: the
    # zeros+update path must reproduce zero-initialized scratch semantics
    def defn(a: F, out: F):
        with computation(PARALLEL):
            with interval(1, -2):
                t = a * 3.0 + a[1, 0, 0]
            with interval(...):
                out = a
        with computation(PARALLEL), interval(1, -2):
            out = t + t[0, 1, 0]

    res = {}
    for be in ("numpy", "pallas"):
        st = gtscript.stencil(backend=be, name=f"vt_part_{be}")(defn)
        rng = np.random.default_rng(3)
        a = rng.random(shape)
        out = np.zeros(shape)
        before = len(pallas_backend.FALLBACK_EVENTS)
        st(a, out, domain=(shape[0] - 1, shape[1] - 1, shape[2]))
        if be == "pallas":
            assert not pallas_backend.FALLBACK_EVENTS[before:]
        res[be] = out
    np.testing.assert_allclose(res["pallas"], res["numpy"], rtol=1e-12)


def test_region_masked_value_temp_parity():
    # single write under a horizontal region: masked write over the
    # zeros "old" region
    from gt4py_tpu.cartesian.gtscript import I, horizontal, region

    def defn(a: F, out: F):
        with computation(PARALLEL), interval(...):
            with horizontal(region[I[0] : I[4], :]):
                t = a * 4.0
                out = t + t[1, 0, 0]

    res = {}
    for be in ("numpy", "pallas"):
        st = gtscript.stencil(backend=be, name=f"vt_if_{be}")(defn)
        rng = np.random.default_rng(4)
        a = rng.random((9, 8, 5))
        out = np.zeros((9, 8, 5))
        before = len(pallas_backend.FALLBACK_EVENTS)
        st(a, out, domain=(8, 8, 5))
        if be == "pallas":
            assert not pallas_backend.FALLBACK_EVENTS[before:]
        res[be] = out
    np.testing.assert_allclose(res["pallas"], res["numpy"], rtol=1e-12)


def test_forced_mosaic_value_temps():
    # the mosaic-only branches of the value-temp paths must be
    # CPU-reachable (VERDICT r2 #2 pattern)
    import gt4py_tpu.config as config

    old = config.FORCE_MOSAIC_TRACE
    config.FORCE_MOSAIC_TRACE = True
    try:
        def defn(a: F, out: F):
            with computation(PARALLEL), interval(...):
                lap = a[1, 0, 0] + a[-1, 0, 0] + a[0, 1, 0] + a[0, -1, 0] - 4.0 * a
                out = lap[1, 0, 0] - lap

        st_p = gtscript.stencil(backend="pallas", name="vt_mosaic_p")(defn)
        st_n = gtscript.stencil(backend="numpy", name="vt_mosaic_n")(defn)
        rng = np.random.default_rng(5)
        a = rng.random((12, 12, 4))
        op = np.zeros((12, 12, 4))
        on = np.zeros((12, 12, 4))
        st_p(a.copy(), op, origin=(2, 2, 0), domain=(8, 8, 4))
        st_n(a.copy(), on, origin=(2, 2, 0), domain=(8, 8, 4))
        np.testing.assert_allclose(op, on, rtol=1e-12)
    finally:
        config.FORCE_MOSAIC_TRACE = old
