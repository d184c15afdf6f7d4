"""Circular-J (lane-roll) mode of the pallas mode-A periodic kernels.

With ``periodic`` including "J", eligible all-PARALLEL stencils window
exactly the J domain (the full periodic circle) and evaluate J offsets
as lane rolls instead of halo-extended slices (pallas_backend.py).
These tests pin (a) that the mode actually engages (via LAST_PLAN --
matching results alone cannot distinguish kernel forms), (b) bitwise
oracle parity, and (c) every documented ineligibility gate.
"""

import numpy as np
import pytest

from gt4py_tpu import storage
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.backend import pallas_backend
from gt4py_tpu.cartesian.gtscript import (
    FORWARD,
    I,
    J,
    PARALLEL,
    computation,
    horizontal,
    interval,
    region,
)

F = gtscript.Field[np.float64]

NI, NJ, NK = 24, 16, 5
H = 2
SHAPE = (NI + 2 * H, NJ + 2 * H, NK)
INTERIOR = (slice(H, H + NI), slice(H, H + NJ), slice(None))


def _fill(a):
    a = a.copy()
    a[:H] = a[NI : NI + H]
    a[NI + H :] = a[H : 2 * H]
    a[:, :H] = a[:, NJ : NJ + H]
    a[:, NJ + H :] = a[:, H : 2 * H]
    return a


def _oracle(defn, a0):
    st = gtscript.stencil(backend="numpy")(defn)
    af = storage.from_array(_fill(a0), backend="numpy", aligned_index=(H, H, 0))
    bf = storage.zeros(SHAPE, backend="numpy", aligned_index=(H, H, 0))
    st(af, bf, domain=(NI, NJ, NK))
    return np.asarray(bf)


def _run_pallas(defn, a0, name):
    st = gtscript.stencil(backend="pallas", name=name)(defn)
    a = storage.from_array(a0.copy(), backend="numpy", aligned_index=(H, H, 0))
    b = storage.zeros(SHAPE, backend="numpy", aligned_index=(H, H, 0))
    st(a, b, domain=(NI, NJ, NK), periodic=("I", "J"))
    return np.asarray(b)


def test_circular_engages_and_matches_oracle():
    def two_stage(a: F, b: F):
        with computation(PARALLEL), interval(...):
            tmp = a[0, 1, 0] + a[0, -1, 0] + a[1, 0, 0]
            b = tmp[0, -1, 0] + tmp[0, 1, 0] + tmp[-1, 0, 0]

    rng = np.random.default_rng(11)
    a0 = rng.random(SHAPE)
    got = _run_pallas(two_stage, a0, "circ_two_stage")
    plan = pallas_backend.LAST_PLAN["circ_two_stage"]
    assert plan["mode_a"] and plan["circular"], plan
    expect = _oracle(two_stage, a0)
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_region_disables_circular():
    def with_region(a: F, b: F):
        with computation(PARALLEL), interval(...):
            tmp = a[0, 1, 0] + a[0, -1, 0]
            b = tmp[0, 1, 0]
            with horizontal(region[I[0] : I[0] + 2, J[0] : J[0] + 2]):
                b = 0.0

    rng = np.random.default_rng(12)
    a0 = rng.random(SHAPE)
    got = _run_pallas(with_region, a0, "circ_region")
    plan = pallas_backend.LAST_PLAN["circ_region"]
    assert not plan["circular"], plan
    expect = _oracle(with_region, a0)
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_axis_position_j_disables_circular():
    def with_jpos(a: F, b: F):
        with computation(PARALLEL), interval(...):
            tmp = a[0, 1, 0] + J
            b = tmp[0, 1, 0] + tmp[0, -1, 0]

    rng = np.random.default_rng(13)
    a0 = rng.random(SHAPE)
    got = _run_pallas(with_jpos, a0, "circ_jpos")
    plan = pallas_backend.LAST_PLAN["circ_jpos"]
    assert not plan["circular"], plan
    expect = _oracle(with_jpos, a0)
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_axis_position_i_keeps_circular():
    """I positions are unaffected by J circularity; the mode must stay on."""

    def with_ipos(a: F, b: F):
        with computation(PARALLEL), interval(...):
            tmp = a[0, 1, 0] + I
            b = tmp[0, 1, 0] + tmp[0, -1, 0]

    rng = np.random.default_rng(14)
    a0 = rng.random(SHAPE)
    got = _run_pallas(with_ipos, a0, "circ_ipos")
    plan = pallas_backend.LAST_PLAN["circ_ipos"]
    assert plan["circular"], plan
    expect = _oracle(with_ipos, a0)
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_serial_k_is_not_circular():
    def serial(a: F, b: F):
        with computation(FORWARD):
            with interval(0, 1):
                b = a[0, 1, 0]
            with interval(1, None):
                b = b[0, 0, -1] + a[0, -1, 0]

    rng = np.random.default_rng(15)
    a0 = rng.random(SHAPE)
    got = _run_pallas(serial, a0, "circ_serial")
    plan = pallas_backend.LAST_PLAN["circ_serial"]
    assert not plan["mode_a"] and not plan["circular"], plan
    expect = _oracle(serial, a0)
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_periodic_i_only_is_not_circular():
    """Circular mode needs J in the periodic axes."""

    def lap(a: F, b: F):
        with computation(PARALLEL), interval(...):
            b = a[1, 0, 0] + a[-1, 0, 0]

    a0 = np.random.default_rng(16).random(SHAPE)
    st = gtscript.stencil(backend="pallas", name="circ_i_only")(lap)
    a = storage.from_array(a0.copy(), backend="numpy", aligned_index=(H, H, 0))
    b = storage.zeros(SHAPE, backend="numpy", aligned_index=(H, H, 0))
    st(a, b, domain=(NI, NJ, NK), periodic=("I",))
    plan = pallas_backend.LAST_PLAN["circ_i_only"]
    assert not plan["circular"], plan


def test_halo_wider_than_domain_matches_oracle_error():
    """dJ < read halo: the oracle raises; circular must not silently wrap."""

    def wide(a: F, b: F):
        with computation(PARALLEL), interval(...):
            b = a[0, 3, 0] + a[0, -3, 0]

    shape = (10, 8, 3)
    st = gtscript.stencil(backend="pallas", name="circ_wide")(wide)
    a = storage.from_array(
        np.random.default_rng(17).random(shape), backend="numpy",
        aligned_index=(3, 3, 0),
    )
    b = storage.zeros(shape, backend="numpy", aligned_index=(3, 3, 0))
    with pytest.raises(ValueError, match="periodic J domain"):
        st(a, b, domain=(4, 2, 3), periodic=("J",))


def test_single_slot_execution(monkeypatch):
    """The single-slot (unpipelined) kernel form computes identical
    results across many tiles (store-drain ordering has no 2-slot slack
    to hide bugs behind)."""

    def two_stage(a: F, b: F):
        with computation(PARALLEL), interval(...):
            tmp = a[0, 1, 0] + a[0, -1, 0] + a[1, 0, 0]
            b = tmp[0, -1, 0] + tmp[0, 1, 0] + tmp[-1, 0, 0]

    rng = np.random.default_rng(21)
    a0 = rng.random(SHAPE)
    expect = _oracle(two_stage, a0)

    monkeypatch.setenv("GT4PY_TPU_PALLAS_SLOTS", "1")
    got = _run_pallas(two_stage, a0, "circ_1slot")
    plan = pallas_backend.LAST_PLAN["circ_1slot"]
    assert plan["slots"] == 1, plan
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_single_slot_serial_k(monkeypatch):
    """Mode B (serial K) under the single-slot form."""

    def serial(a: F, b: F):
        with computation(FORWARD):
            with interval(0, 1):
                b = a[0, 1, 0]
            with interval(1, None):
                b = b[0, 0, -1] + a[0, -1, 0]

    rng = np.random.default_rng(22)
    a0 = rng.random(SHAPE)
    expect = _oracle(serial, a0)

    monkeypatch.setenv("GT4PY_TPU_PALLAS_SLOTS", "1")
    got = _run_pallas(serial, a0, "circ_1slot_serial")
    plan = pallas_backend.LAST_PLAN["circ_1slot_serial"]
    assert plan["slots"] == 1 and not plan["mode_a"], plan
    assert np.array_equal(got[INTERIOR], expect[INTERIOR])


def test_planner_single_slot_fallback():
    """A VMEM budget below every 2-slot plan yields a 1-slot plan rather
    than abandoning the kernel path."""
    import gt4py_tpu.cartesian.backend.pallas_backend as pb

    def lap(a: F, b: F):
        with computation(PARALLEL), interval(...):
            b = a[1, 0, 0] + a[0, 1, 0]

    rng = np.random.default_rng(23)
    a0 = rng.random(SHAPE)
    _run_pallas(lap, a0, "circ_planner")
    assert pb.LAST_PLAN["circ_planner"]["slots"] == 2

    # shrink the budget until no 2-slot plan fits: the planner must
    # degrade to slots=1 before abandoning the kernel path
    orig = pb._VMEM_BUDGET
    try:
        budget = orig
        seen_one_slot = False
        for _ in range(200):
            budget = int(budget * 0.9)  # fine steps: the 1-slot window
            # between "2-slot impossible" and "nothing fits" is narrow
            pb._VMEM_BUDGET = budget
            name = f"circ_planner_b{budget}"
            got = _run_pallas(lap, a0, name)
            plan = pb.LAST_PLAN.get(name)
            if plan is None:  # XLA fallback: budget below every plan
                break
            if plan["slots"] == 1:
                seen_one_slot = True
                expect = _oracle(lap, a0)
                assert np.array_equal(got[INTERIOR], expect[INTERIOR])
                break
        assert seen_one_slot, "budget sweep never produced a 1-slot plan"
    finally:
        pb._VMEM_BUDGET = orig
