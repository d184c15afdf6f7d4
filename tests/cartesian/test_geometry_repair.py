"""Aligned-geometry repair (VERDICT r4 #2 follow-through).

Aligned (TPU) planning demands DMA windows on the dtype's (sub, 128)
tiling inside the user's buffers and tileable domain sizes; exact
1-wide halos and domains like 514 (= 2 x 257, no sublane-divisible
tile) used to silently de-kernel ON CHIP.  The repair path functionally
pads the offending buffers (and, for untileable domains, computes over
a rounded-up domain whose extra rows are discarded at splice-back) and
retries -- keeping such stencils on the Mosaic kernel path.

These tests force aligned planning on CPU (config.ASSUME_TPU_PLANNING)
so the repair path EXECUTES (interpret mode) and is checked against the
numpy oracle.  f32 tolerance: XLA's excess-precision FMA fusion means
pallas vs numpy is a couple of f32 ulps, not bitwise (CLAUDE.md).
"""

import warnings

import numpy as np
import pytest

from gt4py_tpu import config
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, computation, interval
from gt4py_tpu.cartesian.backend import pallas_backend as pb

F32 = gtscript.Field[np.float32]


@pytest.fixture(autouse=True)
def _assume_tpu(monkeypatch):
    monkeypatch.setattr(config, "ASSUME_TPU_PLANNING", True)
    yield


def _mk(shape, seed):
    return np.random.default_rng(seed).random(shape).astype(np.float32)


def _run_pair(defn, fields, origins, domain, tag, expect_kernel=True):
    outs = {}
    for backend in ("numpy", "pallas"):
        st = gtscript.stencil(backend=backend, name=f"{tag}_{backend}")(defn)
        arrs = {k: v.copy() for k, v in fields.items()}
        cur = pb.FALLBACK_EVENTS.cursor()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            st(**arrs, origin=dict(origins), domain=domain)
        if backend == "pallas" and expect_kernel:
            ev = pb.FALLBACK_EVENTS.since(cur)
            assert not ev, f"{tag} fell back: {ev}"
        outs[backend] = arrs
    for k in fields:
        np.testing.assert_allclose(
            outs["pallas"][k],
            outs["numpy"][k],
            rtol=2e-6,
            atol=2e-7,
            err_msg=f"{tag}/{k}",
        )
    return pb.LAST_PLAN.get(f"{tag}_pallas")


def test_exact_halo_buffers_repair_to_kernel():
    """1-wide halos + J rows that are not lane multiples: buffer pads
    keep the kernel (the r4 on-chip `next_out_op` geometry class)."""

    def outop(inp: F32, fx: F32, fy: F32, coeff: F32, res: F32):
        with computation(PARALLEL), interval(...):
            res = inp - coeff * (fx - fx[-1, 0, 0] + fy - fy[0, -1, 0])

    dI, dJ, dK = 16, 256, 4
    fields = {
        "inp": _mk((dI, dJ, dK), 0),
        "coeff": _mk((dI, dJ, dK), 1),
        "fx": _mk((dI + 1, dJ, dK), 2),
        "fy": _mk((dI, dJ + 1, dK), 3),
        "res": np.zeros((dI, dJ, dK), np.float32),
    }
    origins = {
        "inp": (0, 0, 0),
        "coeff": (0, 0, 0),
        "fx": (1, 0, 0),
        "fy": (0, 1, 0),
        "res": (0, 0, 0),
    }
    plan = _run_pair(outop, fields, origins, (dI, dJ, dK), "repair_outop")
    assert plan and plan.get("repair"), plan


def test_untileable_domain_pads_and_discards():
    """dI=10 (2x5: no sublane tile), dJ=130: the kernel computes the
    rounded-up (16, 256) domain; extra rows are discarded and buffer
    content outside the true write window is preserved (result buffer
    allocated LARGER than the write window on purpose)."""

    def lapd(a: F32, b: F32):
        with computation(PARALLEL), interval(...):
            b = a[1, 0, 0] + a[-1, 0, 0] + a[0, 1, 0] + a[0, -1, 0] - 4.0 * a

    fields = {"a": _mk((12, 132, 4), 4), "b": _mk((14, 140, 4), 5)}
    plan = _run_pair(
        lapd, fields, {"a": (1, 1, 0), "b": (2, 3, 0)}, (10, 130, 4), "repair_lapd"
    )
    assert plan and plan.get("repair_domain") == (16, 256), plan


def test_serial_k_partial_intervals_with_domain_padding():
    """Serial-K (mode B) + partial-interval writes: untouched K planes
    and out-of-window rows keep their original values through the
    padded-domain splice-back."""

    def serk(a: F32, b: F32):
        with computation(FORWARD):
            with interval(0, 1):
                b = a
            with interval(1, 3):
                b = b[0, 0, -1] * 0.5 + a

    fields = {"a": _mk((10, 130, 5), 6), "b": _mk((10, 130, 5), 7)}
    plan = _run_pair(
        serk,
        fields,
        {"a": (0, 0, 0), "b": (0, 0, 0)},
        (10, 130, 5),
        "repair_serk",
    )
    assert plan and plan.get("repair_domain") == (16, 256), plan


def test_while_blocks_domain_padding_but_stays_correct():
    """Garbage rows could make a `while` diverge, so domain padding is
    gated off for While stencils -- fallback is allowed, parity is not
    negotiable."""

    def wl(a: F32, b: F32):
        with computation(PARALLEL), interval(...):
            x = a
            while x < 1.0:
                x = x * 2.0 + 0.1
            b = x

    fields = {"a": _mk((10, 130, 4), 8) * 0.5, "b": _mk((10, 130, 4), 9)}
    _run_pair(
        wl,
        fields,
        {"a": (0, 0, 0), "b": (0, 0, 0)},
        (10, 130, 4),
        "repair_wl",
        expect_kernel=False,
    )


def test_aligned_geometry_needs_no_repair():
    """Well-aligned buffers plan WITHOUT repair (no pad overhead on the
    production-geometry path)."""

    def lap(a: F32, b: F32):
        with computation(PARALLEL), interval(...):
            b = a[1, 0, 0] + a[-1, 0, 0] - 2.0 * a

    fields = {"a": _mk((32, 256, 4), 10), "b": np.zeros((16, 256, 4), np.float32)}
    plan = _run_pair(
        lap, fields, {"a": (8, 0, 0), "b": (0, 0, 0)}, (16, 256, 4), "repair_none"
    )
    assert plan and "repair" not in plan, plan


def test_mode_a_j_row_trim_geometry_and_parity():
    """Non-periodic mode-A tiles trim the J row after
    roundup(oj + dJ + hj1, 128): same values, less DMA.  Buffer carries
    256 lanes of alignment slack beyond the window end."""

    def lap(a: F32, b: F32):
        with computation(PARALLEL), interval(...):
            b = a[0, 1, 0] + a[0, -1, 0] - 2.0 * a

    dI, dJ, dK = 16, 256, 4
    fields = {
        "a": _mk((dI, 128 + dJ + 256, dK), 20),
        "b": np.zeros((dI, 128 + dJ + 256, dK), np.float32),
    }
    origins = {"a": (0, 128, 0), "b": (0, 128, 0)}
    plan = _run_pair(lap, fields, origins, (dI, dJ, dK), "trimlap")
    assert plan and plan.get("mode_a") and plan.get("trim_j"), plan


def test_end_anchored_region_with_domain_padding():
    """END-anchored horizontal regions must resolve against the TRUE
    domain when the kernel computes a rounded-up one: anchoring at the
    padded END writes the boundary region into discarded rows and
    leaves the true boundary on the base branch (r5 unaligned on-chip
    fuzz, seed 8003)."""
    from gt4py_tpu.cartesian.gtscript import I, J, horizontal, region

    def bc(a: F32, b: F32):
        with computation(PARALLEL), interval(...):
            b = a
            with horizontal(region[I[-1] - 1 :, :]):
                b = a + 1.0
            with horizontal(region[: I[0] + 1, J[-1] - 2 :]):
                b = a - 2.0

    fields = {"a": _mk((33, 228, 2), 11), "b": _mk((33, 228, 2), 12)}
    plan = _run_pair(
        bc, fields, {"a": (0, 0, 0), "b": (0, 0, 0)}, (33, 228, 2), "repair_region"
    )
    assert plan and plan.get("repair_domain") == (40, 256), plan


@pytest.mark.parametrize("seed", range(4))
def test_unaligned_fuzz_cpu(seed):
    """CPU mirror of the on-chip unaligned leg (same seed derivation:
    test_tpu_chip.test_unaligned_fuzz_on_chip): random programs at
    repair-triggering domains, interpret-mode kernels vs the oracle."""
    import random as _random

    from gt4py_tpu.testing.program_gen import run_differential_case

    rng = _random.Random((8000 + seed) * 31 + 7)
    domain = (rng.randint(9, 40), rng.randint(90, 300), rng.randint(1, 7))
    run_differential_case(
        8000 + seed,
        domain=domain,
        backends=("pallas",),
        dtype=np.float32,
        rtol=1e-3,
        atol=2e-4,
    )


@pytest.mark.parametrize("seed", range(3))
def test_unaligned_fuzz_bf16_cpu(seed):
    """bf16 repair geometry: pads follow the (16, 128) packed tiling
    (sublane multiple 16 for 2-byte dtypes); 30-seed offline sweep
    clean at r5."""
    import random as _random

    import ml_dtypes

    from gt4py_tpu.testing.program_gen import run_differential_case

    rng = _random.Random((8200 + seed) * 31 + 7)
    domain = (rng.randint(9, 40), rng.randint(90, 300), rng.randint(1, 7))
    run_differential_case(
        8200 + seed,
        domain=domain,
        backends=("pallas",),
        dtype=np.dtype(ml_dtypes.bfloat16),
        rtol=0.02,
        atol=0.01,
        allow_while=False,
    )
