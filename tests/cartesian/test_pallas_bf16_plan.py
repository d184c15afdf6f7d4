"""Packing-aware pallas tile planning: 16-bit dtypes DMA at the (16, 128)
VMEM tiling, so aligned-mode plans must expand halos and pick tile sizes on
the per-dtype sublane multiple.  These tests drive the planner directly
with aligned=True (the test session pins CPU, where kernels otherwise run
in interpret mode and skip alignment); kernel execution itself is covered
by the parity/fuzz suites in interpret mode and by tests/test_tpu_chip.py
on real Mosaic."""

import ml_dtypes
import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.backend.jax_backend import _FieldMeta
from gt4py_tpu.cartesian.backend.pallas_backend import _pad_tile, _sublane
from gt4py_tpu.cartesian.gtscript import PARALLEL, FORWARD, bfloat16, computation, interval

BF16 = np.dtype(ml_dtypes.bfloat16)
F32 = np.dtype(np.float32)

FieldBF = gtscript.Field[bfloat16]


def test_sublane_by_dtype():
    assert _sublane(np.float32) == 8
    assert _sublane(np.int32) == 8
    assert _sublane(ml_dtypes.bfloat16) == 16
    assert _sublane(np.float16) == 16
    assert _sublane(np.int8) == 32
    assert _sublane(np.bool_) == 32
    assert _sublane(np.float64) == 8  # 64-bit never reaches Mosaic


def test_pad_tile_respects_packing():
    assert _pad_tile(9, 130) == (16, 256)
    assert _pad_tile(9, 130, 16) == (16, 256)
    assert _pad_tile(17, 128, 16) == (32, 128)
    assert _pad_tile(1, 1, 16) == (1, 1)


def _meta(dtype, origin=(16, 128, 0), shape=(160, 384, 8)):
    return _FieldMeta(
        shape=shape, origin=origin, dtype=np.dtype(dtype),
        dimensions=(True, True, True), data_ndim=0,
    )


def _backend():
    def defn(inp: FieldBF, out: FieldBF):
        with computation(PARALLEL), interval(...):
            out = inp[1, 0, 0] + inp[-2, 0, 0]

    return gtscript.stencil(backend="pallas", name="bf16_planner")(defn).backend


def test_bf16_halos_align_to_16():
    be = _backend()
    metas = {"inp": _meta(BF16), "out": _meta(BF16)}
    halos = be._halos_ij(metas, aligned=True, domain=(128, 128, 8), expand_j=False)
    hi0, hi1, _, _ = halos["inp"]
    oi = metas["inp"].origin[0]
    assert (oi - hi0) % 16 == 0  # DMA window start on the packing
    assert (hi0 + hi1) % 16 == 0  # window size stays a multiple too
    assert hi0 >= 2 and hi1 >= 1  # still covers the stencil extents


def test_bf16_row_plan_tiles_are_16_multiples():
    be = _backend()
    metas = {"inp": _meta(BF16), "out": _meta(BF16)}
    TK, TI, halos, slots = be._plan_rows(metas, (128, 128, 8), aligned=True)
    assert TI % 16 == 0


def test_mixed_f32_bf16_uses_strictest_packing():
    be = _backend()
    metas = {"inp": _meta(BF16), "out": _meta(F32)}
    assert be._sub_max(metas) == 16
    TK, TI, halos, slots = be._plan_rows(metas, (128, 128, 8), aligned=True)
    assert TI % 16 == 0


def test_f32_plans_unchanged_by_packing_awareness():
    """sub=8 must reproduce the pre-change behavior exactly for 4-byte
    dtypes (the production f32 path)."""
    be = _backend()
    metas = {"inp": _meta(F32, origin=(8, 128, 0)), "out": _meta(F32, origin=(8, 128, 0))}
    halos = be._halos_ij(metas, aligned=True, domain=(128, 128, 8), expand_j=False)
    hi0, hi1, _, _ = halos["inp"]
    assert (8 - hi0) % 8 == 0 and (hi0 + hi1) % 8 == 0
    TK, TI, h2, slots = be._plan_rows(metas, (128, 128, 8), aligned=True)
    assert TI % 8 == 0
