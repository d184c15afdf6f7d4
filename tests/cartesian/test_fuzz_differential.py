"""Differential fuzzing: random IR programs, numpy oracle vs jax executor
(and the pallas interpret-mode kernel path on a subset)."""

import numpy as np
import pytest

from gt4py_tpu.testing.program_gen import run_differential_case


@pytest.mark.parametrize("seed", range(100))
def test_random_program_backend_parity(seed):
    run_differential_case(seed)


@pytest.mark.parametrize("seed", range(40))
def test_random_program_pallas_parity(seed):
    run_differential_case(seed, backends=("pallas",))


@pytest.mark.parametrize("seed", range(12))
def test_random_program_pallas_f32_aligned(seed):
    """The Mosaic-eligible f32/aligned-geometry leg (interpret mode on
    CPU; the same cases run on a real chip via tests/test_tpu_chip.py)."""
    run_differential_case(
        seed,
        backends=("pallas",),
        dtype=np.float32,
        aligned=True,
        rtol=3e-5,
        atol=3e-6,
    )


@pytest.mark.parametrize("seed", [225, 513])
def test_fuzz_regression_dead_temp_dynamic_k(seed):
    """Sweep-found crash: a dead-code read of an unwritten temporary at a
    dynamic K position indexed a synthetic zeros VALUE with ref-style
    pl.ds slices inside the kernel trace (IndexError at trace time)."""
    run_differential_case(seed, backends=("pallas",))
