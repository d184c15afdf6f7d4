"""Differential fuzzing: random IR programs, numpy oracle vs jax executor
(and the pallas interpret-mode kernel path on a subset)."""

import pytest

from gt4py_tpu.testing.program_gen import run_differential_case


@pytest.mark.parametrize("seed", range(40))
def test_random_program_backend_parity(seed):
    run_differential_case(seed)


@pytest.mark.parametrize("seed", range(12))
def test_random_program_pallas_parity(seed):
    run_differential_case(seed, backends=("pallas",))
