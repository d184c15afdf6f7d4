"""Differential fuzzing: random IR programs, numpy oracle vs jax executor."""

import pytest

from gt4py_tpu.testing.program_gen import run_differential_case


@pytest.mark.parametrize("seed", range(40))
def test_random_program_backend_parity(seed):
    run_differential_case(seed)
