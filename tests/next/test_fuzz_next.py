"""Differential fuzzing of the field-view DSL: random operators run on
numpy-backed vs jax-backed Fields through the shared typed-IR
interpreter (the next analog of tests/cartesian/test_fuzz_differential)."""

import pytest

from gt4py_tpu.testing.next_fuzz import run_differential_case


@pytest.mark.parametrize("seed", range(60))
def test_random_field_operator_parity(seed):
    run_differential_case(seed)


@pytest.mark.parametrize("seed", range(60, 75))
def test_random_field_operator_jit_vmap_invariance(seed):
    """The jax path under jit and vmap must match the numpy oracle."""
    run_differential_case(seed, transforms=True)


@pytest.mark.parametrize("seed", range(20))
def test_random_field_operator_bf16(seed):
    """bfloat16 leg: the same generated operators with bf16 fields and
    scalars.  Exercises weak-literal adaptation into bf16 (incl. weak
    fields from where() of literals) and bf16 reductions."""
    import ml_dtypes

    run_differential_case(seed, dtype=ml_dtypes.bfloat16, rtol=0.02, atol=0.01)


@pytest.mark.parametrize("seed", range(40))
def test_random_program_parity(seed):
    """Random PROGRAMS (multi-statement, sliced/plain outs, domain= dict
    literals): numpy-oracle backend vs embedded-jax vs the jit/AOT pool."""
    from gt4py_tpu.testing.next_fuzz import run_program_case

    run_program_case(seed)
