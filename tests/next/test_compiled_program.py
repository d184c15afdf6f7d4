"""CompiledProgramsPool: AOT static-arg variants
(reference: next/otf/compiled_program.py:161-680)."""

import numpy as np
import pytest

from gt4py_tpu.next.compiled_program import CompiledProgramsPool


def test_pool_precompile_and_dispatch():
    import jax.numpy as jnp

    calls = []

    def prog(x, *, n: int):
        calls.append(n)
        return x * n

    pool = CompiledProgramsPool(prog, static_params=("n",))
    x = jnp.ones((8, 8))
    pool.compile((x,), n=[2, 3], wait=True)
    assert len(pool.compiled_keys) == 2

    traces = len(calls)
    assert float(pool(x, n=2).sum()) == 128.0
    assert float(pool(x, n=3).sum()) == 192.0
    # dispatch used the precompiled executables: no retraces
    assert len(calls) == traces


def test_pool_unseen_combo_compiles_on_demand():
    import jax.numpy as jnp

    def prog(x, *, k: int):
        return x + k

    pool = CompiledProgramsPool(prog, static_params=("k",))
    x = jnp.zeros((4,))
    assert float(pool(x, k=7).sum()) == 28.0
    assert len(pool.compiled_keys) == 1


def test_pool_rejects_unknown_static():
    pool = CompiledProgramsPool(lambda x: x, static_params=())
    with pytest.raises(ValueError, match="not static params"):
        pool.compile((), bogus=[1])


def test_pool_missing_static_argument():
    import jax.numpy as jnp

    pool = CompiledProgramsPool(lambda x, *, n: x * n, static_params=("n",))
    with pytest.raises(TypeError, match="missing static"):
        pool(jnp.ones(3))
