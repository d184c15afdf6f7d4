"""Program AOT surface: .compile() / with_static_params / with_bound_args
wired to CompiledProgramsPool (reference: decorator.py:223-500 +
otf/compiled_program.py:319-680)."""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import (
    Dimension,
    Dims,
    Field,
    as_field,
    field_operator,
    program,
    zeros,
)

I = Dimension("I")
IF = Field[Dims[I], gtx.float64]

TRACES = []


@field_operator
def saxpy(x: IF, y: IF, a: float) -> IF:
    return x * a + y


def test_program_compile_and_dispatch_no_retrace():
    TRACES.clear()

    @field_operator
    def tracked(x: IF, a: float) -> IF:
        return x * a

    # count retraces through a wrapper operator is awkward; instead count
    # via the pool: after compile(), calling must hit the precompiled
    # executable (pool.compiled_keys unchanged, no new variants)
    @program
    def prog(x: IF, o: IF, a: float):
        tracked(x, a, out=o)

    p = prog.with_static_params("a")
    x = as_field((I,), np.arange(8.0))
    o = zeros({I: 8})
    p.compile((x, o), a=[2.0, 3.0], wait=True)
    assert len(p._pool.compiled_keys) == 2

    p(x, o, 2.0)
    np.testing.assert_array_equal(o.asnumpy(), np.arange(8.0) * 2)
    p(x, o, 3.0)
    np.testing.assert_array_equal(o.asnumpy(), np.arange(8.0) * 3)
    # both dispatches hit precompiled variants -- no new pool entries
    assert len(p._pool.compiled_keys) == 2


def test_program_compiled_unseen_static_compiles_on_demand():
    @field_operator
    def scale(x: IF, a: float) -> IF:
        return x * a

    @program
    def prog(x: IF, o: IF, a: float):
        scale(x, a, out=o)

    p = prog.with_static_params("a")
    x = as_field((I,), np.ones(4))
    o = zeros({I: 4})
    p.compile((x, o), a=[2.0], wait=True)
    p(x, o, 5.0)  # unseen static value: compiled on demand
    np.testing.assert_array_equal(o.asnumpy(), np.full(4, 5.0))
    assert len(p._pool.compiled_keys) == 2


def test_with_static_params_rejects_unknown():
    @program
    def prog(x: IF, o: IF):
        saxpy(x, x, 1.0, out=o)

    with pytest.raises(ValueError, match="not parameters"):
        prog.with_static_params("nope")
    with pytest.raises(ValueError, match="not parameters"):
        prog.with_bound_args(nope=3)


def test_bound_args_compose_with_compile():
    @field_operator
    def axpy(x: IF, y: IF, a: float) -> IF:
        return x * a + y

    @program
    def prog(x: IF, y: IF, o: IF, a: float):
        axpy(x, y, a, out=o)

    x = as_field((I,), np.arange(4.0))
    y = as_field((I,), np.ones(4))
    o = zeros({I: 4})
    bound = prog.with_bound_args(y=y).with_static_params("a")
    bound.compile((x, o), a=[10.0], wait=True)
    bound(x, o, 10.0)
    np.testing.assert_array_equal(o.asnumpy(), np.arange(4.0) * 10 + 1)


def test_embedded_and_compiled_agree():
    @field_operator
    def op(x: IF, y: IF) -> IF:
        return x * 2.0 + y

    @program
    def prog(x: IF, y: IF, o: IF):
        op(x, y, out=o)

    rng = np.random.default_rng(0)
    x = as_field((I,), rng.random(16))
    y = as_field((I,), rng.random(16))
    o1 = zeros({I: 16})
    o2 = zeros({I: 16})
    prog(x, y, o1)  # embedded

    compiled = program(prog.definition)
    compiled.compile((x, y, o2), wait=True)
    compiled(x, y, o2)
    np.testing.assert_array_equal(o1.asnumpy(), o2.asnumpy())


def test_program_metrics_per_variant(monkeypatch):
    """Program calls record compute-time samples, keyed per static-arg
    variant on the compiled path (reference: compiled_program.py:66-88
    MetricsCollection per pool+variant; gtfn.py:61-78)."""
    import gt4py_tpu.config as config
    from gt4py_tpu.instrumentation import metrics

    monkeypatch.setattr(config, "COLLECT_METRICS_LEVEL", 20)  # PERFORMANCE
    metrics._COLLECTIONS.clear()

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, backends

    I = gtx.Dimension("I")

    @gtx.field_operator
    def scale(a: Field[Dims[I], gtx.float64], n: gtx.int64) -> Field[Dims[I], gtx.float64]:
        return a * gtx.astype(n, gtx.float64)

    @gtx.program
    def prog(a: Field[Dims[I], gtx.float64], n: gtx.int64, out: Field[Dims[I], gtx.float64]):
        scale(a, n, out=out)

    a = gtx.as_field((I,), np.arange(4.0))
    o = gtx.as_field((I,), np.zeros(4))

    # embedded path: one plain compute_time metric
    prog(a, np.int64(3), o)
    coll = metrics.collection("prog")
    assert coll.metric("compute_time").count == 1

    # compiled path with static n: per-variant metric keys; the first
    # call of a variant compiles synchronously and is NOT sampled
    pj = prog.with_backend(backends.jax_jit).with_static_params("n")
    pj(a, np.int64(3), o)  # compile n=3 (unsampled)
    pj(a, np.int64(5), o)  # compile n=5 (unsampled)
    pj(a, np.int64(3), o)  # sampled
    pj(a, 3, o)  # same variant (np.int64(3) == 3 canonicalized): sampled
    keys = [k for k in coll.metrics if k.startswith("compute_time[")]
    assert keys == ["compute_time[n=3]"], keys
    assert coll.metrics["compute_time[n=3]"].count == 2


def test_program_hooks_fire():
    """Hook-point parity (reference: instrumentation/hooks.py:11-18):
    program_call_context wraps every call, compile_variant_hook fires per
    compiled variant, compiled_program_call_context wraps dispatches."""
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, backends
    from gt4py_tpu.instrumentation import (
        compile_variant_hook,
        compiled_program_call_context,
        program_call_context,
    )

    I = Dimension("I")
    events = {"calls": [], "compiles": [], "dispatches": []}

    import contextlib

    @contextlib.contextmanager
    def on_call(name, compiled):
        events["calls"].append((name, compiled))
        yield

    @contextlib.contextmanager
    def on_dispatch(name, variant):
        events["dispatches"].append(variant)
        yield

    def on_compile(name, static_key):
        events["compiles"].append(static_key)

    program_call_context.register(on_call)
    compiled_program_call_context.register(on_dispatch)
    compile_variant_hook.register(on_compile)
    try:
        @gtx.field_operator
        def sc(a: Field[Dims[I], gtx.float64], w: gtx.float64) -> Field[Dims[I], gtx.float64]:
            return a * w

        @gtx.program
        def prog(a: Field[Dims[I], gtx.float64], o: Field[Dims[I], gtx.float64], w: gtx.float64):
            sc(a, w, out=o)

        a = as_field((I,), np.arange(4.0))
        o = zeros({I: 4})
        prog(a, o, 2.0)  # embedded
        pj = prog.with_backend(backends.jax_jit).with_static_params("w")
        pj(a, o, 2.0)
        pj(a, o, 3.0)
        pj(a, o, 2.0)
    finally:
        program_call_context.unregister(on_call)
        compiled_program_call_context.unregister(on_dispatch)
        compile_variant_hook.unregister(on_compile)

    assert events["calls"] == [
        ("prog", False), ("prog", True), ("prog", True), ("prog", True)
    ]
    assert sorted(events["compiles"]) == [(2.0,), (3.0,)]
    assert len(events["dispatches"]) == 3
