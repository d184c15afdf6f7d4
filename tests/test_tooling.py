"""Instrumentation, checkpointing, caching and CLI tooling tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_metrics_collection(monkeypatch):
    from gt4py_tpu import config
    from gt4py_tpu import instrumentation as instr

    monkeypatch.setattr(config, "COLLECT_METRICS_LEVEL", 20)
    instr.collect_sample("prog_a", "compute_time", 0.25)
    instr.collect_sample("prog_a", "compute_time", 0.75)
    coll = instr.collection("prog_a")
    m = coll.metric("compute_time")
    assert m.count == 2 and abs(m.mean - 0.5) < 1e-12

    text = instr.dump_metrics()
    data = json.loads(text)
    assert data["prog_a"]["compute_time"]["count"] == 2


def test_metrics_disabled_by_default():
    from gt4py_tpu import instrumentation as instr

    before = instr.collection("prog_off").metric("t").count
    instr.collect_sample("prog_off", "t", 1.0)  # level disabled -> no-op
    assert instr.collection("prog_off").metric("t").count == before


def test_stencil_call_collects_metric(monkeypatch):
    from gt4py_tpu import config
    from gt4py_tpu import instrumentation as instr
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    monkeypatch.setattr(config, "COLLECT_METRICS_LEVEL", 20)

    @gtscript.stencil(backend="numpy", name="metrics_probe")
    def st(a: gtscript.Field[np.float64], b: gtscript.Field[np.float64]):
        with computation(PARALLEL), interval(...):
            b = a

    a, b = np.ones((3, 3, 3)), np.zeros((3, 3, 3))
    st(a, b, origin=(0, 0, 0))
    assert instr.collection("metrics_probe").metric("call_time").count >= 1


def test_profile_range_runs():
    from gt4py_tpu.instrumentation import profile_range

    with profile_range("unit-test-range"):
        pass


def test_checkpoint_roundtrip(tmp_path):
    from gt4py_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    state = {
        "u": np.random.default_rng(0).random((4, 5, 6)),
        "v": np.arange(10, dtype=np.int32),
    }
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, step=42, metadata={"note": "test"})
    loaded, meta = load_checkpoint(path)
    assert meta["step"] == 42 and meta["note"] == "test"
    np.testing.assert_array_equal(loaded["u"], state["u"])
    np.testing.assert_array_equal(loaded["v"], state["v"])


def test_checkpoint_roundtrip_bfloat16(tmp_path):
    """Extension dtypes (.npz loads them as raw void): stored as uint16
    views + a dtype tag, restored exactly."""
    import ml_dtypes

    from gt4py_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    bf = ml_dtypes.bfloat16
    state = {
        "q": np.random.default_rng(1).random((3, 4)).astype(bf),
        "u": np.ones((2, 2), dtype=np.float32),
    }
    path = str(tmp_path / "bf.npz")
    save_checkpoint(path, state, step=7)
    loaded, meta = load_checkpoint(path)
    assert meta["step"] == 7
    assert "__ext_dtypes__" not in meta  # consumed by the loader
    assert loaded["q"].dtype == np.dtype(bf)
    np.testing.assert_array_equal(
        loaded["q"].view(np.uint16), state["q"].view(np.uint16)
    )
    assert loaded["u"].dtype == np.float32


def test_checkpoint_restore_to_device(tmp_path):
    import jax.numpy as jnp

    from gt4py_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_to_device,
        save_checkpoint,
    )

    state = {"q": np.ones((2, 3))}
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, state)
    loaded, _ = load_checkpoint(path)
    dev = restore_to_device(loaded)
    assert isinstance(dev["q"], jnp.ndarray)


def test_cache_manager_cli(tmp_path):
    env = dict(os.environ)
    env["GT4PY_TPU_CACHE_ROOT"] = str(tmp_path / "cache")
    os.makedirs(tmp_path / "cache" / "xla_cache", exist_ok=True)
    (tmp_path / "cache" / "xla_cache" / "blob").write_bytes(b"x" * 100)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "gt4py_tpu.cache_manager", "info"],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    assert out.returncode == 0 and "files" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "gt4py_tpu.cache_manager", "clean"],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    assert out.returncode == 0
    assert not (tmp_path / "cache").exists()


def test_hook_machinery():
    import numpy as np

    from gt4py_tpu import instrumentation as instr
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    events = []

    @instr.stencil_build_hook.register
    def on_build(**kw):
        events.append(("build", kw["name"]))

    import contextlib

    @instr.stencil_call_context.register
    @contextlib.contextmanager
    def on_call(**kw):
        events.append(("call-start", kw["name"]))
        yield
        events.append(("call-end", kw["name"]))

    try:

        @gtscript.stencil(backend="numpy", name="hooked", rebuild=True)
        def st(a: gtscript.Field[np.float64], b: gtscript.Field[np.float64]):
            with computation(PARALLEL), interval(...):
                b = a

        a, b = np.ones((2, 2, 2)), np.zeros((2, 2, 2))
        st(a, b, origin=(0, 0, 0))
    finally:
        instr.stencil_build_hook.unregister(on_build)
        instr.stencil_call_context.unregister(on_call)

    assert ("build", "hooked") in events
    assert ("call-start", "hooked") in events and ("call-end", "hooked") in events


def test_event_log_trim_stable_cursor():
    """FALLBACK_EVENTS logs stay diffable across head trims (advisor r3):
    cursor()/since() never miss or duplicate events; total is monotonic."""
    from gt4py_tpu.core.events import EventLog

    log = EventLog(maxlen=8)
    for i in range(6):
        log.record(i)
    cur = log.cursor()
    assert cur == 6 and len(log) == 6
    for i in range(6, 12):  # crosses maxlen -> head trim
        log.record(i)
    assert log.total == 12
    assert len(log) <= 8
    # naive len()-slice idiom would now be wrong; since() is exact
    assert log.since(cur) == [6, 7, 8, 9, 10, 11][-len(log.since(cur)):]
    assert log.since(cur)[-1] == 11
    assert log.dropped_since(0) == log.trimmed
    log.clear()
    assert log.total == 12 and len(log) == 0
    log.record("x")
    assert log.since(12) == ["x"]


def test_fallback_warning_fires_once():
    """A kernel-path fallback surfaces as a PerformanceFallbackWarning
    (VERDICT r3: nothing surfaced the 3-5x cliff to non-opted-in users)."""
    import warnings

    from gt4py_tpu import config

    config._warned_fallbacks.clear()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        config.warn_fallback("stencil 'x'", "test reason")
        config.warn_fallback("stencil 'x'", "test reason")  # deduped (once)
        config.warn_fallback("stencil 'y'", "test reason")
    msgs = [w for w in rec if issubclass(w.category, config.PerformanceFallbackWarning)]
    assert len(msgs) == 2
    assert "staged-XLA" in str(msgs[0].message)


def test_estimate_flops_bytes():
    """The SOL model's IR accounting (tools/sol_table.py): weighted ops,
    once-per-field bytes, partial-K proration."""
    import numpy as np

    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.analysis import estimate_flops_bytes
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval, sqrt

    @gtscript.stencil(backend="numpy")
    def st(a: gtscript.Field[np.float32], b: gtscript.Field[np.float32]):
        with computation(PARALLEL):
            with interval(0, 1):
                b = sqrt(a) + a / a
            with interval(...):
                b = a * 2.0 + a[1, 0, 0]

    ir_st = st.analysis.stencil
    flops, bytes_pp = estimate_flops_bytes(ir_st, 10)
    # full-interval stmt: MUL(1) + ADD(1) = 2; [0,1) stmt: sqrt(4) +
    # DIV(4) + ADD(1) = 9 prorated by 1/10
    assert abs(flops - (2.0 + 0.9)) < 1e-9, flops
    # a read + b written, f32
    assert bytes_pp == 8.0, bytes_pp
