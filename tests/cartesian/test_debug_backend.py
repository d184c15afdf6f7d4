"""The debug backend (plain Python point loops) as a third semantics
witness: bitwise-identical to the numpy oracle on every canonical stencil
(reference counterpart: src/gt4py/cartesian/backend/debug_backend.py:29,
whose generated plain-loop Python plays the same role)."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript

from . import stencil_defs


def _run_on_backend(entry, backend):
    stencil = gtscript.stencil(
        backend=backend,
        definition=entry["definition"],
        externals=entry["externals"],
        rebuild=True,
    )
    inputs = entry["make_inputs"]()
    fields = {k: v for k, v in inputs.items() if isinstance(v, np.ndarray)}
    scalars = {k: v for k, v in inputs.items() if not isinstance(v, np.ndarray)}
    kwargs = {}
    if entry["origin"] is not None:
        kwargs["origin"] = entry["origin"]
    if entry["domain"] is not None:
        kwargs["domain"] = entry["domain"]
    stencil(**fields, **scalars, **kwargs)
    return fields


@pytest.mark.parametrize("name", sorted(stencil_defs.REGISTRY))
def test_debug_backend_bitwise_vs_oracle(name):
    entry = stencil_defs.REGISTRY[name]
    oracle = _run_on_backend(entry, "numpy")
    result = _run_on_backend(entry, "debug")
    for fname in oracle:
        np.testing.assert_array_equal(
            result[fname], oracle[fname], err_msg=f"{name}.{fname}"
        )


def test_debug_backend_is_distinct():
    """The registry must expose a distinct executor, not an alias of the
    numpy backend (round-2 gap: REGISTRY['debug'] = REGISTRY['numpy'])."""
    from gt4py_tpu.cartesian.backend import REGISTRY

    assert REGISTRY["debug"] is not REGISTRY["numpy"]
    from gt4py_tpu.cartesian.backend.debug_backend import DebugBackend

    assert REGISTRY["debug"] is DebugBackend


def test_debug_backend_periodic_and_exec_info():
    """Debug shares the numpy call protocol: periodic halo fill and
    exec_info timestamps."""
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    F = gtscript.Field[np.float64]

    def defn(a: F, out: F):
        with computation(PARALLEL), interval(...):
            out = a[-1, 0, 0] + a[1, 0, 0] + a[0, -1, 0] + a[0, 1, 0]

    res = {}
    for be in ("numpy", "debug"):
        st = gtscript.stencil(backend=be, name=f"dbg_periodic_{be}")(defn)
        rng = np.random.default_rng(7)
        a = rng.random((8, 8, 3))
        out = np.zeros_like(a)
        info = {}
        st(a, out, origin=(1, 1, 0), domain=(6, 6, 3),
           periodic=("I", "J"), exec_info=info)
        assert info["run_end_time"] >= info["run_start_time"]
        res[be] = out
    np.testing.assert_array_equal(res["debug"], res["numpy"])
