"""Native grid IO tests (C++ extension built at first use)."""

import numpy as np
import pytest


def test_native_roundtrip(tmp_path, monkeypatch):
    from gt4py_tpu import config

    monkeypatch.setattr(config, "CACHE_ROOT", str(tmp_path / "cache"))
    import gt4py_tpu.io as gio

    # reset module state so the build uses the patched cache root
    monkeypatch.setattr(gio, "_lib", None)
    monkeypatch.setattr(gio, "_build_failed", False)

    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64, np.int32, np.int64):
        arr = (rng.random((5, 6, 7)) * 100).astype(dtype)
        path = str(tmp_path / f"grid_{np.dtype(dtype).name}.gtg")
        gio.save_grid(path, arr)
        assert gio._lib is not None, "native build failed (g++ available?)"
        dt, shape = gio.probe_grid(path)
        assert dt == np.dtype(dtype) and shape == (5, 6, 7)
        back = gio.load_grid(path)
        np.testing.assert_array_equal(back, arr)


def test_large_array_parallel_copy(tmp_path, monkeypatch):
    from gt4py_tpu import config

    monkeypatch.setattr(config, "CACHE_ROOT", str(tmp_path / "cache"))
    import gt4py_tpu.io as gio

    monkeypatch.setattr(gio, "_lib", None)
    monkeypatch.setattr(gio, "_build_failed", False)

    arr = np.arange(40 * 1024 * 1024 // 8, dtype=np.int64).reshape(-1, 1024)
    path = str(tmp_path / "big.gtg")
    gio.save_grid(path, arr)
    back = gio.load_grid(path)
    np.testing.assert_array_equal(back, arr)


def test_corrupt_header_rejected(tmp_path, monkeypatch):
    from gt4py_tpu import config

    monkeypatch.setattr(config, "CACHE_ROOT", str(tmp_path / "cache"))
    import gt4py_tpu.io as gio

    monkeypatch.setattr(gio, "_lib", None)
    monkeypatch.setattr(gio, "_build_failed", False)

    path = str(tmp_path / "junk.gtg")
    with open(path, "wb") as f:
        f.write(b"not a grid record at all........")
    if gio._native() is None:
        pytest.skip("no native toolchain")
    with pytest.raises(OSError):
        gio.probe_grid(path)


def test_checkpoint_with_gridio(tmp_path, monkeypatch):
    """Grid IO integrates with the checkpoint layer for large states."""
    from gt4py_tpu import config

    monkeypatch.setattr(config, "CACHE_ROOT", str(tmp_path / "cache"))
    import gt4py_tpu.io as gio

    monkeypatch.setattr(gio, "_lib", None)
    monkeypatch.setattr(gio, "_build_failed", False)

    state = {"u": np.random.default_rng(1).random((4, 8, 8))}
    p = str(tmp_path / "state_u.gtg")
    gio.save_grid(p, state["u"])
    np.testing.assert_array_equal(gio.load_grid(p), state["u"])
