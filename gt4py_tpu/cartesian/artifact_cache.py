"""Cross-process artifact cache for analyzed stencils.

Reference counterpart: the FileCache / module-artifact cache behind the
reference's generated backends (src/gt4py/cartesian/backend/module_generator.py
+ gt4py._core FileCache with inter-process locking).  Here the expensive
cross-process artifact is the *compiled executable*, which the jax
persistent compilation cache already shares (config.ensure_jax_config);
this cache additionally persists the parsed+analyzed stencil IR so warm
processes skip the frontend entirely.

Staleness guards:
- the key is the builder's semantic fingerprint (source + annotations +
  externals + options + the sources of every reachable
  ``@gtscript.function`` helper -- see ``StencilBuilder.stencil_id``);
- the package version salts the filename (schema changes invalidate);
- writes are atomic (temp file + rename), concurrent writers race
  benignly (last rename wins, both contents identical).

Disable with ``GT4PY_TPU_ARTIFACT_CACHE=0``.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Optional

from gt4py_tpu import config

_ENABLED = os.environ.get("GT4PY_TPU_ARTIFACT_CACHE", "1") != "0"


def _path(sid: str) -> str:
    from gt4py_tpu import __version__

    return os.path.join(
        config.CACHE_ROOT, "artifacts", f"{sid}-v{__version__}.pkl"
    )


def load(sid: str):
    """The cached StencilAnalysis for ``sid``, or None.

    Only the parsed stencil IR is persisted; the analysis re-runs on
    load.  Analysis tables are keyed by statement object identity
    (``id(stmt)``), which dangles after unpickling -- persisting the
    whole StencilAnalysis silently served wrong per-statement extents
    (caught by the FV oracle parity test)."""
    if not _ENABLED:
        return None
    try:
        with open(_path(sid), "rb") as f:
            stencil_ir = pickle.load(f)
    except (OSError, pickle.UnpicklingError, AttributeError, EOFError,
            ImportError, IndexError):
        return None
    from gt4py_tpu.cartesian import analysis as analysis_mod

    try:
        return analysis_mod.analyze(stencil_ir)
    except Exception:
        return None


def save(sid: str, analysis) -> None:
    if not _ENABLED:
        return
    path = _path(sid)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump(analysis.stencil, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    except (OSError, pickle.PicklingError, TypeError):
        pass  # best-effort: the cache never breaks a build
