"""Model-state checkpoint / resume.

The reference holds no model state (SURVEY.md §5: "Checkpoint/resume:
None"); driving a dycore for N timesteps with restarts makes this a small
new runtime feature here.  State dicts of arrays (numpy or jax, sharded or
not) round-trip through ``.npz`` files; sharded arrays are gathered on
save and re-sharded by the caller on load.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

#: numpy extension dtypes (ml_dtypes) round-trip .npz as raw void ("|V2");
#: store them as same-width uint views plus a dtype tag in the metadata
_EXTENSION_DTYPES = ("bfloat16", "float8_e4m3fn", "float8_e5m2")


def save_checkpoint(path: str, state: Dict[str, Any], *, step: int = 0,
                    metadata: Optional[Dict[str, Any]] = None) -> str:
    """Write a state dict (name -> array) plus metadata; atomic rename."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state.items()}
    ext_dtypes = {}
    for k, v in arrays.items():
        if v.dtype.kind == "V" and v.dtype.name in _EXTENSION_DTYPES:
            ext_dtypes[k] = v.dtype.name
            arrays[k] = v.view(f"u{v.dtype.itemsize}")
    meta = {"step": int(step), "keys": sorted(arrays), **(metadata or {})}
    if ext_dtypes:
        meta["__ext_dtypes__"] = ext_dtypes
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
                 **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Read back (state, metadata)."""
    import ml_dtypes  # registers the extension dtype names with numpy

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        state = {k: data[k] for k in data.files if k != "__meta__"}
    for k, name in meta.pop("__ext_dtypes__", {}).items():
        state[k] = state[k].view(np.dtype(name))
    return state, meta


def restore_to_device(state: Dict[str, np.ndarray], sharding=None) -> Dict[str, Any]:
    """Put loaded arrays back on device, optionally with a NamedSharding."""
    import jax

    if sharding is None:
        import jax.numpy as jnp

        return {k: jnp.asarray(v) for k, v in state.items()}
    return {k: jax.device_put(v, sharding) for k, v in state.items()}
