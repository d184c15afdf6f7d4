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


# --------------------------------------------------------------------------- #
# sharded checkpointing: per-device shard files, no gather (orbax-style)
# --------------------------------------------------------------------------- #


def _np_view(arr: np.ndarray) -> Tuple[np.ndarray, str]:
    """(storable array, dtype name): extension dtypes ride as uint views."""
    if arr.dtype.kind == "V" and arr.dtype.name in _EXTENSION_DTYPES:
        return arr.view(f"u{arr.dtype.itemsize}"), arr.dtype.name
    return arr, arr.dtype.name


class CheckpointHandle:
    """Async save handle: ``wait()`` blocks until all shard files and the
    manifest are durably in place."""

    def __init__(self, future):
        self._future = future

    def wait(self) -> str:
        return self._future.result()

    result = wait


def save_checkpoint_sharded(
    directory: str,
    state: Dict[str, Any],
    *,
    step: int = 0,
    metadata: Optional[Dict[str, Any]] = None,
    wait: bool = True,
):
    """Write each array's ADDRESSABLE shards as separate ``.npy`` files --
    no gather, no cross-host traffic; every process stores only its own
    shards (multi-host: point every process at the same shared directory).
    Device->host copies happen before returning, so the training loop may
    keep mutating ``state``; with ``wait=False`` the file IO runs on a
    background thread and the returned :class:`CheckpointHandle` must be
    waited on before relying on the checkpoint.  The ``manifest.json``
    written LAST marks the checkpoint complete (crash-consistent)."""
    import concurrent.futures

    import jax

    os.makedirs(directory, exist_ok=True)
    manifest: Dict[str, Any] = {
        "step": int(step),
        "metadata": metadata or {},
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "arrays": {},
    }
    to_write = []  # (path, numpy array)
    for name, arr in state.items():
        if "/" in name or "\\" in name:
            raise ValueError(f"checkpoint key '{name}' must not contain path separators")
        entry: Dict[str, Any] = {"shards": {}}
        if isinstance(arr, jax.Array):
            entry["shape"] = list(arr.shape)
            host_shards = []
            for shard in arr.addressable_shards:
                if getattr(shard, "replica_id", 0):
                    # replicated copies: store replica 0 only (orbax
                    # convention) -- a fully-replicated array costs one
                    # file, not one per device
                    continue
                data = np.asarray(shard.data)  # device->host now
                host_shards.append((shard.device.id, shard.index, data))
            for dev_id, index, data in host_shards:
                stored, dtname = _np_view(data)
                entry["dtype"] = dtname
                fname = f"{name}.d{dev_id}.npy"
                entry["shards"][str(dev_id)] = {
                    "file": fname,
                    "index": [
                        [sl.start, sl.stop] if isinstance(sl, slice) else [sl, sl + 1]
                        for sl in index
                    ],
                }
                to_write.append((os.path.join(directory, fname), stored))
        else:
            data = np.asarray(arr)
            stored, dtname = _np_view(data)
            entry["shape"] = list(data.shape)
            entry["dtype"] = dtname
            fname = f"{name}.full.npy"
            entry["shards"]["full"] = {
                "file": fname,
                "index": [[0, s] for s in data.shape],
            }
            # unsharded arrays are identical on every process: only
            # process 0 writes the file (all manifests may reference it);
            # concurrent writers to one shared path would race
            if manifest["process_index"] == 0:
                to_write.append((os.path.join(directory, fname), stored))
        manifest["arrays"][name] = entry

    mpath = os.path.join(directory, f"manifest.p{manifest['process_index']}.json")

    def finalize() -> str:
        # overwriting an existing checkpoint: drop our manifest FIRST so a
        # crash mid-rewrite leaves the directory visibly incomplete instead
        # of an old manifest blessing a mix of old and new shard files
        try:
            os.remove(mpath)
        except FileNotFoundError:
            pass
        for path, data in to_write:
            tmp = f"{path}.tmp.p{manifest['process_index']}"
            with open(tmp, "wb") as f:
                np.save(f, data)
            os.replace(tmp, path)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        return directory

    if wait:
        return finalize()
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(finalize)
    pool.shutdown(wait=False)
    return CheckpointHandle(fut)


def is_checkpoint_complete(directory: str) -> bool:
    """True when every participating process's manifest is present (each
    manifest records the save-time ``process_count``; the one written
    LAST per process marks that process's shards durable)."""
    import glob

    manifests = sorted(glob.glob(os.path.join(directory, "manifest.p*.json")))
    if not manifests:
        return False
    try:
        with open(manifests[0]) as f:
            expected = int(json.load(f).get("process_count", 1))
    except (OSError, ValueError):
        return False
    return len(manifests) >= expected


def load_checkpoint_sharded(
    directory: str, *, shardings: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reassemble arrays from all processes' shard files (shared
    filesystem) and return ``(state, metadata)``.  With ``shardings``
    (name -> jax Sharding), arrays go back on device re-sharded;
    otherwise they come back as numpy.  Raises if any process's manifest
    is missing (partial multi-host save) or a shard region is absent --
    never returns silently-uninitialized memory."""
    import glob

    import ml_dtypes  # noqa: F401  (registers extension dtype names)

    manifests = sorted(glob.glob(os.path.join(directory, "manifest.p*.json")))
    if not manifests:
        raise FileNotFoundError(f"no checkpoint manifest in {directory}")
    arrays: Dict[str, Any] = {}
    dtypes: Dict[str, np.dtype] = {}
    covered: Dict[str, int] = {}  # elements written per array
    meta: Dict[str, Any] = {}
    expected_procs = None
    for mpath in manifests:
        with open(mpath) as f:
            m = json.load(f)
        meta = {"step": m["step"], **m["metadata"]}
        pc = int(m.get("process_count", 1))
        if expected_procs is None:
            expected_procs = pc
        if len(manifests) < pc:
            raise FileNotFoundError(
                f"incomplete checkpoint in {directory}: "
                f"{len(manifests)} of {pc} process manifests present"
            )
        for name, entry in m["arrays"].items():
            dt = np.dtype(entry["dtype"])
            dtypes[name] = dt
            stored_dt = np.dtype(f"u{dt.itemsize}") if dt.kind == "V" else dt
            out = arrays.get(name)
            if out is None:
                out = arrays[name] = np.zeros(entry["shape"], dtype=stored_dt)
                covered[name] = 0
            for shard in entry["shards"].values():
                data = np.load(os.path.join(directory, shard["file"]))
                idx = tuple(slice(a, b) for a, b in shard["index"])
                out[idx] = data
                covered[name] += int(data.size)
    for name, arr in arrays.items():
        if covered[name] < arr.size:
            raise ValueError(
                f"checkpoint array '{name}' in {directory} is only "
                f"{covered[name]}/{arr.size} elements covered by shards"
            )
    state: Dict[str, Any] = {}
    for name, arr in arrays.items():
        if dtypes[name].kind == "V":
            arr = arr.view(dtypes[name])
        if shardings and name in shardings:
            import jax

            arr = jax.device_put(arr, shardings[name])
        state[name] = arr
    return state, meta
