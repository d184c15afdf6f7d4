"""Benes-network static permutations: offline C++ routing + a Pallas
TPU butterfly kernel that applies all in-VMEM stages in one pass.

A static permutation y[i] = x[perm[i]] on n = 2^k elements factors into
2k-1 butterfly exchange stages (distances n/2, ..., 2, 1, 2, ..., n/2;
pairs (i, i^d) swap or pass).  Routing the control bits is a classic
2-coloring (native/benes_router.cpp, compiled on first use with g++ and
cached); applying them is pure data movement:

- stages with pair distance < BLOCK elements run INSIDE one Pallas
  kernel over VMEM-resident blocks (lane stages as pltpu.roll pairs,
  sublane stages as static reshape-swaps) -- the entire middle of the
  network costs one HBM round trip,
- the few outer stages (distance >= BLOCK) run as XLA reshape-swap
  selects at full HBM bandwidth.

Chip context (r5 measurements, v5e): a 1M-element static permutation
costs 7.5 ms as an XLA gather and 1.5 ms as lax.sort_key_val; the
butterfly replaces the sort's n log^2 n compare-exchanges with n log n
selects fused in VMEM.  Used by sort_route.py for irregular-table
gathers; falls back transparently (return None) off-TPU, for non-f32
dtypes, or when the C++ router is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

#: elements per Pallas block.  The stage chain keeps several whole-block
#: values live on the Mosaic value stack (~17x block bytes measured on
#: chip: 2^19 blocks OOMed the 16 MB stack at 34 MB), so blocks stay
#: small and the few extra outer stages run as XLA selects instead.
_BLOCK_LOG2 = 17
#: largest supported padded size (outer stages beyond this: XLA selects)
_MAX_LOG2 = 24

_LANE = 128


# --------------------------------------------------------------------------- #
# native router
# --------------------------------------------------------------------------- #

_router = None
_router_failed = False


def _load_router():
    """Compile (once, cached) and load the C++ Beneš router."""
    global _router, _router_failed
    if _router is not None or _router_failed:
        return _router
    try:
        from gt4py_tpu import config

        src = os.path.join(os.path.dirname(__file__), "..", "native", "benes_router.cpp")
        src = os.path.abspath(src)
        cache_dir = os.path.join(config.CACHE_ROOT, "native")
        os.makedirs(cache_dir, exist_ok=True)
        import hashlib

        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(cache_dir, f"libbenes_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.route_benes.restype = ctypes.c_int
        lib.route_benes.argtypes = [
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        _router = lib
    except Exception:
        _router_failed = True
        _router = None
    return _router


def route(perm: np.ndarray) -> Optional[np.ndarray]:
    """Control bits for y[i] = x[perm[i]]: uint8 (2k-1, n) with n a
    power of two; None if the native router is unavailable."""
    lib = _load_router()
    if lib is None:
        return None
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    n = perm.size
    k = int(n).bit_length() - 1
    if (1 << k) != n or k < 1:
        raise ValueError(f"benes.route needs a power-of-two size, got {n}")
    ctrl = np.empty((2 * k - 1) * n, dtype=np.uint8)
    rc = lib.route_benes(np.int32(k), perm, ctrl)
    if rc != 0:
        return None
    return ctrl.reshape(2 * k - 1, n)


def stage_distances(k: int) -> list:
    """Exchange distance per stage: n/2, ..., 2, 1, 2, ..., n/2."""
    down = [1 << (k - 1 - l) for l in range(k)]
    return down + down[-2::-1]


def simulate(x: np.ndarray, ctrl: np.ndarray) -> np.ndarray:
    """Apply the staged network in numpy (reference executor / tests)."""
    n = x.shape[0]
    k = int(n).bit_length() - 1
    y = x.copy()
    for s, d in enumerate(stage_distances(k)):
        idx = np.arange(n)
        partner = y[idx ^ d]
        swap = ctrl[s].astype(bool)
        y = np.where(swap, partner, y)
    return y


# --------------------------------------------------------------------------- #
# runtime executor
# --------------------------------------------------------------------------- #

_plan_cache: dict = {}


def _pack_ctrl(ctrl_stages: np.ndarray) -> np.ndarray:
    """Pack up to 32 stage-bit planes into one int32 plane each word."""
    n_stages, n = ctrl_stages.shape
    n_words = -(-n_stages // 32)
    out = np.zeros((n_words, n), dtype=np.int32)
    for s in range(n_stages):
        out[s // 32] |= ctrl_stages[s].astype(np.int32) << np.int32(s % 32)
    return out


def _plan(keys_np: np.ndarray):
    """Executor plan for the permutation encoded by sort keys
    (dest[j] = src[sigma(j)] with keys = sigma^{-1}).  The cache token
    includes a strided content sample: id() alone is unsafe across
    allocator reuse (same hazard class as affine_remap.table_token)."""
    step = max(1, keys_np.shape[0] // 64)
    token = (
        id(keys_np),
        keys_np.shape[0],
        hash(np.ascontiguousarray(keys_np[::step][:64]).tobytes()),
    )
    plan = _plan_cache.get(token)
    if plan is not None:
        return plan
    P = keys_np.shape[0]
    k = max(1, int(P - 1).bit_length())
    if k > _MAX_LOG2:
        return None
    n2 = 1 << k
    sigma = np.empty(n2, dtype=np.int64)
    inv = np.empty(P, dtype=np.int64)
    inv[keys_np] = np.arange(P, dtype=np.int64)
    sigma[:P] = inv
    if n2 > P:
        sigma[P:] = np.arange(P, n2, dtype=np.int64)  # identity tail
    ctrl = route(sigma)
    if ctrl is None:
        return None
    dists = stage_distances(k)
    B = 1 << min(_BLOCK_LOG2, k)
    inner = [s for s, d in enumerate(dists) if d < B]
    outer = [s for s, d in enumerate(dists) if d >= B]
    # inner stages are contiguous in the middle; pack their bits per
    # position (block-local: pairs never cross a B-block for d < B)
    inner_ctrl = _pack_ctrl(ctrl[inner]) if inner else None
    outer_info = [
        (dists[s], np.ascontiguousarray(ctrl[s], dtype=np.bool_))
        for s in outer
    ]
    # outer stages sandwich the inner run: split into pre/post lists
    pre = [oi for s, oi in zip(outer, outer_info) if s < (inner[0] if inner else 0)]
    post = [oi for s, oi in zip(outer, outer_info) if s > (inner[-1] if inner else -1)]
    plan = {
        "n2": n2,
        "k": k,
        "B": B,
        "pre": pre,
        "post": post,
        "inner_dists": [dists[s] for s in inner],
        "inner_ctrl": inner_ctrl,
        "P": P,
    }
    if len(_plan_cache) > 256:
        _plan_cache.clear()
    _plan_cache[token] = plan
    return plan


def _xla_stage(x, d: int, flags):
    """One exchange stage at distance d on a 1D array via reshape-swap."""
    import jax.numpy as jnp

    x2 = x.reshape(-1, 2, d)
    partner = jnp.concatenate([x2[:, 1:2], x2[:, 0:1]], axis=1).reshape(x.shape)
    return jnp.where(flags, partner, x)


def _inner_kernel(n_words: int, dists, interpret: bool):
    """Pallas kernel applying the packed inner stages to one block."""
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, *refs):
        ctrl_refs = refs[:n_words]
        o_ref = refs[n_words]
        x = x_ref[...]  # (R, 128) f32
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for s, d in enumerate(dists):
            c = ctrl_refs[s // 32][...]
            bit = ((c >> jnp.int32(s % 32)) & jnp.int32(1)) == jnp.int32(1)
            if d < _LANE:
                if interpret:
                    fwd = jnp.roll(x, -d, axis=1)
                    bwd = jnp.roll(x, d, axis=1)
                else:
                    from jax.experimental.pallas import tpu as pltpu

                    # shifts must be i32 scalars: a bare python int
                    # becomes i64 under x64 and tpu.dynamic_rotate
                    # rejects it (CLAUDE.md TPU failure modes)
                    fwd = pltpu.roll(x, jnp.int32((-d) % _LANE), 1)
                    bwd = pltpu.roll(x, jnp.int32(d % _LANE), 1)
                partner = jnp.where((lane & jnp.int32(d)) == 0, fwd, bwd)
            else:
                dr = d // _LANE
                x4 = x.reshape(-1, 2, dr, _LANE)
                partner = jnp.concatenate(
                    [x4[:, 1:2], x4[:, 0:1]], axis=1
                ).reshape(x.shape)
            x = jnp.where(bit, partner, x)
        o_ref[...] = x

    import jax

    return kernel


def permute(vals, keys_np: np.ndarray):
    """Static permutation dest[j] = src[keys^{-1}(j)] of a 1D jax array
    via the butterfly network; None when unavailable (non-TPU without
    force flag, unsupported dtype/size, router missing).  32-bit
    integer arrays ride the f32 network through bitcasts: every stage
    is a select/rotate (pure data movement, no arithmetic), so the bit
    pattern survives exactly -- including patterns that alias NaN
    payloads (differentially pinned vs take in the tests)."""
    import jax
    import jax.numpy as jnp

    if vals.ndim != 1:
        return None
    cast_back = None
    if vals.dtype in (jnp.int32.dtype, jnp.uint32.dtype):
        cast_back = vals.dtype
        vals = jax.lax.bitcast_convert_type(vals, jnp.float32)
    elif vals.dtype != jnp.float32:
        return None
    if os.environ.get("GT4PY_TPU_BENES", "1") == "0":
        return None
    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    if interpret and os.environ.get("GT4PY_TPU_BENES_INTERPRET", "0") != "1":
        return None  # CPU: sort_key_val is faster than interpret mode
    plan = _plan(keys_np)
    if plan is None:
        return None

    n2, B = plan["n2"], plan["B"]
    x = vals
    if x.shape[0] < n2:
        x = jnp.pad(x, (0, n2 - x.shape[0]))

    for d, flags in plan["pre"]:
        x = _xla_stage(x, d, jnp.asarray(flags))

    if plan["inner_dists"]:
        from jax.experimental import pallas as pl

        ctrl = plan["inner_ctrl"]
        n_words = ctrl.shape[0]
        R = B // _LANE
        nblocks = n2 // B
        grid = (nblocks,)
        x2 = x.reshape(n2 // _LANE, _LANE)
        ctrl2 = [
            jnp.asarray(ctrl[w].reshape(n2 // _LANE, _LANE))
            for w in range(n_words)
        ]
        kernel = _inner_kernel(n_words, plan["inner_dists"], interpret)
        # index-map components must share the grid index's i32 type: a
        # bare python 0 widens to i64 under x64 and Mosaic rejects the
        # (i32, i64) func.return (CLAUDE.md TPU failure modes)
        spec = pl.BlockSpec((R, _LANE), lambda b: (b, jnp.int32(0)))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * (1 + n_words),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n2 // _LANE, _LANE), jnp.float32),
            interpret=interpret,
        )(x2, *ctrl2)
        x = out.reshape(n2)

    for d, flags in plan["post"]:
        x = _xla_stage(x, d, jnp.asarray(flags))

    out = x[: plan["P"]]
    if cast_back is not None:
        out = jax.lax.bitcast_convert_type(out, cast_back)
    return out
