"""Distributed-vs-single-device equivalence of the full dycore step.

The same local step runs (a) on one device with periodic halo fills and
(b) sharded over the 8-device virtual mesh with explicit ppermute halo
exchange; interiors must agree to float64 precision (identical per-point
operation order)."""

import numpy as np
import pytest

from gt4py_tpu.models.dycore import MiniDycore
from gt4py_tpu.parallel import CartesianMesh, gather, shard_map_stencil


def test_distributed_step_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    NI, NJ, NK = 16, 32, 6
    cmesh = CartesianMesh((2, 4))
    px, py = cmesh.shape
    ni_l, nj_l = NI // px, NJ // py
    h = MiniDycore.HALO

    rng = np.random.default_rng(0)
    fields = {
        "u": rng.random((NK, NI, NJ)),
        "coeff": 0.025 * rng.random((NK, NI, NJ)),
        "wcon": 0.2 * rng.random((NK, NI, NJ)),
        "utens": 0.01 * rng.random((NK, NI, NJ)),
        "utens_stage": rng.random((NK, NI, NJ)),
    }

    # ---- single device: periodic halo-padded buffers ---- #
    single = MiniDycore(NI, NJ, NK, dtype=np.float64, backend="jax", aligned=False)
    shape = single.field_shape()
    state = {}
    for name, arr in fields.items():
        buf = np.zeros(shape)
        buf[:, h : h + NI, h : h + NJ] = arr
        state[name] = jnp.asarray(buf)

    def fill_all(s):
        from gt4py_tpu.models.dycore import periodic_fill

        return {k: periodic_fill(v, h, NI, NJ) for k, v in s.items()}

    step1 = single.step_fn(fill_halos=True)
    out_single = jax.jit(lambda s: step1(fill_all(s)))(state)
    u_single = np.asarray(out_single["u"])[:, h : h + NI, h : h + NJ]

    # ---- distributed: shard_map with ppermute halo exchange ---- #
    local = MiniDycore(ni_l, nj_l, NK, dtype=np.float64, backend="jax", aligned=False)
    local_step = local.step_fn(fill_halos=False)

    field_names = tuple(fields)

    def local_fields_step(**kw):
        return local_step(dict(kw))

    step_sharded = shard_map_stencil(
        local_fields_step,
        cmesh,
        (h, h),
        field_names=field_names,
        spatial_axes=(1, 2),
    )

    sharding = NamedSharding(cmesh.mesh, P(None, "x", "y"))
    global_state = {
        k: jax.device_put(jnp.asarray(v), sharding) for k, v in fields.items()
    }
    out_sharded = jax.jit(lambda **kw: step_sharded(**kw))(**global_state)
    u_sharded = gather(out_sharded["u"])

    np.testing.assert_allclose(u_sharded, u_single, rtol=1e-13, atol=1e-13)


def test_full_dycore_step_runs():
    import jax
    import jax.numpy as jnp

    from gt4py_tpu.models.full_dycore import FullDycore

    model = FullDycore(16, 16, 4, dtype=np.float64, backend="jax", aligned=False)
    state = {k: jnp.asarray(v) for k, v in model.init_state().items()}
    step = jax.jit(model.step_fn())
    out = step(state)
    for name in ("u", "q", "qsl"):
        arr = np.asarray(out[name])
        assert np.isfinite(arr).all(), name
    # tracer mass conserved by the FV step
    h = model.HALO
    q0 = np.asarray(state["q"])[:, h : h + 16, h : h + 16].sum()
    q1 = np.asarray(out["q"])[:, h : h + 16, h : h + 16].sum()
    assert abs(q1 - q0) < 1e-9 * abs(q0)
