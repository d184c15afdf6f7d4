"""Worker for the 2-process jax.distributed smoke test (simulated DCN).

Run by tests/parallel/test_multihost.py as
``python multihost_worker.py <process_id> <coordinator_port>``: two CPU
processes with 4 virtual devices each form one 8-device global mesh;
a sharded halo-exchange step runs across the process boundary (gloo
collectives stand in for DCN) and every process checks its addressable
shards against a numpy reconstruction of the global periodic stencil.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def main(process_id: int, port: int) -> None:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gt4py_tpu.parallel import CartesianMesh, shard_map_stencil

    cmesh = CartesianMesh((2, 4))
    px, py = cmesh.shape
    NI, NJ = 16, 32
    ni_l, nj_l = NI // px, NJ // py
    h = 1

    rng = np.random.default_rng(0)
    full = rng.random((NI, NJ))

    sharding = NamedSharding(cmesh.mesh, P("x", "y"))
    arr = jax.make_array_from_callback(
        (NI, NJ), sharding, lambda idx: full[idx]
    )

    def local_step(*, a):
        # 5-point average on the halo-extended local block; the result
        # keeps the extended shape (the wrapper crops the halo off)
        c = a[1:-1, 1:-1]
        avg = 0.2 * (c + a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:])
        return {"a": a.at[1:-1, 1:-1].set(avg)}

    step = shard_map_stencil(
        local_step, cmesh, (h, h), field_names=("a",), spatial_axes=(0, 1)
    )
    out = jax.jit(lambda a: step(a=a)["a"])(arr)

    expect = 0.2 * (
        full
        + np.roll(full, 1, 0)
        + np.roll(full, -1, 0)
        + np.roll(full, 1, 1)
        + np.roll(full, -1, 1)
    )
    for shard in out.addressable_shards:
        idx = shard.index
        np.testing.assert_allclose(
            np.asarray(shard.data), expect[idx], rtol=1e-13, atol=1e-14
        )
    # ---- next-DSL leg: a field-view operator over the process-spanning
    # mesh (GSPMD collectives cross the simulated-DCN boundary) ----
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))

    @gtx.field_operator
    def gradx(f: Field[Dims[I, J], gtx.float64]) -> Field[Dims[I, J], gtx.float64]:
        return f(Ioff[1]) - f

    nf = Field(
        gtx.common.Domain((I, J), (gtx.UnitRange(0, NI), gtx.UnitRange(0, NJ))),
        arr,
    )
    gout = jax.jit(lambda g: gradx(g).data)(nf)
    gexpect = full[1:] - full[:-1]
    for shard in gout.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), gexpect[shard.index], rtol=1e-13, atol=1e-14
        )
    print(f"MULTIHOST NEXT OK p{process_id}", flush=True)

    print(f"MULTIHOST OK p{process_id}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
