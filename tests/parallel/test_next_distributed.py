"""Distributed field-view DSL on a virtual 8-device CPU mesh.

Net-new vs the reference (single-process, SURVEY.md §2.7): next Fields
shard over a device mesh via NamedSharding; jit-staged field operators
run SPMD with GSPMD inserting the halo collectives for domain-shift
offsets.
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dims, Field, backends
from gt4py_tpu.next import distributed as nxd
from gt4py_tpu.parallel import CartesianMesh

I = gtx.Dimension("I")
J = gtx.Dimension("J")
K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
Joff = gtx.FieldOffset("Joff", source=J, target=(J,))


@pytest.fixture(scope="module")
def cmesh():
    import jax

    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return CartesianMesh((2, 4))


@gtx.field_operator
def lap(f: Field[Dims[I, J], gtx.float64]) -> Field[Dims[I, J], gtx.float64]:
    return (
        f(Ioff[1]) + f(Ioff[-1]) + f(Joff[1]) + f(Joff[-1]) - 4.0 * f
    )


def test_distribute_places_and_preserves_domain(cmesh):
    data = np.random.default_rng(0).random((16, 32))
    f = gtx.as_field((I, J), data)
    fd = nxd.distribute(f, cmesh)  # inferred {I: x, J: y}
    assert fd.domain == f.domain
    sh = nxd.sharding_of(fd)
    assert sh is not None and not sh.is_fully_replicated
    # one shard covers 1/8 of the elements
    assert fd.data.addressable_shards[0].data.shape == (8, 8)
    np.testing.assert_array_equal(nxd.gather(fd).asnumpy(), data)


def test_jit_operator_spmd_matches_oracle(cmesh):
    import jax

    rng = np.random.default_rng(1)
    data = rng.random((16, 32))
    f = nxd.distribute(gtx.as_field((I, J), data), cmesh, {I: "x", J: "y"})

    out = jax.jit(lambda g: lap(g).data)(f)
    # oracle on the numpy path
    ref = lap(gtx.as_field((I, J), data, allocator="numpy")).asnumpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=0)
    # the result stays distributed (no silent full-gather)
    assert not out.sharding.is_fully_replicated


def test_jax_jit_backend_on_sharded_inputs(cmesh):
    rng = np.random.default_rng(2)
    data = rng.random((16, 32))
    f = nxd.distribute(gtx.as_field((I, J), data), cmesh)
    r = lap.with_backend(backends.jax_jit)(f)
    ref = lap(gtx.as_field((I, J), data, allocator="numpy")).asnumpy()
    np.testing.assert_allclose(r.asnumpy(), ref, rtol=0, atol=0)


def test_scan_operator_sharded_columns(cmesh):
    """K stays on-chip; IJ columns shard. The scan runs per-column SPMD."""
    import jax

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def acc(carry: float, x: float) -> float:
        return carry + x

    rng = np.random.default_rng(3)
    data = rng.random((8, 16, 5))
    f = gtx.as_field((I, J, K), data)
    fd = nxd.distribute(f, cmesh, {I: "x", J: "y"})
    out = jax.jit(lambda g: acc(g).data)(fd)
    np.testing.assert_allclose(np.asarray(out), np.cumsum(data, axis=2), rtol=1e-15)


def test_shard_vertical_refused(cmesh):
    f = gtx.as_field((K,), np.arange(8.0))
    with pytest.raises(ValueError, match="vertical"):
        nxd.distribute(f, cmesh, {K: "x"})


def test_uneven_shard_refused(cmesh):
    f = gtx.as_field((I, J), np.zeros((15, 32)))
    with pytest.raises(ValueError, match="divide evenly"):
        nxd.distribute(f, cmesh, {I: "x", J: "y"})


def test_replicate_connectivity_pattern(cmesh):
    """Unstructured reduction with a replicated table and a sharded dense
    dim: neighbor_sum over a local dim while Vertex shards."""
    import jax

    Vertex = gtx.Dimension("Vertex")
    V2VDim = gtx.Dimension("V2V", kind=gtx.DimensionKind.LOCAL)
    nv = 16
    table = np.stack([(np.arange(nv) + 1) % nv, (np.arange(nv) - 1) % nv], axis=1)
    conn = nxd.replicate(
        gtx.as_connectivity(table, source=Vertex, codomain=Vertex, local_dim=V2VDim),
        cmesh,
    )
    assert conn.table.sharding.is_fully_replicated

    # replicate also places plain Fields
    mask = nxd.replicate(gtx.as_field((Vertex,), np.ones(nv)), cmesh)
    assert nxd.sharding_of(mask).is_fully_replicated

    vals = np.random.default_rng(4).random(nv)
    vf = gtx.as_field((Vertex,), vals)
    vfd = nxd.distribute(vf, cmesh, {Vertex: "x"})
    out = jax.jit(lambda g: gtx.neighbor_sum(g(conn), axis=V2VDim).data)(vfd)
    ref = vals[table].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=0)
