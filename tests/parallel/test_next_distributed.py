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


class TestShardMapOperator:
    """Explicit ppermute halo exchange for field operators, halo widths
    auto-derived from the operator's extent analysis."""

    def _fields(self, cmesh, shape=(16, 32), seed=11):
        rng = np.random.default_rng(seed)
        a = rng.random(shape)
        b = rng.random(shape)
        return a, b

    def test_auto_halo_and_periodic_parity(self, cmesh):
        import jax

        @gtx.field_operator
        def wide(
            f: Field[Dims[I, J], gtx.float64], g: Field[Dims[I, J], gtx.float64]
        ) -> Field[Dims[I, J], gtx.float64]:
            return (
                f(Ioff[2]) + f(Ioff[-1]) + g(Joff[1]) + g(Joff[-2]) - 4.0 * f
            )

        from gt4py_tpu.next.distributed import operator_halo, shard_map_operator

        halos = operator_halo(wide, [I, J])
        assert halos == {I: 2, J: 2}

        av, bv = self._fields(cmesh)
        fa = nxd.distribute(gtx.as_field((I, J), av), cmesh, {I: "x", J: "y"})
        fb = nxd.distribute(gtx.as_field((I, J), bv), cmesh, {I: "x", J: "y"})
        step = shard_map_operator(wide, cmesh, {I: "x", J: "y"}, periodic=True)
        out = jax.jit(lambda x, y: step(x, y).data)(fa, fb)

        # reference: periodic pad + eager op + interior crop (numpy path)
        h = 2
        ap = np.pad(av, h, mode="wrap")
        bp = np.pad(bv, h, mode="wrap")
        dom = gtx.common.Domain(
            (I, J),
            (gtx.UnitRange(-h, 16 + h), gtx.UnitRange(-h, 32 + h)),
        )
        ref = wide(
            gtx.Field(dom, ap), gtx.Field(dom, bp)
        ).restrict(gtx.common.Domain((I, J), (gtx.UnitRange(0, 16), gtx.UnitRange(0, 32))))
        np.testing.assert_array_equal(np.asarray(out), ref.asnumpy())

    def test_open_boundary_zero(self, cmesh):
        import jax

        @gtx.field_operator
        def gradx(f: Field[Dims[I, J], gtx.float64]) -> Field[Dims[I, J], gtx.float64]:
            return f(Ioff[1]) - f

        from gt4py_tpu.next.distributed import shard_map_operator

        av, _ = self._fields(cmesh)
        fa = nxd.distribute(gtx.as_field((I, J), av), cmesh, {I: "x", J: "y"})
        step = shard_map_operator(gradx, cmesh, {I: "x", J: "y"}, periodic=False)
        out = np.asarray(jax.jit(lambda x: step(x).data)(fa))
        # interior rows: plain forward difference; last row sees a ZERO halo
        np.testing.assert_array_equal(out[:-1], av[1:] - av[:-1])
        np.testing.assert_array_equal(out[-1], -av[-1])

    def test_data_dependent_offset_rejected(self, cmesh):
        from gt4py_tpu.next import as_offset
        from gt4py_tpu.next.distributed import operator_halo

        @gtx.field_operator
        def dyn(
            f: Field[Dims[I], gtx.float64], idx: Field[Dims[I], gtx.int64]
        ) -> Field[Dims[I], gtx.float64]:
            return f(as_offset(Ioff, idx))

        with pytest.raises(ValueError, match="data-dependent"):
            operator_halo(dyn, [I])

    def test_scalar_args_and_tuple_output(self, cmesh):
        import jax

        @gtx.field_operator
        def two(
            f: Field[Dims[I, J], gtx.float64], w: gtx.float64
        ) -> tuple[Field[Dims[I, J], gtx.float64], Field[Dims[I, J], gtx.float64]]:
            g = f(Ioff[1]) - f
            return w * g, g * g

        from gt4py_tpu.next.distributed import shard_map_operator

        av, _ = self._fields(cmesh)
        fa = nxd.distribute(gtx.as_field((I, J), av), cmesh, {I: "x", J: "y"})
        step = shard_map_operator(two, cmesh, {I: "x", J: "y"}, periodic=True)
        o1, o2 = step(fa, w=3.0)
        gp = np.pad(av, 1, mode="wrap")
        g = (gp[2:, 1:-1] - gp[1:-1, 1:-1])
        np.testing.assert_allclose(np.asarray(o1.data), 3.0 * g, rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(o2.data), g * g, rtol=0, atol=0)


def test_shard_map_operator_pallas_bridge(cmesh):
    """The pallas bridge composes with explicit-halo shard_map execution:
    the operator lowers to a cartesian kernel INSIDE each shard while
    halos ride ppermute (multi-chip readiness of the compiled next
    path)."""
    from gt4py_tpu.next.distributed import shard_map_operator

    data = np.random.default_rng(7).random((16, 32))
    f = gtx.as_field((I, J), data)
    ref = shard_map_operator(lap, cmesh, {I: "x", J: "y"}, periodic=True)(f)
    got = shard_map_operator(
        lap.with_backend("pallas"), cmesh, {I: "x", J: "y"}, periodic=True
    )(f)
    assert got.dims == ref.dims
    assert tuple(got.domain.ranges) == tuple(ref.domain.ranges)
    np.testing.assert_allclose(got.asnumpy(), ref.asnumpy(), rtol=1e-12)
