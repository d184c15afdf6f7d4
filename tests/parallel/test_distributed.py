"""Distribution-layer tests on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import PARALLEL, FORWARD, computation, interval
from gt4py_tpu.parallel import CartesianMesh, distribute, gather, shard_map_stencil

Field3D = gtscript.Field[np.float64]


@pytest.fixture(scope="module")
def cmesh():
    import jax

    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return CartesianMesh((2, 4))


def periodic_lap_reference(a):
    return (
        -4.0 * a
        + np.roll(a, -1, 0)
        + np.roll(a, 1, 0)
        + np.roll(a, -1, 1)
        + np.roll(a, 1, 1)
    )


def test_global_view_sharded_stencil(cmesh):
    """GSPMD path: a stencil applied to sharded global fields under jit
    matches the single-device result; XLA inserts the halo exchange."""
    import jax

    @gtscript.stencil(backend="jax")
    def lap(out_f: Field3D, in_f: Field3D):
        with computation(PARALLEL), interval(...):
            out_f = -4.0 * in_f[0, 0, 0] + (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )

    NI, NJ, NK = 32, 32, 4
    rng = np.random.default_rng(0)
    inp_np = rng.random((NI, NJ, NK))
    out_np = np.zeros((NI, NJ, NK))

    fn = lap.functional(origin=(1, 1, 0), domain=(NI - 2, NJ - 2, NK))

    inp = distribute(cmesh, inp_np)
    out = distribute(cmesh, out_np)

    jitted = jax.jit(lambda o, i: fn(out_f=o, in_f=i)["out_f"])
    result = gather(jitted(out, inp))

    expected = np.zeros_like(out_np)
    expected[1:-1, 1:-1] = (
        -4.0 * inp_np[1:-1, 1:-1]
        + inp_np[2:, 1:-1]
        + inp_np[:-2, 1:-1]
        + inp_np[1:-1, 2:]
        + inp_np[1:-1, :-2]
    )
    np.testing.assert_allclose(result, expected, rtol=1e-12, atol=1e-12)


def test_shard_map_halo_exchange_periodic(cmesh):
    """Explicit path: ppermute halo exchange + local stencil == periodic
    laplacian on the global domain."""
    import jax

    @gtscript.stencil(backend="jax")
    def lap(out_f: Field3D, in_f: Field3D):
        with computation(PARALLEL), interval(...):
            out_f = -4.0 * in_f[0, 0, 0] + (
                in_f[1, 0, 0] + in_f[-1, 0, 0] + in_f[0, 1, 0] + in_f[0, -1, 0]
            )

    NI, NJ, NK = 16, 32, 4
    h = 1
    rng = np.random.default_rng(1)
    inp_np = rng.random((NI, NJ, NK))
    out_np = np.zeros((NI, NJ, NK))

    ni, nj = NI // cmesh.px, NJ // cmesh.py

    local_fn = lap.functional(origin=(h, h, 0), domain=(ni, nj, NK))

    step = shard_map_stencil(
        lambda out_f, in_f: local_fn(out_f=out_f, in_f=in_f),
        cmesh,
        (h, h),
        field_names=("out_f", "in_f"),
    )

    inp = distribute(cmesh, inp_np)
    out = distribute(cmesh, out_np)
    result = gather(jax.jit(lambda **kw: step(**kw)["out_f"])(out_f=out, in_f=inp))

    np.testing.assert_allclose(
        result, periodic_lap_reference(inp_np), rtol=1e-12, atol=1e-12
    )


def test_shard_map_serial_k_stencil(cmesh):
    """Serial-K scans work inside shard_map (cumsum over K per column)."""
    import jax

    @gtscript.stencil(backend="jax")
    def cumsum(inp: Field3D, out: Field3D):
        with computation(FORWARD):
            with interval(0, 1):
                out = inp
            with interval(1, None):
                out = out[0, 0, -1] + inp

    NI, NJ, NK = 8, 16, 9
    rng = np.random.default_rng(2)
    inp_np = rng.random((NI, NJ, NK))
    ni, nj = NI // cmesh.px, NJ // cmesh.py

    local_fn = cumsum.functional(origin=(0, 0, 0), domain=(ni, nj, NK))
    step = shard_map_stencil(
        lambda inp, out: local_fn(inp=inp, out=out),
        cmesh,
        (0, 0),
        field_names=("inp", "out"),
    )
    out = distribute(cmesh, np.zeros_like(inp_np))
    inp = distribute(cmesh, inp_np)
    result = gather(jax.jit(lambda **kw: step(**kw)["out"])(inp=inp, out=out))
    np.testing.assert_allclose(result, np.cumsum(inp_np, axis=2), rtol=1e-12)


@pytest.mark.parametrize("seed", range(11000, 11006))
def test_random_program_gspmd_parity(cmesh, seed):
    """Randomized GSPMD leg: generator-shaped stencils (serial scans,
    regions, whiles, variable-K) applied to 2x4-sharded global fields
    under jit match the single-device result at the distributed
    contract (1e-12: partitioning changes XLA's per-partition fusion by
    an f64 ulp, so bitwise does not hold).  80-seed offline sweep clean
    at r5."""
    import random

    import jax
    import jax.numpy as jnp

    from gt4py_tpu.cartesian import analysis as analysis_mod
    from gt4py_tpu.cartesian.backend import from_name
    from gt4py_tpu.testing.program_gen import ProgramGenerator

    rng = random.Random(seed)
    domain = (2 * rng.randint(2, 8), 4 * rng.randint(2, 6), rng.randint(1, 7))
    gen = ProgramGenerator(rng, dtype=np.float64)
    an = analysis_mod.analyze(gen.generate())
    h = 6
    shape = (domain[0] + 2 * h, domain[1] + 2 * h, domain[2] + 2)
    nprng = np.random.default_rng(seed)
    arrays = {n: nprng.random(shape) for n in gen.inputs + gen.outputs}
    origins = {n: (h, h, 1) for n in arrays}
    scalars = {"s0": nprng.uniform(-1, 1), "s1": nprng.uniform(-1, 1)}

    bk = from_name("jax")(an, {})
    fn = jax.jit(lambda arrs: bk.apply(arrs, scalars, domain, origins))
    single = fn({k: jnp.asarray(v) for k, v in arrays.items()})
    dist = fn({k: distribute(cmesh, v) for k, v in arrays.items()})
    for name in single:
        np.testing.assert_allclose(
            np.asarray(single[name]),
            gather(dist[name]),
            rtol=1e-12,
            atol=1e-12,
            err_msg=name,
        )
