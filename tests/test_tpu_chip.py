"""On-chip Mosaic suite: run with ``GT4PY_TPU_TEST_PLATFORM=tpu``.

Interpret-mode CI cannot catch Mosaic-only failure classes
(docs/performance.md "TPU-only failure modes"), so this job drives the
kernel path on the real chip: f32 aligned-geometry differential fuzzing
plus the product-path model kernels vs the XLA executor (bitwise).
Skipped on the default CPU platform.  Remote first-compiles take
5-40 s per kernel; the persistent compile cache makes re-runs fast.

Last recorded runs: see docs/performance.md "On-chip suite runs".
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("GT4PY_TPU_TEST_PLATFORM", "cpu") != "tpu",
    reason="on-chip suite: set GT4PY_TPU_TEST_PLATFORM=tpu",
)


#: corpus size is env-tunable: the persistent compile cache makes re-runs
#: cheap, so sweeps can raise this well beyond the CI default
N_CHIP_FUZZ_SEEDS = int(os.environ.get("GT4PY_TPU_CHIP_FUZZ_SEEDS", "16"))


@pytest.mark.parametrize("seed", range(N_CHIP_FUZZ_SEEDS))
def test_fuzz_on_chip(seed):
    from gt4py_tpu.testing.program_gen import run_differential_case

    # looser than the interpret-mode leg: Mosaic transcendental
    # approximations and XLA's excess-precision FMA fusion differ by an
    # ulp, which catastrophic cancellation in random expressions
    # amplifies (observed: abs <= 3.4e-5, rel <= 5% on near-zero values)
    run_differential_case(
        seed,
        backends=("pallas",),
        dtype=np.float32,
        aligned=True,
        rtol=1e-3,
        atol=2e-4,
        # branch-flip allowance: excess-precision FMA can flip a
        # data-dependent condition at ulp-close points (isolated huge
        # deltas no tolerance covers; corpus batch r5 seeds 192/8081)
        max_flip_fraction=1e-4,
    )


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("GT4PY_TPU_CHIP_UNALIGNED_SEEDS", "8")))
)
def test_unaligned_fuzz_on_chip(seed):
    """UNALIGNED geometry on real Mosaic: random programs at domains off
    the (8, 128) grid either repair onto the kernel path (functional
    pads + rounded-up domains) or choose XLA by cost model -- both must
    match the oracle.  This leg found the padded-domain region-anchor
    bug (seed 8003, r5): keep seed*31+7 so that case stays pinned."""
    import random as _random

    from gt4py_tpu.testing.program_gen import run_differential_case

    rng = _random.Random((8000 + seed) * 31 + 7)
    domain = (rng.randint(9, 40), rng.randint(90, 300), rng.randint(1, 7))
    run_differential_case(
        8000 + seed,
        domain=domain,
        backends=("pallas",),
        dtype=np.float32,
        rtol=1e-3,
        atol=2e-4,
        max_flip_fraction=1e-4,
    )


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("GT4PY_TPU_CHIP_PERIODIC_SEEDS", "6")))
)
def test_periodic_fuzz_on_chip(seed):
    """Random programs under periodic ("I", "J") wrap on real Mosaic:
    exercises the circular-J lane-roll mode and wrapped-window DMA with
    generator-shaped programs (the CPU mirror is
    test_fuzz_differential.test_random_program_periodic_f32_aligned)."""
    from gt4py_tpu.testing.program_gen import run_differential_case

    run_differential_case(
        seed,
        backends=("pallas",),
        dtype=np.float32,
        aligned=True,
        periodic=("I", "J"),
        rtol=1e-3,
        atol=2e-4,
        max_flip_fraction=1e-4,
    )


@pytest.mark.parametrize("seed", range(int(os.environ.get("GT4PY_TPU_CHIP_BF16_SEEDS", "6"))))
def test_bf16_fuzz_on_chip(seed):
    """bf16 random programs at the (16, 128)-packed aligned geometry on
    real Mosaic."""
    import ml_dtypes

    from gt4py_tpu.testing.program_gen import run_differential_case

    # allow_while=False: at bf16 a value within one ulp of a while
    # threshold can round differently under chip excess precision than
    # under the oracle, flipping the iteration count -- a class no
    # tolerance covers (seed 11, r5; the f32 leg keeps whiles)
    run_differential_case(
        seed,
        backends=("pallas",),
        dtype=np.dtype(ml_dtypes.bfloat16),
        aligned=True,
        rtol=0.02,
        atol=0.01,
        allow_while=False,
        max_flip_fraction=1e-4,
    )


def _no_new_fallbacks(fn):
    from gt4py_tpu.cartesian.backend import pallas_backend

    before = len(pallas_backend.FALLBACK_EVENTS)
    out = fn()
    events = pallas_backend.FALLBACK_EVENTS[before:]
    assert not events, f"pallas fell back on chip: {events}"
    return out


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("GT4PY_TPU_CHIP_SERIALIZE_SEEDS", "6")))
)
def test_serialized_fuzz_on_chip(seed, monkeypatch):
    """Forced PARALLEL->FORWARD serialization (the mixed-stencil VMEM
    rescue) on real Mosaic: plane-by-plane evaluation with plane-local
    temp scratch must stay at oracle parity for random programs."""
    monkeypatch.setenv("GT4PY_TPU_PALLAS_SERIALIZE", "1")
    from gt4py_tpu.testing.program_gen import run_differential_case

    run_differential_case(
        seed + 60000,
        backends=("pallas",),
        dtype=np.float32,
        aligned=True,
        rtol=1e-3,
        atol=2e-4,
        max_flip_fraction=1e-4,
    )


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("GT4PY_TPU_CHIP_CHAIN_SEEDS", "6")))
)
def test_chain_fuzz_on_chip(seed):
    """Multi-hop composite gathers on real hardware: BITWISE vs the
    sequential two-hop path (values are only moved, never recomputed)."""
    from gt4py_tpu.testing.gather_fuzz import run_chain_case

    run_chain_case(seed + 70000)


def test_dycore_step_on_chip_matches_xla():
    """The product-path dycore kernels (hdiff + vadv tridiagonal + update,
    periodic wrap in the tile DMA) match the XLA executor on the chip to
    a couple of f32 ulps."""
    import jax.numpy as jnp

    from gt4py_tpu.models.dycore import MiniDycore

    k_args = dict(dtype=np.float32, aligned=True)
    pal = MiniDycore(64, 256, 16, backend="pallas", **k_args)
    ref = MiniDycore(64, 256, 16, backend="jax", **k_args)
    state = {k: jnp.asarray(v) for k, v in pal.init_state().items()}

    out_p = _no_new_fallbacks(lambda: pal.step_fn()(dict(state)))
    out_j = ref.step_fn()(dict(state))
    # a couple of f32 ulps: XLA compiles with excess precision (FMA
    # fusion) while Mosaic evaluates the written op order
    for name in ("u", "utens_stage"):
        a = np.asarray(out_p[name])
        b = np.asarray(out_j[name])
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6, err_msg=name)


def test_dycore_fused_serialized_on_chip(monkeypatch):
    """The serialized whole-dycore single kernel (PARALLEL loops rewritten
    to FORWARD by passes.serialize_parallel_k, plane-local temp scratch)
    compiles and runs on real Mosaic, matching the XLA executor.  At this
    shape the whole-column plan also fits, so the knob forces the
    serialized form; at bench scale (512^2x80) serialization is what
    keeps the fused kernel on the Mosaic path at all."""
    import jax.numpy as jnp

    from gt4py_tpu.models.dycore import MiniDycore

    monkeypatch.setenv("GT4PY_TPU_PALLAS_SERIALIZE", "1")
    k_args = dict(dtype=np.float32, aligned=True)
    pal = MiniDycore(64, 256, 16, backend="pallas", **k_args)
    ref = MiniDycore(64, 256, 16, backend="jax", **k_args)
    state = {k: jnp.asarray(v) for k, v in pal.init_state().items()}

    out_p = _no_new_fallbacks(lambda: pal.step_fn(fused=True)(dict(state)))
    out_j = ref.step_fn(fused=True)(dict(state))
    from gt4py_tpu.cartesian.backend import pallas_backend

    plan = pallas_backend.LAST_PLAN.get("dycore_fused_float32")
    assert plan and plan.get("serialized"), plan
    for name in ("u", "utens_stage"):
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_j[name]),
            rtol=2e-6, atol=2e-6, err_msg=name,
        )


def test_fv_step_on_chip_matches_xla():
    """The single-kernel FVTP2D step matches the XLA executor on the chip
    to a couple of f32 ulps."""
    import jax.numpy as jnp

    from gt4py_tpu.models.fv_advection import FvAdvection

    k_args = dict(dtype=np.float32, aligned=True)
    pal = FvAdvection(64, 256, 16, backend="pallas", **k_args)
    ref = FvAdvection(64, 256, 16, backend="jax", **k_args)
    state = {k: jnp.asarray(v) for k, v in pal.init_state().items()}

    q_p = _no_new_fallbacks(
        lambda: pal.step_fn()(state["q"], state["cx"], state["cy"])
    )
    q_j = ref.step_fn()(state["q"], state["cx"], state["cy"])
    np.testing.assert_allclose(
        np.asarray(q_p), np.asarray(q_j), rtol=2e-6, atol=2e-6
    )
    # the fused periodic step must run the circular-J (lane roll) form
    from gt4py_tpu.cartesian.backend import pallas_backend

    plan = pallas_backend.LAST_PLAN.get("fv_step_float32")
    assert plan and plan["circular"], f"circular-J did not engage: {plan}"


def test_native_coverage_on_chip():
    """Variable-K / absolute-K / data-dims stencils execute in-kernel on
    real Mosaic (the same assertions as the interpret-mode coverage
    tests, aligned geometry)."""
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, computation, interval

    F32 = gtscript.Field[np.float32]
    I32 = gtscript.Field[np.int32]

    @gtscript.stencil(backend="pallas")
    def varK(a: F32, kidx: I32, out: F32):
        with computation(PARALLEL), interval(...):
            out = a[0, 0, kidx] + a[1, 0, 0]

    @gtscript.stencil(backend="jax")
    def varK_j(a: F32, kidx: I32, out: F32):
        with computation(PARALLEL), interval(...):
            out = a[0, 0, kidx] + a[1, 0, 0]

    shape = (16 + 16, 128 + 256, 8)
    origin = (8, 128, 0)
    dom = (16, 256, 8)
    rng = np.random.default_rng(3)
    a = rng.random(shape, dtype=np.float32)
    kidx = rng.integers(-4, 5, shape).astype(np.int32)
    out_p = np.zeros(shape, np.float32)
    out_j = np.zeros(shape, np.float32)
    _no_new_fallbacks(
        lambda: varK(a.copy(), kidx.copy(), out_p, origin=origin, domain=dom)
    )
    varK_j(a.copy(), kidx.copy(), out_j, origin=origin, domain=dom)
    np.testing.assert_array_equal(out_p, out_j)


def test_sl_stencil_on_chip_matches_windowed():
    """The fused windowed semi-Lagrangian kernel matches the jnp
    roll/select formulation on the chip (few f32 ulps)."""
    import jax.numpy as jnp

    from gt4py_tpu.models.dycore import aligned_field_shape, ORIGIN_I, ORIGIN_J
    from gt4py_tpu.models.semi_lagrangian import (
        make_sl_stencil,
        semi_lagrangian_step,
    )

    NI, NJ, NK = 64, 256, 8
    shape = aligned_field_shape(NK, NI, NJ)  # physical (K, I, J)
    rng = np.random.default_rng(0)
    q = rng.random(shape, dtype=np.float32)
    u = (2.0 * (rng.random(shape) - 0.5)).astype(np.float32)
    v = (2.0 * (rng.random(shape) - 0.5)).astype(np.float32)
    dt = np.float32(0.4)

    st = make_sl_stencil(np.float32, "pallas", max_shift=1)
    fn = st.functional(
        origin=(ORIGIN_I, ORIGIN_J, 0),
        domain=(NI, NJ, NK),
        physical_layout=True,
        periodic=("I", "J"),
    )
    out = np.asarray(
        fn(q=jnp.asarray(q), u=jnp.asarray(u), v=jnp.asarray(v),
           qout=jnp.zeros_like(jnp.asarray(q)), dtdx=dt, dtdy=dt)["qout"]
    )
    oi, oj = ORIGIN_I, ORIGIN_J
    got = out[:, oi:oi+NI, oj:oj+NJ]

    # reference: the jnp windowed path on the periodic interior
    qi = q[:, oi:oi+NI, oj:oj+NJ]
    ui = u[:, oi:oi+NI, oj:oj+NJ]
    vi = v[:, oi:oi+NI, oj:oj+NJ]
    want = np.asarray(
        semi_lagrangian_step(jnp.asarray(qi), jnp.asarray(ui), jnp.asarray(vi),
                             float(dt), max_shift=1)
    )
    # the jnp reference forms xd = i - u*dt (weight error ~ulp(i) ~= 3e-5
    # in f32 at i ~ 256); the stencil splits the displacement without
    # forming i + s, so weights differ by up to that ulp
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-5)


def test_dynamic_data_index_on_chip():
    """Dynamic data-dimension reads/writes execute in-kernel on Mosaic
    (component split + ternary selects / masked per-component writes)."""
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    F32 = gtscript.Field[np.float32]
    I32 = gtscript.Field[np.int32]

    def defn(vec: gtscript.Field[(np.float32, (3,))], idx: I32, a: F32, out: F32):
        with computation(PARALLEL), interval(...):
            out = vec[0, 0, 0][idx % 3] + a[1, 0, 0]
            vec[0, 0, 0][(idx + 1) % 3] = a * 2.0

    st_p = gtscript.stencil(backend="pallas", definition=defn, rebuild=True)
    st_n = gtscript.stencil(backend="numpy", definition=defn, rebuild=True)

    shape = (16 + 16, 128 + 256, 8)
    origin = (8, 128, 0)
    dom = (16, 256, 8)
    rng = np.random.default_rng(0)
    vec0 = rng.random(shape + (3,)).astype(np.float32)
    idx0 = rng.integers(-5, 6, shape).astype(np.int32)
    a0 = rng.random(shape).astype(np.float32)
    vp, vn = vec0.copy(), vec0.copy()
    op = np.zeros(shape, np.float32)
    on = np.zeros(shape, np.float32)
    _no_new_fallbacks(
        lambda: st_p(vp, idx0.copy(), a0.copy(), op, origin=origin, domain=dom)
    )
    st_n(vn, idx0.copy(), a0.copy(), on, origin=origin, domain=dom)
    np.testing.assert_array_equal(op, on)
    np.testing.assert_array_equal(vp, vn)


def test_bf16_mode_a_kernel_on_chip():
    """bf16 buffers DMA at the (16, 128) packing: the planner expands
    halos/tiles to 16-row multiples.  Origin 8 exercises the halo
    expansion (window start 0), origin 16 the natural alignment."""
    import ml_dtypes

    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, bfloat16, computation, interval

    BF = gtscript.Field[bfloat16]

    @gtscript.stencil(backend="pallas")
    def lap_p(a: BF, out: BF, *, w: bfloat16):
        with computation(PARALLEL), interval(...):
            out = a - w * (a[1, 0, 0] + a[-1, 0, 0] + a[0, 1, 0] + a[0, -1, 0] - 4.0 * a)

    @gtscript.stencil(backend="jax")
    def lap_j(a: BF, out: BF, *, w: bfloat16):
        with computation(PARALLEL), interval(...):
            out = a - w * (a[1, 0, 0] + a[-1, 0, 0] + a[0, 1, 0] + a[0, -1, 0] - 4.0 * a)

    rng = np.random.default_rng(11)
    for oi, dI in ((8, 32), (16, 32)):
        shape = (oi + dI + 16, 128 + 256 + 128, 8)
        origin = (oi, 128, 0)
        dom = (dI, 256, 8)
        a = rng.random(shape).astype(ml_dtypes.bfloat16)
        op = np.zeros(shape, ml_dtypes.bfloat16)
        oj = np.zeros(shape, ml_dtypes.bfloat16)
        w = ml_dtypes.bfloat16(0.12)
        _no_new_fallbacks(lambda: lap_p(a.copy(), op, w=w, origin=origin, domain=dom))
        lap_j(a.copy(), oj, w=w, origin=origin, domain=dom)
        # XLA may fuse the bf16 chain with excess precision; allow 2 ulps
        np.testing.assert_allclose(
            np.asarray(op, np.float32), np.asarray(oj, np.float32),
            rtol=2 ** -7, atol=2 ** -7, err_msg=f"origin {oi}",
        )


def test_bf16_scan_and_mixed_dtype_on_chip():
    """bf16 serial-K scan (mode B, full column in VMEM) and a mixed
    f32+bf16 stencil (stencil-wide 16-row packing) on real Mosaic."""
    import ml_dtypes

    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import FORWARD, PARALLEL, bfloat16, computation, interval

    BF = gtscript.Field[bfloat16]
    F32 = gtscript.Field[np.float32]

    @gtscript.stencil(backend="pallas")
    def scan_p(a: BF, out: BF):
        with computation(FORWARD):
            with interval(0, 1):
                out = a
            with interval(1, None):
                out = out[0, 0, -1] + a

    @gtscript.stencil(backend="jax")
    def scan_j(a: BF, out: BF):
        with computation(FORWARD):
            with interval(0, 1):
                out = a
            with interval(1, None):
                out = out[0, 0, -1] + a

    shape = (16 + 32 + 16, 128 + 256 + 128, 8)  # +16 on I: mixed_p reads a[1,0,0]
    origin = (16, 128, 0)
    dom = (32, 256, 8)
    rng = np.random.default_rng(12)
    a = rng.random(shape).astype(ml_dtypes.bfloat16)
    op = np.zeros(shape, ml_dtypes.bfloat16)
    oj = np.zeros(shape, ml_dtypes.bfloat16)
    _no_new_fallbacks(lambda: scan_p(a.copy(), op, origin=origin, domain=dom))
    scan_j(a.copy(), oj, origin=origin, domain=dom)
    # both accumulate in bf16 step order: bitwise
    np.testing.assert_array_equal(np.asarray(op, np.float32), np.asarray(oj, np.float32))

    @gtscript.stencil(backend="pallas")
    def mixed_p(a: BF, c: F32, out: F32):
        with computation(PARALLEL), interval(...):
            out = a[1, 0, 0] * c + a[-1, 0, 0]

    @gtscript.stencil(backend="jax")
    def mixed_j(a: BF, c: F32, out: F32):
        with computation(PARALLEL), interval(...):
            out = a[1, 0, 0] * c + a[-1, 0, 0]

    c = rng.random(shape, dtype=np.float32)
    mp = np.zeros(shape, np.float32)
    mj = np.zeros(shape, np.float32)
    _no_new_fallbacks(lambda: mixed_p(a.copy(), c.copy(), mp, origin=origin, domain=dom))
    mixed_j(a.copy(), c.copy(), mj, origin=origin, domain=dom)
    np.testing.assert_allclose(mp, mj, rtol=2e-6, atol=2e-6)


def test_pallas_autodiff_on_chip():
    """jax.grad through the pallas functional path on chip: the custom
    VJP runs the Mosaic kernel forward and the XLA executor backward."""
    import jax
    import jax.numpy as jnp

    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    F32 = gtscript.Field[np.float32]

    def defn(a: F32, out: F32, *, w: np.float32):
        with computation(PARALLEL), interval(...):
            out = a - w * (a[1, 0, 0] + a[-1, 0, 0] - 2.0 * a)

    shape = (16 + 16, 128 + 256 + 128, 8)
    origin = (8, 128, 0)
    dom = (16, 256, 8)
    fns = {
        be: gtscript.stencil(backend=be, name=f"chip_ad_{be}")(defn).functional(
            origin=origin, domain=dom
        )
        for be in ("jax", "pallas")
    }
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    w0 = jnp.float32(0.2)

    def loss(fn, a, w):
        return jnp.sum(fn(a=a, out=jnp.zeros_like(a), w=w)["out"] ** 2)

    for argnum in (0, 1):
        gj = jax.jit(jax.grad(lambda a, w: loss(fns["jax"], a, w), argnum))(x, w0)
        gp = _no_new_fallbacks(
            lambda: jax.jit(jax.grad(lambda a, w: loss(fns["pallas"], a, w), argnum))(x, w0)
        )
        gj64 = np.asarray(gj, np.float64)
        gp64 = np.asarray(gp, np.float64)
        np.testing.assert_allclose(gp64, gj64, rtol=2e-5, atol=1e-6)
        assert np.abs(gj64).max() > 0


def test_shallow_water_step_on_chip_matches_xla():
    """The fused C-grid shallow-water kernel (momentum + forward-backward
    continuity, periodic wrap) matches the XLA executor on the chip."""
    import jax.numpy as jnp

    from gt4py_tpu.models.shallow_water import ShallowWater

    k_args = dict(dtype=np.float32, aligned=True)
    pal = ShallowWater(64, 256, 16, backend="pallas", **k_args)
    ref = ShallowWater(64, 256, 16, backend="jax", **k_args)
    state = {k: jnp.asarray(v) for k, v in pal.init_state(seed=6).items()}
    args = (state["h"], state["u"], state["v"])

    outs_p = _no_new_fallbacks(lambda: pal.step_fn()(*args))
    outs_j = ref.step_fn()(*args)
    for name, a, b in zip("huv", outs_p, outs_j):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6, err_msg=name
        )


def test_next_scan_bridge_on_chip():
    """next scan operators lowered to serial-K Mosaic kernels
    (pallas_bridge.lower_scan_operator): tuple-carry forward elimination +
    backward substitution (Thomas), f32 aligned geometry, vs the oracle."""
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends
    from gt4py_tpu.cartesian.backend import pallas_backend

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)

    @gtx.scan_operator(axis=K, forward=True, init=(0.0, 0.0))
    def fwd(carry: tuple[gtx.float32, gtx.float32], a: gtx.float32,
            b: gtx.float32, c: gtx.float32, d: gtx.float32):
        denom = b - a * carry[0]
        cp = c / denom
        dp = (d - a * carry[1]) / denom
        return (cp, dp)

    @gtx.scan_operator(axis=K, forward=False, init=0.0)
    def bwd(carry: gtx.float32, cp: gtx.float32, dp: gtx.float32) -> gtx.float32:
        return dp - cp * carry

    rng = np.random.default_rng(7)
    shape = (16, 128, 64)  # (8,128)-aligned IJ, serial K
    mk = lambda v: gtx.as_field((I, J, K), v.astype(np.float32))
    a = mk(rng.random(shape))
    b = mk(rng.random(shape) + 4.0)
    c = mk(rng.random(shape))
    d = mk(rng.random(shape))

    before = len(pallas_backend.FALLBACK_EVENTS)
    cp_g, dp_g = fwd.with_backend("pallas")(a, b, c, d)
    x_g = bwd.with_backend("pallas")(cp_g, dp_g)
    assert not pallas_backend.FALLBACK_EVENTS[before:]
    assert "next_scan_fwd" in pallas_backend.LAST_PLAN
    assert "next_scan_bwd" in pallas_backend.LAST_PLAN

    cp_r, dp_r = fwd.with_backend(backends.numpy_oracle)(a, b, c, d)
    x_r = bwd.with_backend(backends.numpy_oracle)(cp_r, dp_r)
    # XLA compiles with excess-precision FMA fusion (CLAUDE.md): per-level
    # f32 ulp differences amplify through the 64-level recurrence, and
    # near-zero solution values inflate the RELATIVE error -- compare with
    # an absolute floor at the solution scale (|x| ~ 0.1, diff ~ 5e-6)
    np.testing.assert_allclose(
        np.asarray(x_g.asnumpy(), np.float64),
        np.asarray(x_r.asnumpy(), np.float64),
        rtol=1e-4,
        atol=1e-5,
    )


def test_next_bridge_tuple_and_inline_on_chip():
    """Fused multi-output + operator-call-inlined next kernels on real
    Mosaic: laplacian helper inlined twice, tuple return, aligned
    restricted domain (pallas_bridge; CPU interpret mode cannot prove the
    Mosaic compile)."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends
    from gt4py_tpu.next.common import Domain, UnitRange
    from gt4py_tpu.cartesian.backend import pallas_backend

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    F32 = gtx.Field[gtx.Dims[I, J, K], gtx.float32]

    @gtx.field_operator
    def lap(a: F32) -> F32:
        return a(Ioff[1]) + a(Ioff[-1]) + a(Joff[1]) + a(Joff[-1]) - 4.0 * a

    @gtx.field_operator
    def pair(a: F32):
        l = lap(a)
        ll = lap(l)
        u = ll + 0.25 * l
        return (u + a, u - a)

    OI, OJ, NI, NJ, NK = 8, 128, 32, 128, 8
    SI, SJ = OI + NI + 8, OJ + NJ + 128
    a = gtx.as_field(
        (I, J, K),
        jnp.asarray(
            np.random.default_rng(11).random((SI, SJ, NK)).astype(np.float32)
        ),
    )
    dom = Domain(
        (I, J, K),
        (UnitRange(OI, OI + NI), UnitRange(OJ, OJ + NJ), UnitRange(0, NK)),
    )
    mk = lambda: gtx.as_field((I, J, K), jnp.zeros((SI, SJ, NK), np.float32))
    o1, o2 = mk(), mk()
    before = len(pallas_backend.FALLBACK_EVENTS)
    pair.with_backend("pallas")(a, out=(o1, o2), domain=dom)
    assert not pallas_backend.FALLBACK_EVENTS[before:], (
        pallas_backend.FALLBACK_EVENTS[before:]
    )
    assert "next_pair" in pallas_backend.LAST_PLAN

    a_np = gtx.as_field((I, J, K), np.asarray(a.data))
    r1 = gtx.as_field((I, J, K), np.zeros((SI, SJ, NK), np.float32))
    r2 = gtx.as_field((I, J, K), np.zeros((SI, SJ, NK), np.float32))
    pair.with_backend(backends.numpy_oracle)(a_np, out=(r1, r2), domain=dom)
    np.testing.assert_allclose(
        o1.asnumpy(), r1.asnumpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        o2.asnumpy(), r2.asnumpy(), rtol=1e-4, atol=1e-5
    )


def test_next_concat_where_sections_on_chip():
    """concat_where lowered to K-partitioned vertical sections runs as a
    Mosaic kernel (r4): the interior branch reads K-1, legal only
    through the section split."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends, concat_where, pallas_bridge
    from gt4py_tpu.cartesian.backend import pallas_backend

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Koff = gtx.FieldOffset("Koff", source=K, target=(K,))
    F32 = gtx.Field[[I, J, K], gtx.float32]

    @gtx.field_operator
    def bc_chip(a: F32):
        interior = 0.5 * (a(Koff[-1]) + a)
        return concat_where(K < 1, a * 10.0, interior)

    a_np = np.random.default_rng(21).random((64, 256, 16)).astype(np.float32)
    a = gtx.as_field((I, J, K), jnp.asarray(a_np))
    ref = bc_chip.with_backend(backends.numpy_oracle)(
        gtx.as_field((I, J, K), a_np)
    )
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    curk = pallas_backend.FALLBACK_EVENTS.cursor()
    got = bc_chip.with_backend("pallas")(a)
    assert not pallas_bridge.FALLBACK_EVENTS.since(cur)
    assert not pallas_backend.FALLBACK_EVENTS.since(curk)
    assert "next_bc_chip" in pallas_backend.LAST_PLAN
    np.testing.assert_allclose(
        got.asnumpy(), ref.asnumpy(), rtol=1e-5, atol=1e-6
    )


def test_next_program_fusion_on_chip():
    """A 3-statement program fused into ONE Mosaic kernel + thin strips
    (r4): intermediates in VMEM, halo regions completed by restricted
    XLA runs; every buffer matches the oracle."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends, program, where, pallas_bridge
    from gt4py_tpu.cartesian.backend import pallas_backend

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    F32 = gtx.Field[[I, J, K], gtx.float32]

    @gtx.field_operator
    def lap_c(a: F32) -> F32:
        return a(Ioff[1]) + a(Ioff[-1]) + a(Joff[1]) + a(Joff[-1]) - 4.0 * a

    @gtx.field_operator
    def flx_c(a: F32, lap: F32) -> F32:
        fx = lap(Ioff[1]) - lap
        return where(fx * (a(Ioff[1]) - a) > 0.0, 0.0, fx)

    @gtx.field_operator
    def out_c(a: F32, fx: F32, c: gtx.float32) -> F32:
        return a - c * (fx - fx(Ioff[-1]))

    @program
    def prog_c(a: F32, lap: F32, fx: F32, out: F32, c: gtx.float32):
        lap_c(a, out=lap)
        flx_c(a, lap, out=fx)
        out_c(a, fx, c, out=out)

    OI, OJ, NI, NJ, NK = 8, 128, 48, 128, 8
    U = gtx.UnitRange
    rng = np.random.default_rng(22)

    def fld(ilo, ihi, jlo, jhi, data=False):
        dom = gtx.Domain(
            (I, J, K),
            (U(-ilo, NI + ihi), U(-jlo, NJ + jhi), U(0, NK)),
        )
        shape = tuple(len(r) for r in dom.ranges)
        arr = (
            rng.random(shape).astype(np.float32)
            if data
            else np.zeros(shape, np.float32)
        )
        return dom, arr

    a_dom, a_np = fld(OI, OI + 8, OJ, OJ, data=True)
    lap_dom, lap_np = fld(1, 1, 1, 1)
    fx_dom, fx_np = fld(1, 0, 0, 0)
    out_dom, out_np = fld(0, 0, 0, 0)

    def run(backend, jaxed):
        mk = (
            (lambda d, x: gtx.Field(d, jnp.asarray(x)))
            if jaxed
            else (lambda d, x: gtx.Field(d, x.copy()))
        )
        args = [
            mk(a_dom, a_np),
            mk(lap_dom, lap_np),
            mk(fx_dom, fx_np),
            mk(out_dom, out_np),
        ]
        prog_c.with_backend(backend)(*args, np.float32(0.03))
        return args[1:]

    refs = run(backends.numpy_oracle, False)
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    curk = pallas_backend.FALLBACK_EVENTS.cursor()
    gots = run("pallas", True)
    assert not pallas_bridge.FALLBACK_EVENTS.since(cur)
    assert not pallas_backend.FALLBACK_EVENTS.since(curk)
    assert any(k.startswith("next_prog_prog_c") for k in pallas_backend.LAST_PLAN)
    for nm, r, g in zip(("lap", "fx", "out"), refs, gots):
        np.testing.assert_allclose(
            g.asnumpy(), r.asnumpy(), rtol=1e-5, atol=1e-6, err_msg=nm
        )


def test_next_program_mixed_schedule_on_chip():
    """Segment scheduler (r4 v2): a program mixing a fusible run, an
    interp-only scan, and a trailing per-op statement executes as
    [fused, interp, interp] with the fused segment AND the scan kernel
    both on the Mosaic path (LAST_PLAN entries), matching the oracle."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends, program, where, pallas_bridge
    from gt4py_tpu.cartesian.backend import pallas_backend

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    F32 = gtx.Field[[I, J, K], gtx.float32]

    @gtx.field_operator
    def lap_m(a: F32) -> F32:
        return a(Ioff[1]) + a(Ioff[-1]) + a(Joff[1]) + a(Joff[-1]) - 4.0 * a

    @gtx.field_operator
    def flx_m(a: F32, lp: F32) -> F32:
        fx = lp(Ioff[1]) - lp
        return where(fx * (a(Ioff[1]) - a) > 0.0, 0.0, fx)

    @gtx.scan_operator(axis=K, forward=True, init=np.float32(0.0))
    def cum_m(c: gtx.float32, x: gtx.float32) -> gtx.float32:
        return c * 0.7 + x

    @gtx.field_operator
    def upd_m(a: F32, fx: F32, c: gtx.float32) -> F32:
        return a - c * (fx - fx(Ioff[-1]))

    @program
    def prog_mx(a: F32, lp: F32, fx: F32, cc: F32, out: F32, w: gtx.float32):
        lap_m(a, out=lp)  # fused segment (2 stmts)
        flx_m(a, lp, out=fx)
        cum_m(fx, out=cc)  # interp scan (serial-K Mosaic kernel)
        upd_m(a, cc, w, out=out)  # trailing interp stmt

    NI, NJ, NK = 48, 128, 8
    U = gtx.UnitRange
    rng = np.random.default_rng(3)

    def fld(ilo, ihi, jlo, jhi, data=False):
        dom = gtx.Domain(
            (I, J, K), (U(-ilo, NI + ihi), U(-jlo, NJ + jhi), U(0, NK))
        )
        shape = tuple(len(r) for r in dom.ranges)
        arr = (
            rng.random(shape).astype(np.float32)
            if data
            else np.zeros(shape, np.float32)
        )
        return dom, arr

    # kernel-eligible geometry: origins and physical extents multiples
    # of (8, 128) on (I, J)
    a_dom, a_np = fld(16, 24, 256, 256, data=True)
    lp_dom, lp_np = fld(8, 8, 128, 128)
    fx_dom, fx_np = fld(8, 0, 0, 0)
    cc_dom, cc_np = fld(8, 0, 0, 0)
    out_dom, out_np = fld(0, 0, 0, 0)

    def run(backend, jaxed):
        mk = (
            (lambda d, x: gtx.Field(d, jnp.asarray(x)))
            if jaxed
            else (lambda d, x: gtx.Field(d, x.copy()))
        )
        args = [
            mk(a_dom, a_np),
            mk(lp_dom, lp_np),
            mk(fx_dom, fx_np),
            mk(cc_dom, cc_np),
            mk(out_dom, out_np),
        ]
        prog_mx.with_backend(backend)(*args, np.float32(0.05))
        return args[1:]

    refs = run(backends.numpy_oracle, False)
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    gots = run("pallas", True)
    fusion_ev = [
        e
        for e in pallas_bridge.FALLBACK_EVENTS.since(cur)
        if "program fusion" in e[1]
    ]
    assert not fusion_ev, fusion_ev
    kern = [k for k in pallas_backend.LAST_PLAN if "prog_mx" in k or k == "next_scan_cum_m"]
    assert any("prog_mx" in k for k in kern), kern  # fused segment on Mosaic
    assert "next_scan_cum_m" in pallas_backend.LAST_PLAN  # interp scan on Mosaic
    for nm, r, g in zip(("lp", "fx", "cc", "out"), refs, gots):
        np.testing.assert_allclose(
            g.asnumpy(), r.asnumpy(), rtol=2e-5, atol=2e-5, err_msg=nm
        )


def test_affine_remap_on_chip():
    """Affine window remap (next/affine_remap.py): on the real chip the
    planned slice/reshape replay must be BITWISE equal to the take path
    reading the same device-stored data (f32: device storage exact),
    for both the 2D e2v table and cached 1D neighbor columns."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import affine_remap as ar
    from gt4py_tpu.next.testing import E2VDim, Edge, V2EDim, Vertex, grid_mesh

    mesh = grid_mesh(64)
    V2E = gtx.FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
    rng = np.random.default_rng(21)
    psi_np = rng.random(mesh.n_vertices).astype(np.float32)
    flux_np = rng.random(mesh.n_edges).astype(np.float32)

    psi = gtx.as_field((Vertex,), jnp.asarray(psi_np))
    got2d = np.asarray(psi.remap(mesh.e2v).asnumpy())
    assert ar.plan_for(mesh.e2v) is not None
    t = np.asarray(mesh.e2v.table)
    np.testing.assert_array_equal(got2d, psi_np[t])

    from gt4py_tpu.next.common import _OFFSET_PROVIDER

    flux = gtx.as_field((Edge,), jnp.asarray(flux_np))
    tok = _OFFSET_PROVIDER.set({"V2E": mesh.v2e})
    try:
        got_col = np.asarray(flux(V2E[2]).asnumpy())
    finally:
        _OFFSET_PROVIDER.reset(tok)
    cols = mesh.v2e.__dict__.get("_column_conns")
    key = (ar.table_token(mesh.v2e.table), 2)
    assert cols and ar.plan_for(cols[key]) is not None
    tv = np.asarray(mesh.v2e.table)[:, 2]
    safe = np.clip(tv, 0, mesh.n_edges - 1)
    np.testing.assert_array_equal(got_col, flux_np[safe])


def test_sort_route_benes_on_chip():
    """Irregular-table gathers (next/sort_route.py) through the Benes
    butterfly kernel (next/benes.py) on the real chip: routed
    permutations and the shuffled-mesh remap are pure data movement and
    must be BITWISE equal to the take path; the FVM composite's fused
    multiply+sum is compared at f32-FMA-ulp tolerance vs the oracle."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import benes
    from gt4py_tpu.next import sort_route as sr
    from gt4py_tpu.next import Dims, Field, FieldOffset, backends, neighbor_sum
    from gt4py_tpu.next.testing import (
        E2VDim,
        Edge,
        V2EDim,
        Vertex,
        shuffled_mesh,
    )

    rng = np.random.default_rng(33)
    # raw butterfly permutation (power-of-two and hybrid sizes)
    for P in (1 << 17, (1 << 17) + 311):
        sigma = rng.permutation(P).astype(np.int64)
        keys = np.empty(P, dtype=np.int64)
        keys[sigma] = np.arange(P)
        x_np = rng.random(P).astype(np.float32)
        got = benes.permute(jnp.asarray(x_np), keys.astype(np.int32))
        assert got is not None, f"benes declined on chip (P={P})"
        np.testing.assert_array_equal(np.asarray(got), x_np[sigma])

    # i32 bitcast ride-through: selects/rotates must move NaN-aliasing
    # bit patterns EXACTLY on real Mosaic/XLA TPU select hardware
    P = 1 << 17
    sigma = rng.permutation(P).astype(np.int64)
    keys = np.empty(P, dtype=np.int64)
    keys[sigma] = np.arange(P)
    xi = rng.integers(0, 2**32, P, dtype=np.uint64).astype(np.uint32)
    xi[:6] = np.array(
        [0x7F800001, 0x7FC00000, 0x7F800000, 0xFF800000, 0x80000000, 0xFFFFFFFF],
        dtype=np.uint32,
    )
    xi = xi.view(np.int32)
    goti = benes.permute(jnp.asarray(xi), keys.astype(np.int32))
    assert goti is not None and goti.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(goti), xi[sigma])

    # shuffled-mesh composite vs the numpy oracle (take path)
    mesh = shuffled_mesh(192, seed=7)
    assert sr.plan_for(mesh.v2e) is not None

    # pure gather through the routed plan: data MOVEMENT only -> must
    # stay bitwise even on chip
    psi_g = np.random.default_rng(5).random(mesh.n_vertices).astype(
        np.float32
    )
    f = gtx.as_field((Vertex,), jnp.asarray(psi_g))
    got_g = np.asarray(f.remap(mesh.e2v).asnumpy())
    t_e2v = np.asarray(mesh.e2v.table)
    np.testing.assert_array_equal(got_g, psi_g[t_e2v])
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))

    @gtx.field_operator
    def gradient(
        psi: Field[Dims[Vertex], gtx.float32],
    ) -> Field[Dims[Edge], gtx.float32]:
        return psi(E2V[1]) - psi(E2V[0])

    @gtx.field_operator
    def divergence(
        flux: Field[Dims[Edge], gtx.float32],
        sign: Field[Dims[Vertex, V2EDim], gtx.float32],
    ) -> Field[Dims[Vertex], gtx.float32]:
        return neighbor_sum(flux(V2E) * sign, axis=V2EDim)

    provider = {"E2V": mesh.e2v, "V2E": mesh.v2e}
    t = np.asarray(mesh.v2e.table)
    first = np.asarray(mesh.e2v.table)[np.clip(t, 0, mesh.n_edges - 1), 0]
    sign_np = np.where(
        t == -1,
        0.0,
        np.where(first == np.arange(mesh.n_vertices)[:, None], 1.0, -1.0),
    ).astype(np.float32)
    psi_np = rng.random(mesh.n_vertices).astype(np.float32)

    def run(backend, wrap):
        psi = gtx.as_field((Vertex,), wrap(psi_np))
        sign = gtx.as_field((Vertex, V2EDim), wrap(sign_np))
        g = gradient.with_backend(backend)(psi, offset_provider=provider)
        d = divergence.with_backend(backend)(g, sign, offset_provider=provider)
        return np.asarray(d.asnumpy())

    ref = run(backends.numpy_oracle, np.asarray)
    got = run(backends.jax_jit, jnp.asarray)
    # the composite's multiply+neighbor-sum fuses with excess-precision
    # FMA on chip: a couple of f32 ulps vs the host oracle (the CPU
    # suite checks the same composite BITWISE; chip run observed
    # rel <= 2.3e-4 on near-cancelled sums)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-5)


def test_next_program_scan_and_cw_fusion_on_chip():
    """r5 fused-program splicing on real Mosaic: a scan statement (own
    serial loop) and a concat_where statement (K-sectioned loop) inside
    fused programs; values vs the embedded oracle."""
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import (
        Dims,
        Field,
        backends,
        concat_where,
        pallas_bridge,
        program,
    )

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Koff = gtx.FieldOffset("Koff", source=K, target=(K,))
    F = Field[Dims[I, J, K], gtx.float32]
    U = gtx.UnitRange
    N, M, NK = 24, 256, 6

    @gtx.field_operator
    def lap_op(t: F) -> F:
        return t(Ioff[1]) + t(Ioff[-1]) - 2.0 * t

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def integ(c: gtx.float32, x: gtx.float32) -> gtx.float32:
        return c * 0.9 + x

    @gtx.field_operator
    def bc_op(lap: F, sfc: F) -> F:
        return concat_where(K < 1, sfc * 10.0, lap(Koff[-1]) + lap)

    @gtx.field_operator
    def upd(t: F, b: F) -> F:
        return t - 0.5 * b

    @program
    def mixprog(t: F, sfc: F, lap: F, acc: F, b: F, o: F):
        lap_op(t, out=lap, domain={I: (0, 24), J: (0, 256), K: (0, 6)})
        integ(lap, out=acc)
        bc_op(acc, sfc, out=b)
        upd(t, b, out=o)

    rng = np.random.default_rng(55)

    def mk(wrap):
        full = gtx.Domain((I, J, K), (U(-1, N + 1), U(0, M), U(0, NK)))
        interior = gtx.Domain((I, J, K), (U(0, N), U(0, M), U(0, NK)))
        acc_dom = gtx.Domain((I, J, K), (U(0, N), U(0, M), U(-1, NK)))
        t = wrap(rng.random((N + 2, M, NK)).astype(np.float32))
        sfc = wrap(rng.random((N, M, NK)).astype(np.float32))
        z = lambda s: wrap(np.zeros(s, np.float32))
        return (
            gtx.Field(full, t),
            gtx.Field(interior, sfc),
            gtx.Field(interior, z((N, M, NK))),
            gtx.Field(acc_dom, z((N, M, NK + 1))),
            gtx.Field(interior, z((N, M, NK))),
            gtx.Field(interior, z((N, M, NK))),
        )

    rng = np.random.default_rng(55)
    refs = mk(np.asarray)
    mixprog.with_backend(backends.numpy_oracle)(*refs)
    rng = np.random.default_rng(55)
    gots = mk(jnp.asarray)
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    p = mixprog.with_backend("pallas")
    p(*gots)
    assert not pallas_bridge.FALLBACK_EVENTS.since(cur)
    sched = next(
        v for v in p.__dict__["_prog_bridge_plans"].values() if v is not None
    )
    assert [k for k, _ in sched.items] == ["fused"]
    for name, r, g in zip(("lap", "acc", "b", "o"), refs[2:], gots[2:]):
        np.testing.assert_allclose(
            g.asnumpy(), r.asnumpy(), rtol=2e-4, atol=1e-5, err_msg=name
        )
