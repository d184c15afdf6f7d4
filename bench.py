"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.md): grid-points/s/chip over the dycore workloads
(horizontal diffusion + vertical advection w/ tridiagonal scans) at
512^2 x 80.  ``vs_baseline`` is the speedup over the numpy oracle
(reference gt4py numpy-backend semantics): the denominator is a PINNED,
dated capture (ORACLE_DYCORE_S/ORACLE_FV_S below) so the ratio is
comparable across rounds; GT4PY_TPU_BENCH_ORACLE=1 re-measures live.

Methodology: the tunneled TPU has ~ms-scale dispatch/readback latency, so
each workload is iterated inside a single jit (lax.fori_loop) and timed at
two iteration counts; the per-iteration time is the slope, which cancels
dispatch latency, readback, and compile effects.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --mesh [N]: shard the bench workloads over an N-device mesh.  With real
# multi-chip hardware the sharded step is timed; with a single chip (this
# environment) the mesh is N virtual CPU devices and the mode validates +
# times the sharded program honestly labeled as a CPU number.  The device
# count flag must reach XLA before the CPU client exists.
_MESH_N = None
if "--mesh" in sys.argv:
    _i = sys.argv.index("--mesh")
    _nxt = sys.argv[_i + 1] if len(sys.argv) > _i + 1 else ""
    _MESH_N = int(_nxt) if _nxt.isdigit() else 8
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={_MESH_N}"
        )

import numpy as np

NI, NJ, NK = 512, 512, 80
HALO = 3
DTYPE = np.float32  # TPU-native precision; f64 parity is gated in tests

# Pinned oracle denominator for ``vs_baseline`` (VERDICT r4 weak #6: a
# single same-session oracle run is noisy enough to swing the ratio 3x
# across rounds).  These are the driver-captured numpy-oracle times from
# BENCH_r04.json (2026-08-20, this host, f64, 512^2x80); re-measure with
# GT4PY_TPU_BENCH_ORACLE=1 (reported to stderr, never the ratio).
ORACLE_DYCORE_S = 14.543
ORACLE_FV_S = 35.307


def _build_state(model):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in model.init_state(seed=3).items()}


def _robust_slope(timed, i1: int, i2: int) -> float:
    """Per-iteration time from two-point measurements, robust to relay
    contention: when one sample hits a degraded relay window the raw
    slope can collapse toward zero (the r5 full bench captured a
    physically impossible 0.05 ms tridiagonal solve).  The i2-run
    AVERAGE cannot distinguish that from a genuinely fast kernel -- the
    relay's per-call dispatch overhead (~tens of ms) dominates fast
    rows' averages -- so an implausibly small slope triggers ONE fresh
    re-measurement and the larger of the two slopes wins: a collapsed
    slope is near zero and does not reproduce, a real fast row
    reproduces its small slope."""
    t1, t2 = timed(i1), timed(i2)
    per = (t2 - t1) / (i2 - i1)
    if per < 0.2 * (t2 / i2):
        u1, u2 = timed(i1), timed(i2)
        per = max(per, (u2 - u1) / (i2 - i1))
    return per


def _timed_loop(step_fn, state, iters, repeats=2, sum_keys=("u",)):
    """Time `iters` applications of step_fn composed inside one jit.

    The shared TPU relay shows up-to-2x contention swings; take the min
    over `repeats` trials to approximate the uncontended time.
    ``sum_keys`` must cover every independent computation chain in the
    step -- anything the final readback does not observe is dead code
    XLA deletes (and the bench then under-reports)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(state):
        def body(_, s):
            return step_fn(s)

        final = jax.lax.fori_loop(0, iters, body, state)
        return sum(jnp.sum(final[k]) for k in sum_keys)

    # warm (compile + first dispatch)
    float(run(state))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(state))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_tpu_dycore(dtype=None):
    """Per-iteration time of the fused hdiff+vadv+update step on device."""
    from gt4py_tpu.models import MiniDycore

    model = MiniDycore(NI, NJ, NK, dtype=dtype or DTYPE, backend="pallas")
    step = model.step_fn()
    state = _build_state(model)

    i1, i2 = 3, 15
    return max(
        _robust_slope(lambda n: _timed_loop(step, state, n), i1, i2), 1e-9
    )


def bench_tpu_fv(dtype=None):
    """Per-iteration time of the FVTP2D advection step on device."""
    import jax
    import jax.numpy as jnp

    from gt4py_tpu.models import FvAdvection

    model = FvAdvection(NI, NJ, NK, dtype=dtype or DTYPE, backend="pallas")
    st = {k: jnp.asarray(v) for k, v in model.init_state(seed=4).items()}
    st["cx"], st["cy"] = model.fill_winds(st["cx"], st["cy"])
    fv_step = model.step_fn(winds_filled=True)

    def step(state):
        q = fv_step(state["q"], state["cx"], state["cy"])
        new = dict(state)
        new["q"] = q
        new["u"] = q  # reuse the _timed_loop harness (sums state["u"])
        return new

    st["u"] = st["q"]
    i1, i2 = 3, 15
    return max(
        _robust_slope(lambda n: _timed_loop(step, st, n), i1, i2), 1e-9
    )


def bench_oracle_fv(n_iters=1):
    from gt4py_tpu.models import FvAdvection

    # warm the stencil builds on a tiny domain, then time ONE full-scale
    # step directly (cache effects make scale extrapolation unreliable)
    warm = FvAdvection(16, 16, 4, dtype=np.float64, backend="numpy", aligned=False)
    wst = warm.init_state(seed=4)
    WL = {k: np.transpose(v, (1, 2, 0)).copy() for k, v in wst.items()}
    warm.run_numpy_oracle(WL["q"], WL["cx"], WL["cy"])

    model = FvAdvection(NI, NJ, NK, dtype=np.float64, backend="numpy", aligned=False)
    st = model.init_state(seed=4)
    L = {k: np.transpose(v, (1, 2, 0)).copy() for k, v in st.items()}
    t0 = time.perf_counter()
    for _ in range(n_iters):
        model.run_numpy_oracle(L["q"], L["cx"], L["cy"])
    return (time.perf_counter() - t0) / n_iters


def bench_oracle_dycore(n_iters=1):
    """Numpy-oracle timestep (hdiff + vadv + update) on this host."""
    from gt4py_tpu.models.dycore import make_hdiff, make_vadv

    h = HALO
    hdiff = make_hdiff(np.float64, backend="numpy")
    vadv = make_vadv(np.float64, backend="numpy")
    shape = (NI + 2 * h, NJ + 2 * h, NK)
    rng = np.random.default_rng(3)
    u = rng.random(shape)
    coeff = 0.025 * rng.random(shape)
    wcon = 0.2 * rng.random(shape)
    utens = 0.01 * rng.random(shape)
    utens_stage = rng.random(shape)
    diffused = np.zeros_like(u)

    origin = (h, h, 0)
    domain = (NI, NJ, NK)

    def one_step():
        hdiff(u, diffused, coeff, origin=origin, domain=domain)
        vadv(
            utens_stage, diffused, wcon, diffused, utens,
            dtr_stage=3.0, origin=origin, domain=domain,
        )
        u[h:-h, h:-h] = diffused[h:-h, h:-h] + (1.0 / 3.0) * utens_stage[h:-h, h:-h]

    # warm the stencil builds on a tiny call, then time full scale once
    hdiff(
        u[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        diffused[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        coeff[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        origin=origin, domain=(8, 8, 4),
    )
    vadv(
        utens_stage[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        diffused[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        wcon[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        diffused[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        utens[: 8 + 2 * h, : 8 + 2 * h, :4].copy(),
        dtr_stage=3.0, origin=origin, domain=(8, 8, 4),
    )
    t0 = time.perf_counter()
    for _ in range(n_iters):
        one_step()
    return (time.perf_counter() - t0) / n_iters


def bench_tpu_full_dycore():
    """Per-iteration time of the FullDycore step (dycore + FV tracer +
    semi-Lagrangian tracer) at 512^2 x 80."""
    from gt4py_tpu.models.full_dycore import FullDycore

    model = FullDycore(NI, NJ, NK, dtype=DTYPE, backend="pallas")
    step = model.step_fn()
    state = _build_state(model)
    i1, i2 = 3, 9
    # sum ALL prognostic chains: u (dycore), q (FV), qsl (semi-Lagrangian)
    # are independent -- summing only u lets XLA dead-code the tracers
    keys = ("u", "q", "qsl")
    return max(
        _robust_slope(
            lambda n: _timed_loop(step, state, n, sum_keys=keys), i1, i2
        ),
        1e-9,
    )


def bench_tpu_fv_1024():
    """FVTP2D at the 1024^2 x 80 scale (BASELINE large-grid row)."""
    import jax.numpy as jnp

    from gt4py_tpu.models import FvAdvection

    model = FvAdvection(1024, 1024, NK, dtype=DTYPE, backend="pallas")
    st = {k: jnp.asarray(v) for k, v in model.init_state(seed=4).items()}
    st["cx"], st["cy"] = model.fill_winds(st["cx"], st["cy"])
    fv_step = model.step_fn(winds_filled=True)

    def step(state):
        q = fv_step(state["q"], state["cx"], state["cy"])
        new = dict(state)
        new["q"] = q
        new["u"] = q
        return new

    st["u"] = st["q"]
    i1, i2 = 3, 9
    return max(
        _robust_slope(lambda n: _timed_loop(step, st, n), i1, i2), 1e-9
    )


def bench_tpu_next_hdiff():
    """Horizontal diffusion written in the NEXT field-view DSL at
    512^2 x 80 f32: the parsed/typed operator stages under jit into one
    fused XLA program (periodic wrap re-pad between iterations)."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, where

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    FT = Field[Dims[I, J, K], gtx.float32]

    @gtx.field_operator
    def hdiff(inp: FT, coeff: FT) -> FT:
        lap = 4.0 * inp - (
            inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])
        )
        flx = lap(Ioff[1]) - lap
        flx = where(flx * (inp(Ioff[1]) - inp) > 0.0, 0.0, flx)
        fly = lap(Joff[1]) - lap
        fly = where(fly * (inp(Joff[1]) - inp) > 0.0, 0.0, fly)
        return inp - coeff * (
            flx - flx(Ioff[-1]) + fly - fly(Joff[-1])
        )

    h = 2
    rng = np.random.default_rng(5)
    inp = jnp.asarray(
        rng.random((NI + 2 * h, NJ + 2 * h, NK)).astype("float32")
    )
    coeff = jnp.asarray(
        0.025 * rng.random((NI + 2 * h, NJ + 2 * h, NK)).astype("float32")
    )
    cf = gtx.as_field((I, J, K), coeff)

    def step(arr):
        out = hdiff(gtx.as_field((I, J, K), arr), cf)  # domain shrinks by h
        return jnp.pad(out.data, ((h, h), (h, h), (0, 0)), mode="wrap")

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def run(arr, iters):
        return jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, a: step(a), arr)
        )

    def timed(iters):
        float(run(inp, iters))  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(inp, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    i1, i2 = 3, 15
    return max(_robust_slope(timed, i1, i2), 1e-9)


def bench_tpu_next_hdiff_pallas():
    """The same next-DSL hdiff through the pallas bridge
    (next/pallas_bridge.py): the typed field-view IR lowers to a fused
    cartesian Mosaic kernel; aligned halo geometry + out=/domain= pin the
    compute domain exactly like the cartesian bench."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, where
    from gt4py_tpu.next.common import Domain, UnitRange

    OI, OJ = 8, 128
    SI, SJ = OI + NI + 16, OJ + NJ + 128

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    FT = Field[Dims[I, J, K], gtx.float32]

    @gtx.field_operator
    def hdiff(inp: FT, coeff: FT) -> FT:
        lap = 4.0 * inp - (
            inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])
        )
        flx = lap(Ioff[1]) - lap
        flx = where(flx * (inp(Ioff[1]) - inp) > 0.0, 0.0, flx)
        fly = lap(Joff[1]) - lap
        fly = where(fly * (inp(Joff[1]) - inp) > 0.0, 0.0, fly)
        return inp - coeff * (flx - flx(Ioff[-1]) + fly - fly(Joff[-1]))

    rng = np.random.default_rng(5)
    inp0 = jnp.asarray(rng.random((SI, SJ, NK)).astype("float32"))
    coeff = gtx.as_field(
        (I, J, K),
        jnp.asarray(0.025 * rng.random((SI, SJ, NK)).astype("float32")),
    )
    dom = Domain(
        (I, J, K),
        (UnitRange(OI, OI + NI), UnitRange(OJ, OJ + NJ), UnitRange(0, NK)),
    )
    op = hdiff.with_backend("pallas")
    h = 2

    def step(arr):
        res = gtx.as_field((I, J, K), jnp.zeros_like(arr))
        op(gtx.as_field((I, J, K), arr), coeff, out=res, domain=dom)
        a = res.data
        a = a.at[OI - h : OI].set(a[OI + NI - h : OI + NI])
        a = a.at[OI + NI : OI + NI + h].set(a[OI : OI + h])
        a = a.at[:, OJ - h : OJ].set(a[:, OJ + NJ - h : OJ + NJ])
        a = a.at[:, OJ + NJ : OJ + NJ + h].set(a[:, OJ : OJ + h])
        return a

    def timed(iters):
        @jax.jit
        def run(arr):
            import jax.lax as lax

            return jnp.sum(
                lax.fori_loop(0, iters, lambda _, a: step(a), arr)
            )

        float(run(inp0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(inp0))
            best = min(best, time.perf_counter() - t0)
        return best

    i1, i2 = 3, 15
    return max(_robust_slope(timed, i1, i2), 1e-9)


def bench_tpu_next_hdiff_program(fused: bool = True):
    """hdiff written as a 4-statement next-DSL PROGRAM (lap -> flx/fly ->
    out, each a small operator writing a user-visible intermediate
    Field).  ``fused=True`` runs it through program fusion
    (pallas_bridge.lower_program: one Mosaic kernel + thin halo strips);
    ``fused=False`` disables fusion so every statement pays its own
    kernel + HBM round trip -- the r3 behavior this row exists to beat."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu import config as _cfg
    from gt4py_tpu.next import Dims, Field, program, where
    from gt4py_tpu.next.common import Domain, UnitRange

    OI, OJ = 8, 128
    SI, SJ = OI + NI + 16, OJ + NJ + 128

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    FT = Field[Dims[I, J, K], gtx.float32]

    @gtx.field_operator
    def lap_op(inp: FT) -> FT:
        return 4.0 * inp - (
            inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])
        )

    @gtx.field_operator
    def flx_op(inp: FT, lap: FT) -> FT:
        fx = lap(Ioff[1]) - lap
        return where(fx * (inp(Ioff[1]) - inp) > 0.0, 0.0, fx)

    @gtx.field_operator
    def fly_op(inp: FT, lap: FT) -> FT:
        fy = lap(Joff[1]) - lap
        return where(fy * (inp(Joff[1]) - inp) > 0.0, 0.0, fy)

    @gtx.field_operator
    def out_op(inp: FT, fx: FT, fy: FT, coeff: FT) -> FT:
        return inp - coeff * (fx - fx(Ioff[-1]) + fy - fy(Joff[-1]))

    @program
    def hdiff_prog(inp: FT, coeff: FT, lap: FT, fx: FT, fy: FT, res: FT):
        lap_op(inp, out=lap)
        flx_op(inp, lap, out=fx)
        fly_op(inp, lap, out=fy)
        out_op(inp, fx, fy, coeff, out=res)

    rng = np.random.default_rng(5)
    inp0 = jnp.asarray(rng.random((SI, SJ, NK)).astype("float32"))
    U = UnitRange
    full = Domain((I, J, K), (U(0, SI), U(0, SJ), U(0, NK)))
    coeff = gtx.Field(
        full, jnp.asarray(0.025 * rng.random((SI, SJ, NK)).astype("float32"))
    )

    def fld(ilo, ihi, jlo, jhi):
        dom = Domain(
            (I, J, K),
            (
                U(OI - ilo, OI + NI + ihi),
                U(OJ - jlo, OJ + NJ + jhi),
                U(0, NK),
            ),
        )
        return dom, tuple(len(r) for r in dom.ranges)

    # exact halo sizing: lap is consumed at (0,+1) by flx (I) / fly (J);
    # fx/fy are consumed at (-1,0) by the final update
    lap_dom, lap_shape = fld(1, 1, 1, 1)
    fx_dom, fx_shape = fld(1, 0, 0, 0)
    fy_dom, fy_shape = fld(0, 0, 1, 0)
    res_dom, res_shape = fld(0, 0, 0, 0)
    prog = hdiff_prog.with_backend("pallas")
    h = 2

    def step(arr):
        lap = gtx.Field(lap_dom, jnp.zeros(lap_shape, jnp.float32))
        fx = gtx.Field(fx_dom, jnp.zeros(fx_shape, jnp.float32))
        fy = gtx.Field(fy_dom, jnp.zeros(fy_shape, jnp.float32))
        res = gtx.Field(res_dom, jnp.zeros(res_shape, jnp.float32))
        prog(gtx.Field(full, arr), coeff, lap, fx, fy, res)
        a = arr.at[OI : OI + NI, OJ : OJ + NJ].set(res.data)
        a = a.at[OI - h : OI].set(a[OI + NI - h : OI + NI])
        a = a.at[OI + NI : OI + NI + h].set(a[OI : OI + h])
        a = a.at[:, OJ - h : OJ].set(a[:, OJ + NJ - h : OJ + NJ])
        a = a.at[:, OJ + NJ : OJ + NJ + h].set(a[:, OJ : OJ + h])
        return a

    old = _cfg.PROGRAM_FUSION
    _cfg.PROGRAM_FUSION = fused
    try:

        def timed(iters):
            @jax.jit
            def run(arr):
                import jax.lax as lax

                return jnp.sum(
                    lax.fori_loop(0, iters, lambda _, a: step(a), arr)
                )

            float(run(inp0))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(inp0))
                best = min(best, time.perf_counter() - t0)
            return best

        i1, i2 = 3, 15
        return max(_robust_slope(timed, i1, i2), 1e-9)
    finally:
        _cfg.PROGRAM_FUSION = old


def bench_tpu_next_mixed_program(fused: bool = True):
    """A dycore-shaped MIXED next-DSL program at 512^2x80: horizontal
    laplacian (PARALLEL) -> vertical integration scan (FORWARD serial-K)
    -> pointwise update.  ``fused=True`` runs it as ONE kernel (the scan
    statement joins the fused segment as its own serial vertical loop,
    r5); ``fused=False`` pays a kernel + HBM round trip per statement --
    the r4 behavior where scans broke fusion."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu import config as _cfg
    from gt4py_tpu.next import Dims, Field, program
    from gt4py_tpu.next.common import Domain, UnitRange

    OI, OJ = 8, 128
    SI, SJ = OI + NI + 8, OJ + NJ + 128

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
    Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
    Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
    FT = Field[Dims[I, J, K], gtx.float32]

    @gtx.field_operator
    def lap_op(inp: FT) -> FT:
        return 4.0 * inp - (
            inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])
        )

    @gtx.scan_operator(axis=K, forward=True, init=0.0)
    def integ(carry: gtx.float32, x: gtx.float32) -> gtx.float32:
        return carry * 0.9 + x

    @gtx.field_operator
    def upd(inp: FT, acc: FT) -> FT:
        return inp - 0.1 * acc

    @program
    def mixed_prog(inp: FT, lap: FT, acc: FT, res: FT):
        lap_op(inp, out=lap)
        integ(lap, out=acc)
        upd(inp, acc, out=res)

    rng = np.random.default_rng(9)
    U = UnitRange
    full = Domain((I, J, K), (U(0, SI), U(0, SJ), U(0, NK)))
    inp0 = jnp.asarray(rng.random((SI, SJ, NK)).astype("float32"))
    interior = Domain(
        (I, J, K), (U(OI, OI + NI), U(OJ, OJ + NJ), U(0, NK))
    )

    def step(arr):
        lap = gtx.Field(interior, jnp.zeros((NI, NJ, NK), jnp.float32))
        acc = gtx.Field(interior, jnp.zeros((NI, NJ, NK), jnp.float32))
        res = gtx.Field(interior, jnp.zeros((NI, NJ, NK), jnp.float32))
        mixed_prog(gtx.Field(full, arr), lap, acc, res)
        return arr.at[OI : OI + NI, OJ : OJ + NJ].set(res.data)

    old = _cfg.PROGRAM_FUSION
    _cfg.PROGRAM_FUSION = fused
    try:

        def timed(iters):
            @jax.jit
            def run(arr):
                import jax.lax as lax

                return jnp.sum(
                    lax.fori_loop(0, iters, lambda _, a: step(a), arr)
                )

            float(run(inp0))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(inp0))
                best = min(best, time.perf_counter() - t0)
            return best

        i1, i2 = 3, 15
        return max(_robust_slope(timed, i1, i2), 1e-9)
    finally:
        _cfg.PROGRAM_FUSION = old


def bench_tpu_next_tridiag(pallas: bool):
    """next-DSL tridiagonal solve (tuple-carry forward elimination +
    backward substitution scan operators) at 512^2 x 80 f32: the scan
    bridge lowers both scans to serial-K mode-B Mosaic kernels
    (next/pallas_bridge.lower_scan_operator); ``pallas=False`` times the
    same operators on the jit-staged embedded lax.scan path."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import backends

    I = gtx.Dimension("I")
    J = gtx.Dimension("J")
    K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)

    @gtx.scan_operator(axis=K, forward=True, init=(0.0, 0.0))
    def tri_fwd(carry: tuple[gtx.float32, gtx.float32], a: gtx.float32,
                b: gtx.float32, c: gtx.float32, d: gtx.float32):
        denom = b - a * carry[0]
        cp = c / denom
        dp = (d - a * carry[1]) / denom
        return (cp, dp)

    @gtx.scan_operator(axis=K, forward=False, init=0.0)
    def tri_bwd(carry: gtx.float32, cp: gtx.float32,
                dp: gtx.float32) -> gtx.float32:
        return dp - cp * carry

    be = "pallas" if pallas else backends.jax_jit
    fwd_b = tri_fwd.with_backend(be)
    bwd_b = tri_bwd.with_backend(be)

    rng = np.random.default_rng(9)
    mk = lambda off: gtx.as_field(
        (I, J, K), jnp.asarray(rng.random((NI, NJ, NK)).astype(DTYPE) + off)
    )
    a, b, c = mk(0.0), mk(4.0), mk(0.0)
    d0 = jnp.asarray(rng.random((NI, NJ, NK)).astype(DTYPE))

    def solve(dd):
        cp, dp = fwd_b(a, b, c, gtx.as_field((I, J, K), dd))
        return bwd_b(cp, dp).data

    def timed(iters):
        @jax.jit
        def run(dd):
            return jnp.sum(
                jax.lax.fori_loop(0, iters, lambda _, v: solve(v), dd)
            )

        float(run(d0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(d0))
            best = min(best, time.perf_counter() - t0)
        return best

    i1, i2 = 3, 15
    return max(_robust_slope(timed, i1, i2), 1e-9)


def bench_tpu_unstructured(n: int = 512, irregular: bool = False):
    """Unstructured FVM diffusion step (edge gradient + signed divergence,
    the examples/unstructured_fvm.py operators) on an n x n quad patch
    exposed as connectivity tables: ~2*n^2 gather-heavy edges through the
    jit-staged XLA path (the bridge correctly declines local dims; this
    row gives the gather path a measured number and a documented floor --
    see docs/performance.md 'Unstructured gather path').

    ``irregular=True`` runs the same physics on a SHUFFLED mesh (vertices
    and edges renumbered randomly): the affine window fit provably
    declines, so gathers exercise the sort-routing + Benes-butterfly
    compiled path (next/sort_route.py, next/benes.py) -- the row the r4
    verdict asked for (take-path floor at this scale: ~16 ms, r4)."""
    import jax
    import jax.numpy as jnp

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, FieldOffset, backends, neighbor_sum
    from gt4py_tpu.next.testing import (
        E2VDim,
        Edge,
        V2EDim,
        Vertex,
        grid_mesh,
        shuffled_mesh,
    )

    mesh = shuffled_mesh(n, seed=7) if irregular else grid_mesh(n)
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
    f64 = gtx.float32

    @gtx.field_operator
    def gradient(psi: Field[Dims[Vertex], gtx.float32]) -> Field[Dims[Edge], gtx.float32]:
        return psi(E2V[1]) - psi(E2V[0])

    @gtx.field_operator
    def divergence(
        flux: Field[Dims[Edge], gtx.float32],
        sign: Field[Dims[Vertex, V2EDim], gtx.float32],
    ) -> Field[Dims[Vertex], gtx.float32]:
        return neighbor_sum(flux(V2E) * sign, axis=V2EDim)

    provider = {"E2V": mesh.e2v, "V2E": mesh.v2e}
    grad_b = gradient.with_backend(backends.jax_jit)
    div_b = divergence.with_backend(backends.jax_jit)

    t = mesh.v2e.table
    first = mesh.e2v.table[np.clip(t, 0, mesh.n_edges - 1), 0]
    sign_np = np.where(
        t == -1, 0.0, np.where(first == np.arange(mesh.n_vertices)[:, None], 1.0, -1.0)
    ).astype(np.float32)
    sign = gtx.as_field((Vertex, V2EDim), jnp.asarray(sign_np))
    psi0 = jnp.asarray(
        np.random.default_rng(3).random(mesh.n_vertices).astype(np.float32)
    )

    def step(psi_data):
        psi = gtx.as_field((Vertex,), psi_data)
        g = grad_b(psi, offset_provider=provider)
        d = div_b(g, sign, offset_provider=provider)
        return psi_data + 0.05 * d.data

    def timed(iters):
        @jax.jit
        def run(p):
            return jnp.sum(jax.lax.fori_loop(0, iters, lambda _, x: step(x), p))

        float(run(psi0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(psi0))
            best = min(best, time.perf_counter() - t0)
        return best

    # the affine-remap path runs at ~0.03 ms/step -- far below the
    # relay's per-call noise at small iteration counts (slopes scattered
    # 0.0-1.4 ms across sessions).  Large counts put the signal well
    # above the noise for BOTH rows (irregular ~2 ms/step: ~0.2 s/run).
    i1, i2 = 10, 110
    return max(_robust_slope(timed, i1, i2), 1e-9), mesh.n_edges


def bench_tpu_shallow_water():
    """Multi-layer C-grid shallow water at 512^2 x 80 (one fused kernel:
    momentum + forward-backward continuity, periodic wrap in the DMA)."""
    import jax.numpy as jnp

    from gt4py_tpu.models import ShallowWater

    model = ShallowWater(NI, NJ, NK, dtype=DTYPE, backend="pallas")
    st = {k: jnp.asarray(v) for k, v in model.init_state(seed=6).items()}
    sw_step = model.step_fn()

    def step(state):
        h, u, v = sw_step(state["h"], state["u"], state["v"])
        return {"h": h, "u": u, "v": v}

    i1, i2 = 3, 15
    keys = ("h", "u", "v")
    return max(
        _robust_slope(
            lambda n: _timed_loop(step, st, n, sum_keys=keys), i1, i2
        ),
        1e-9,
    )


def _wait_for_tpu(max_wait_s: float = None) -> bool:
    """The shared-relay TPU backend intermittently blocks or raises
    UNAVAILABLE at init for minutes at a time (outages of 2+ hours have
    been observed).  Probe it in a subprocess (the in-process backend
    init cannot be timed out or retried once it fails) and only proceed
    when a probe succeeds.  Returns False when the deadline passes with
    the chip still unreachable; the caller must then pin the CPU
    platform BEFORE any in-process jax use, or backend init can hang
    the whole benchmark forever."""
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("GT4PY_TPU_BENCH_TPU_WAIT_S", "2400"))
    probe = (
        "from gt4py_tpu import config; config.ensure_jax_config();"
        "import jax; d = jax.devices()[0];"
        "import jax.numpy as jnp;"
        "print(d.platform, float(jnp.ones((8, 128)).sum()))"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=300,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            probed = (out.stdout or "").strip().split()
            if out.returncode == 0 and probed and probed[0].lower() not in ("cpu",):
                print(
                    f"# tpu probe ok (attempt {attempt}): {out.stdout.strip()}",
                    file=sys.stderr,
                )
                return True
            if out.returncode == 0:
                # jax silently fell back to CPU inside the probe: that is
                # NOT a chip; do not let it masquerade as one
                print(
                    f"# tpu probe got platform {probed[:1]} (attempt {attempt})",
                    file=sys.stderr,
                )
            else:
                tail = (out.stderr or "").strip().splitlines()[-1:]
                print(f"# tpu probe failed (attempt {attempt}): {tail}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# tpu probe timed out (attempt {attempt})", file=sys.stderr)
        if time.monotonic() > deadline:
            print("# tpu unavailable after deadline", file=sys.stderr)
            return False
        time.sleep(30)


def bench_mesh(n_devices: int):
    """--mesh mode: the overlapped dycore step + fused FV step sharded
    over an n-device mesh at 512^2 x 80 f32 (2D domain decomposition,
    explicit ppermute halo exchange, interior/boundary overlap).

    On this environment the mesh is virtual CPU devices, so the emitted
    number is honestly labeled; the same code path times real chips when
    a multi-chip slice is attached (devices discovered via jax.devices())."""
    import subprocess

    import jax

    # Probe for a real multi-chip slice in a SUBPROCESS: touching
    # jax.devices() in-process initializes the default backend before the
    # virtual-device XLA flag can apply to the CPU client.
    real_multi = False
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        toks = (out.stdout or "").strip().split()
        real_multi = (
            out.returncode == 0
            and len(toks) == 2
            and toks[0] != "cpu"
            and int(toks[1]) >= n_devices
        )
    except Exception:
        pass
    if not real_multi:
        jax.config.update("jax_platforms", "cpu")

    from gt4py_tpu import config

    config.ensure_jax_config()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gt4py_tpu.models import MiniDycore
    from gt4py_tpu.models.fv_advection import FvAdvection
    from gt4py_tpu.parallel import (
        CartesianMesh,
        overlapped_shard_map_stencil,
        shard_map_stencil,
    )

    devices = jax.devices()[:n_devices]
    cmesh = CartesianMesh(devices=devices)
    px, py = cmesh.shape
    ni_l, nj_l = NI // px, NJ // py
    h = MiniDycore.HALO
    sharding = NamedSharding(cmesh.mesh, P(None, "x", "y"))
    names = ("u", "coeff", "wcon", "utens", "utens_stage")

    local = MiniDycore(ni_l, nj_l, NK, dtype=DTYPE, backend="jax", aligned=False)
    dy_step = overlapped_shard_map_stencil(
        local.region_step_factory(), cmesh, (h, h),
        field_names=names, spatial_axes=(1, 2), local_shape=(ni_l, nj_l),
    )
    rng = np.random.default_rng(3)
    state = {
        name: jax.device_put(rng.random((NK, NI, NJ)).astype(DTYPE) * s, sharding)
        for name, s in zip(names, (1.0, 0.025, 0.2, 0.01, 1.0))
    }

    def step(st):
        out = dy_step(**st)
        new = dict(st)
        new.update(out)
        return new

    i1, i2 = (1, 3) if not real_multi else (3, 15)
    dy = max(
        _robust_slope(lambda n: _timed_loop(step, state, n), i1, i2), 1e-9
    )

    fv_local = FvAdvection(ni_l, nj_l, NK, dtype=DTYPE, backend="jax", aligned=False)
    fv_lstep = fv_local.local_step_fn()
    fv_h = FvAdvection.HALO
    fv_step = shard_map_stencil(
        lambda **kw: {"q": fv_lstep(kw["q"], kw["cx"], kw["cy"])},
        cmesh, (fv_h, fv_h), field_names=("q", "cx", "cy"), spatial_axes=(1, 2),
    )
    fv_state = {
        "q": rng.random((NK, NI, NJ)).astype(DTYPE),
        "cx": (0.4 * (rng.random((NK, NI, NJ)) - 0.5)).astype(DTYPE),
        "cy": (0.4 * (rng.random((NK, NI, NJ)) - 0.5)).astype(DTYPE),
    }
    fv_state = {k: jax.device_put(v, sharding) for k, v in fv_state.items()}

    def fv_one(st):
        out = fv_step(**st)
        new = dict(st)
        new["q"] = out["q"]
        new["u"] = out["q"]
        return new

    fv_state["u"] = fv_state["q"]
    fv = max(
        _robust_slope(lambda n: _timed_loop(fv_one, fv_state, n), i1, i2), 1e-9
    )

    points = NI * NJ * NK
    gps = 2 * points / (dy + fv)
    result = {
        "metric": f"mesh-sharded grid-points/s (dycore+FV, 512^2x80, f32, "
        f"{px}x{py} mesh, {'real chips' if real_multi else 'virtual CPU devices'})",
        "value": round(gps / 1e9, 4),
        "unit": "Gpoint/s",
        "vs_baseline": None,
    }
    if not real_multi:
        result["note"] = (
            "virtual CPU mesh: validates the sharded program end-to-end; "
            "NOT a chip number (single physical chip attached)"
        )
    print(
        f"# mesh: dycore {dy*1e3:.2f} ms, fv {fv*1e3:.2f} ms on {px}x{py}",
        file=sys.stderr,
    )
    print(json.dumps(result))


def main():
    if _MESH_N is not None:
        bench_mesh(_MESH_N)
        return

    from gt4py_tpu import config

    tpu_ok = _wait_for_tpu()
    if not tpu_ok:
        # Relay outage: the axon in-process backend init can hang forever,
        # so pin CPU explicitly and label the emitted metric honestly
        # rather than hanging or silently timing a dead backend.
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("# FALLBACK: timing on CPU (tpu relay down)", file=sys.stderr)
    config.ensure_jax_config()
    import jax

    platform = jax.devices()[0].platform
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    tpu_dycore = bench_tpu_dycore()
    tpu_fv = bench_tpu_fv()
    # vs_baseline divides by the PINNED oracle capture (see top of file);
    # an opt-in live re-measure is reported to stderr for drift checks
    oracle_dycore, oracle_fv = ORACLE_DYCORE_S, ORACLE_FV_S
    oracle_live = ""
    if os.environ.get("GT4PY_TPU_BENCH_ORACLE", "0") == "1":
        live_dy = bench_oracle_dycore()
        live_fv = bench_oracle_fv()
        oracle_live = (
            f" | oracle live: dycore {live_dy*1e3:.0f} ms, fv {live_fv*1e3:.0f} ms"
        )

    extra = {}
    # extras are bounded by a wall-clock budget so the driver's capture
    # always gets the final JSON line even on a degraded relay: once the
    # budget is spent, remaining rows are skipped (and named in extra)
    bench_t0 = time.perf_counter()
    budget = float(os.environ.get("GT4PY_TPU_BENCH_BUDGET_S", "1800"))
    skipped_rows = []

    def over_budget(row):
        if time.perf_counter() - bench_t0 > budget:
            skipped_rows.append(row)
            return True
        return False

    if os.environ.get("GT4PY_TPU_BENCH_EXTRA", "1") != "0":
        try:
            if over_budget("full_dycore"):
                raise RuntimeError("bench budget exhausted")
            full = bench_tpu_full_dycore()
            extra["full_dycore_512_ms"] = round(full * 1e3, 2)
            extra["full_dycore_512_gpoints"] = round(NI * NJ * NK / full / 1e9, 3)
        except Exception as e:  # keep the headline metric robust
            print(f"# full-dycore bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("fv_1024"):
                raise RuntimeError("bench budget exhausted")
            fv_big = bench_tpu_fv_1024()
            extra["fv_1024_ms"] = round(fv_big * 1e3, 2)
            extra["fv_1024_gpoints"] = round(1024 * 1024 * NK / fv_big / 1e9, 3)
        except Exception as e:
            print(f"# fv-1024 bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("bf16"):
                raise RuntimeError("bench budget exhausted")
            import ml_dtypes

            bf = ml_dtypes.bfloat16
            dy_bf = bench_tpu_dycore(dtype=bf)
            fv_bf = bench_tpu_fv(dtype=bf)
            extra["dycore_bf16_ms"] = round(dy_bf * 1e3, 2)
            extra["fv_bf16_ms"] = round(fv_bf * 1e3, 2)
        except Exception as e:
            print(f"# bf16 bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("shallow_water"):
                raise RuntimeError("bench budget exhausted")
            sw = bench_tpu_shallow_water()
            extra["shallow_water_512_ms"] = round(sw * 1e3, 2)
            extra["shallow_water_512_gpoints"] = round(NI * NJ * NK / sw / 1e9, 3)
        except Exception as e:
            print(f"# shallow-water bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("unstructured"):
                raise RuntimeError("bench budget exhausted")
            tu, n_edges = bench_tpu_unstructured()
            extra["unstructured_fvm_ms"] = round(tu * 1e3, 2)
            extra["unstructured_fvm_medges_s"] = round(n_edges / tu / 1e6, 1)
        except Exception as e:
            print(f"# unstructured bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("unstructured_irregular"):
                raise RuntimeError("bench budget exhausted")
            tui, n_edges_i = bench_tpu_unstructured(irregular=True)
            extra["unstructured_fvm_irregular_ms"] = round(tui * 1e3, 2)
            extra["unstructured_fvm_irregular_medges_s"] = round(
                n_edges_i / tui / 1e6, 1
            )
        except Exception as e:
            print(f"# unstructured-irregular bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_hdiff"):
                raise RuntimeError("bench budget exhausted")
            nh = bench_tpu_next_hdiff()
            extra["next_hdiff_512_ms"] = round(nh * 1e3, 2)
            extra["next_hdiff_512_gpoints"] = round(NI * NJ * NK / nh / 1e9, 3)
        except Exception as e:
            print(f"# next-hdiff bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_hdiff_pallas"):
                raise RuntimeError("bench budget exhausted")
            nhp = bench_tpu_next_hdiff_pallas()
            extra["next_hdiff_pallas_512_ms"] = round(nhp * 1e3, 2)
            extra["next_hdiff_pallas_512_gpoints"] = round(
                NI * NJ * NK / nhp / 1e9, 3
            )
        except Exception as e:
            print(f"# next-hdiff-pallas bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_hdiff_program"):
                raise RuntimeError("bench budget exhausted")
            nhf = bench_tpu_next_hdiff_program(fused=True)
            extra["next_hdiff_program_fused_512_ms"] = round(nhf * 1e3, 2)
            extra["next_hdiff_program_fused_512_gpoints"] = round(
                NI * NJ * NK / nhf / 1e9, 3
            )
        except Exception as e:
            print(f"# next-hdiff-program bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_hdiff_program_stmtwise"):
                raise RuntimeError("bench budget exhausted")
            nhs = bench_tpu_next_hdiff_program(fused=False)
            extra["next_hdiff_program_stmtwise_512_ms"] = round(nhs * 1e3, 2)
        except Exception as e:
            print(f"# next-hdiff-program-stmtwise bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_mixed_program"):
                raise RuntimeError("bench budget exhausted")
            nmf = bench_tpu_next_mixed_program(fused=True)
            extra["next_mixed_program_fused_512_ms"] = round(nmf * 1e3, 2)
            nms = bench_tpu_next_mixed_program(fused=False)
            extra["next_mixed_program_stmtwise_512_ms"] = round(nms * 1e3, 2)
        except Exception as e:
            print(f"# next-mixed-program bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_tridiag_pallas"):
                raise RuntimeError("bench budget exhausted")
            ntp = bench_tpu_next_tridiag(pallas=True)
            extra["next_tridiag_pallas_512_ms"] = round(ntp * 1e3, 2)
            extra["next_tridiag_pallas_512_gpoints"] = round(
                NI * NJ * NK / ntp / 1e9, 3
            )
        except Exception as e:
            print(f"# next-tridiag-pallas bench failed: {e}", file=sys.stderr)
        try:
            if over_budget("next_tridiag"):
                raise RuntimeError("bench budget exhausted")
            ntj = bench_tpu_next_tridiag(pallas=False)
            extra["next_tridiag_512_ms"] = round(ntj * 1e3, 2)
        except Exception as e:
            print(f"# next-tridiag bench failed: {e}", file=sys.stderr)

    # combined BASELINE metric: total points processed per second across
    # the hdiff+vadv dycore step and the FVTP2D advection step
    points = NI * NJ * NK
    gps = 2 * points / (tpu_dycore + tpu_fv)
    oracle_gps = 2 * points / (oracle_dycore + oracle_fv)
    result = {
        "metric": "grid-points/s/chip (hdiff+vadv+FV advection, 512^2x80, f32)",
        "value": round(gps / 1e9, 3),
        "unit": "Gpoint/s",
        "vs_baseline": round(gps / oracle_gps, 2),
    }
    if not tpu_ok:
        result["note"] = "CPU fallback: tpu relay unreachable; not a chip number"
    if skipped_rows:
        extra["skipped_rows_over_budget"] = skipped_rows
    if extra:
        result["extra"] = extra
    print(
        f"# tpu: dycore {tpu_dycore*1e3:.2f} ms, fv {tpu_fv*1e3:.2f} ms | "
        f"oracle (pinned r4): dycore {oracle_dycore*1e3:.0f} ms, "
        f"fv {oracle_fv*1e3:.0f} ms{oracle_live} | "
        f"extra: {extra}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
