"""CPU-testable TPU kernel eligibility (VERDICT r4 #2).

All alignment/planning Pallas gates engage only in ALIGNED mode, which
historically meant ``platform == "tpu"`` -- so a stencil silently
de-kerneling ON CHIP (the r4 bench's `next_out_op` at 512^2x80) could
not fail any CPU test.  ``PallasBackend.plan_tpu`` runs the REAL
planning code path (``_pallas_trace(plan_only=True)``) in aligned mode
on any platform, raising exactly when a chip run would fall back.

These tests intercept ``PallasBackend.apply`` (the single execution
entry used by the per-statement bridge, scans, and fused program
instances) to plan-check every stencil the bench's hdiff program
dispatches at FULL bench scale -- exact halo'd buffer shapes -- without
executing a kernel.  The r4 cliff is also pinned: the final-update
statement's buffers (odd halo widths, J rows not lane multiples) are
geometry-infeasible as allocated, and stay on the kernel path only via
the geometry-repair pads (functional XLA pad + slice-back).
"""

import numpy as np
import pytest

import gt4py_tpu.next as gtx
from gt4py_tpu import config
from gt4py_tpu.next import Dims, Field, backends, program, where
from gt4py_tpu.next import pallas_bridge
from gt4py_tpu.next.common import Domain, UnitRange

NI = NJ = 512
NK = 80
OI, OJ = 8, 128
SI, SJ = OI + NI + 16, OJ + NJ + 128

I = gtx.Dimension("I")
J = gtx.Dimension("J")
K = gtx.Dimension("K", kind=gtx.DimensionKind.VERTICAL)
Ioff = gtx.FieldOffset("Ioff", source=I, target=(I,))
Joff = gtx.FieldOffset("Joff", source=J, target=(J,))
FT = Field[Dims[I, J, K], gtx.float32]
U = UnitRange


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


def _bench_args():
    """EXACT buffer geometry of bench.py::bench_tpu_next_hdiff_program."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    full = Domain((I, J, K), (U(0, SI), U(0, SJ), U(0, NK)))
    inp = gtx.Field(
        full, jnp.asarray(rng.random((SI, SJ, NK)).astype("float32"))
    )
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
        shape = tuple(len(r) for r in dom.ranges)
        return gtx.Field(dom, jnp.zeros(shape, jnp.float32))

    lap = fld(1, 1, 1, 1)
    fx = fld(1, 0, 0, 0)
    fy = fld(0, 0, 1, 0)
    res = fld(0, 0, 0, 0)
    return inp, coeff, lap, fx, fy, res


@pytest.fixture
def plan_intercept(monkeypatch):
    """Replace PallasBackend.apply with plan_tpu + zero outputs: the full
    dispatch path runs (bridge lowering, domain math, _prepare metas) but
    each stencil is PLANNED in aligned/TPU mode instead of executed.  A
    would-be chip fallback surfaces as a hard AssertionError."""
    from gt4py_tpu.cartesian.backend import pallas_backend as pb

    plans = {}

    def fake_apply(
        self, arrays, scalars, domain, origins, physical_layout=False, periodic=()
    ):
        import jax.numpy as jnp

        metas, _ = self._prepare(
            arrays, origins, as_device=False, physical_in=physical_layout
        )
        name = self.analysis.stencil.name
        try:
            plans[name] = self.plan_tpu(metas, domain, periodic)
        except pb._PallasIneligible as e:
            raise AssertionError(
                f"stencil '{name}' would fall back to XLA on chip: {e}"
            ) from e
        out = {}
        for wname in self.written:
            if wname in arrays:
                out[wname] = jnp.zeros(
                    np.shape(arrays[wname]), metas[wname].dtype
                )
        return out

    monkeypatch.setattr(pb.PallasBackend, "apply", fake_apply)
    return plans


def test_bench_hdiff_program_stmtwise_stays_on_kernel_path(
    plan_intercept, monkeypatch
):
    """Every statement of the bench hdiff program at 512^2x80 -- the
    exact halo'd shapes -- plans as a TPU kernel (the r4 bench caught
    `next_out_op` silently falling back on chip at these shapes)."""
    monkeypatch.setattr(config, "PROGRAM_FUSION", False)
    args = _bench_args()
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    hdiff_prog.with_backend("pallas")(*args)
    assert not pallas_bridge.FALLBACK_EVENTS.since(cur)
    assert len(plan_intercept) == 4, sorted(plan_intercept)
    # the r4 cliff, pinned: every statement's geometry (odd halo widths,
    # J rows/domains not lane multiples) needs repair -- the cost model
    # then decides kernel-with-pads vs explicit XLA.  Either way the
    # decision is visible; what must NEVER happen again is a silent
    # _PallasIneligible cliff (plan_tpu raising = test failure)
    decided = [
        n
        for n, p in plan_intercept.items()
        if p.get("repair") or p.get("mode") == "xla-by-cost"
    ]
    assert decided, (
        "expected bench-geometry statements to exercise the repair/cost "
        f"path (the r4 on-chip fallback class); plans: {plan_intercept}"
    )


def test_bench_hdiff_program_fused_stays_on_kernel_path(
    plan_intercept, monkeypatch
):
    """The FUSED program instance at bench scale also plans cleanly."""
    monkeypatch.setattr(config, "PROGRAM_FUSION", True)
    args = _bench_args()
    cur = pallas_bridge.FALLBACK_EVENTS.cursor()
    hdiff_prog.with_backend("pallas")(*args)
    assert not pallas_bridge.FALLBACK_EVENTS.since(cur)
    assert plan_intercept, "fused instance never reached the planner"
    for name, plan in plan_intercept.items():
        assert "TI" in plan and "TK" in plan, (name, plan)


def test_plan_tpu_rejects_f64_on_cpu():
    """The 64-bit Mosaic gate engages platform-independently in plan_tpu
    (previously invisible to the CPU suite)."""
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.backend import pallas_backend as pb
    from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

    @gtscript.stencil(backend="pallas", name="f64_gate_probe")
    def st(a: gtscript.Field[np.float64], b: gtscript.Field[np.float64]):
        with computation(PARALLEL), interval(...):
            b = a + 1.0

    backend = st.backend
    arrays = {
        "a": np.zeros((8, 128, 4)),
        "b": np.zeros((8, 128, 4)),
    }
    origins = {"a": (0, 0, 0), "b": (0, 0, 0)}
    metas, _ = backend._prepare(arrays, origins, as_device=False)
    with pytest.raises(pb._PallasIneligible):
        backend.plan_tpu(metas, (8, 128, 4))


@pytest.mark.parametrize("seed", [10008, 10030, 10081, 10126])
def test_bridge_fuzz_under_tpu_planning(seed, monkeypatch):
    """Bridge fuzz with ASSUME_TPU_PLANNING: f64 cases lower through the
    bridge, the ALIGNED kernel gate then rejects them (as on a real
    chip) and the scan-plan XLA-fallback route runs -- the path where
    aliased IR nodes were double-renamed by the lax.scan plane rewrite
    (KeyError '__out__carry[1]__xs[0]', r5 sweep seed 10008)."""
    from gt4py_tpu import config
    from gt4py_tpu.testing.next_fuzz import run_bridge_case

    monkeypatch.setattr(config, "ASSUME_TPU_PLANNING", True)
    run_bridge_case(seed)
