"""Analytic speed-of-light table for the bench kernels (VERDICT r4 #4).

For every bench workload: flops/pt and bytes/pt from the IR
(analysis.estimate_flops_bytes), model floor
``max(bytes / BW_eff, flops / VPU_rate)`` per step, and % attained
against the measured times.  Run on any host (no chip needed -- the
model is IR-side); paste the table into docs/performance.md.

Hardware constants (documented):
- BW = 819 GB/s: NOMINAL v5e HBM bandwidth -- the true hardware bound,
  which is what "speed of light" means.  Empirical context (chip,
  r5 session, slope-timed): XLA elementwise add streams ~1000 GB/s
  apparent (loop-carried fusion inflates it), a 3-operand XLA chain
  ~282 GB/s, a minimal pallas kernel ~309 GB/s -- "effective" BW is
  pattern-dependent, so attained-% is reported against nominal.
- VPU_RATE = 3.9e12 weighted lane-ops/s: 8x128 lanes x ~940 MHz x 4
  ALU issue (public v5e core figures); division/transcendentals are
  folded into flops/pt by the IR weights, FMA pairing is not (the
  weights count MUL and ADD separately), so this is a soft ceiling.

Usage: /opt/venv/bin/python tools/sol_table.py [measured.json]
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

BW_EFF = 819e9
VPU_RATE = 3.9e12

NI = NJ = 512
NK = 80


def stencil_rows():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gt4py_tpu.models.dycore import make_hdiff, make_vadv, make_vadv_update
    from gt4py_tpu.models.fv_advection import make_fv_step
    from gt4py_tpu.models.shallow_water import ShallowWater

    f32 = np.float32
    rows = {}
    # the bench step runs TWO kernels: hdiff, then the fused
    # vadv+update stencil (models/dycore.py step_fn)
    rows["dycore (hdiff + vadv_update)"] = [
        make_hdiff(f32, "jax"),
        make_vadv_update(f32, "jax"),
    ]
    rows["FVTP2D step"] = [make_fv_step(f32, "jax")]
    sw = ShallowWater(64, 128, 4, dtype=f32, backend="jax")
    rows["shallow water step"] = [
        st for st in (getattr(sw, "stencil", None),) if st is not None
    ]
    if not rows["shallow water step"]:
        # model keeps its stencil(s) under another attribute; find them
        rows["shallow water step"] = [
            v
            for v in vars(sw).values()
            if hasattr(v, "builder") or type(v).__name__ == "StencilObject"
        ]
    rows["hdiff alone"] = [make_hdiff(f32, "jax")]
    return rows


def main():
    from gt4py_tpu.cartesian.analysis import estimate_flops_bytes

    measured = {}
    if len(sys.argv) > 1:
        measured = json.load(open(sys.argv[1]))

    points = NI * NJ * NK
    print(f"{'workload':34s} {'flops/pt':>9s} {'bytes/pt':>9s} "
          f"{'flop floor':>11s} {'byte floor':>11s} {'model floor':>12s} bound")
    for name, stencils in stencil_rows().items():
        fl = by = 0.0
        for st in stencils:
            f, b = estimate_flops_bytes(st.analysis.stencil, NK)
            fl += f
            by += b
        t_flop = fl * points / VPU_RATE * 1e3
        t_byte = by * points / BW_EFF * 1e3
        floor = max(t_flop, t_byte)
        bound = "compute" if t_flop > t_byte else "traffic"
        print(f"{name:34s} {fl:9.1f} {by:9.1f} {t_flop:10.2f}ms "
              f"{t_byte:10.2f}ms {floor:11.2f}ms {bound}")


if __name__ == "__main__":
    main()
