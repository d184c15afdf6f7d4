"""Combined mini-dycore timestep: hdiff + vertical advection + FVTP2D
tracer advection + semi-Lagrangian transport (the BASELINE "combined"
workload).  One call = one fused XLA program over physical K-leading
buffers."""

from typing import Dict, Tuple

import numpy as np

from .dycore import MiniDycore, periodic_fill
from .fv_advection import FvAdvection
from .semi_lagrangian import semi_lagrangian_step


class FullDycore:
    """Prognostic u (diffused + vertically advected) plus a tracer q
    transported by FVTP2D and a second tracer by semi-Lagrangian
    interpolation."""

    HALO = 3

    def __init__(
        self,
        ni: int,
        nj: int,
        nk: int,
        *,
        dtype=np.float32,
        backend="jax",
        aligned: bool = True,
    ):
        self.ni, self.nj, self.nk = ni, nj, nk
        self.dtype = np.dtype(dtype)
        self.dyn = MiniDycore(ni, nj, nk, dtype=dtype, backend=backend, aligned=aligned)
        self.fv = FvAdvection(ni, nj, nk, dtype=dtype, backend=backend, aligned=aligned)
        self.oi, self.oj = self.dyn.oi, self.dyn.oj
        assert self.dyn.field_shape() == self.fv.field_shape()

    def field_shape(self) -> Tuple[int, int, int]:
        return self.dyn.field_shape()

    def init_state(self, seed: int = 0) -> Dict[str, np.ndarray]:
        state = self.dyn.init_state(seed)
        fv_state = self.fv.init_state(seed + 1)
        state["q"] = fv_state["q"]
        state["cx"] = fv_state["cx"]
        state["cy"] = fv_state["cy"]
        rng = np.random.default_rng(seed + 2)
        state["qsl"] = rng.random(self.field_shape()).astype(self.dtype)
        return state

    def step_fn(self, *, dt: float = 0.5):
        dyn_step = self.dyn.step_fn()
        fv_step = self.fv.step_fn()
        ni, nj = self.ni, self.nj
        oi, oj = self.oi, self.oj

        def step(state: Dict) -> Dict:
            state = dyn_step(state)
            q = fv_step(state["q"], state["cx"], state["cy"])
            # semi-Lagrangian transport of qsl on the interior (no halo):
            interior = (slice(None), slice(oi, oi + ni), slice(oj, oj + nj))
            u = state["cx"][interior] / dt  # reuse Courant winds
            v = state["cy"][interior] / dt
            # winds are Courant numbers <= 0.4 cells: the windowed (W=1)
            # roll/select formulation applies -- ~250x faster than the
            # general TPU gather (see semi_lagrangian_step)
            qsl_int = semi_lagrangian_step(
                state["qsl"][interior], u, v, dt, max_shift=1
            )
            new = dict(state)
            new["q"] = q
            new["qsl"] = state["qsl"].at[interior].set(qsl_int)
            return new

        return step
