"""Execution backends for the next field-view DSL.

The reference dispatches operators/programs to program processors
(roundtrip's generated-Python oracle, gtfn C++ CPU/GPU, dace SDFGs --
src/gt4py/next/program_processors/runners/).  Here every executor runs
the same typed-IR interpreter (interpreter.py); a backend only chooses
the array namespace and whether the run is staged under ``jax.jit``:

- ``numpy_oracle`` (reference: roundtrip) -- eager numpy execution, the
  independent reference semantics;
- ``jax_eager`` -- op-by-op on device (debugging on real shapes);
- ``jax_jit`` (reference: gtfn_cpu / gtfn_gpu; XLA plays the role of the
  generated C++/CUDA) -- the whole operator traced once and compiled.

``with_backend(None)`` keeps the default embedded mode: execution
follows whatever namespace the argument Fields already use.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .common import Field


@dataclasses.dataclass(frozen=True)
class Backend:
    name: str
    namespace: str  # "numpy" | "jax"
    jit: bool = False
    #: "pallas": lower eligible field operators to fused cartesian Pallas
    #: kernels (pallas_bridge.py); ineligible ones fall back to jit-staged
    #: embedded execution transparently
    compiled: str = ""

    def convert(self, value):
        """Move a Field's storage into this backend's namespace."""
        if not isinstance(value, Field):
            return value
        if self.namespace == "numpy":
            data = value.data
            if not isinstance(data, np.ndarray):
                data = np.asarray(data)
            return Field(value.domain, data)
        import jax.numpy as jnp

        return Field(value.domain, jnp.asarray(value.data))

    def __str__(self):
        return self.name


#: independent oracle semantics (reference: runners/roundtrip.py:45-237)
numpy_oracle = Backend("numpy_oracle", "numpy")
#: eager device execution (debugging)
jax_eager = Backend("jax_eager", "jax")
#: staged + compiled (reference: runners/gtfn.py run_gtfn/run_gtfn_gpu)
jax_jit = Backend("jax_jit", "jax", jit=True)

#: compiled kernels (reference: the dace/gtfn compiled runners): eligible
#: cartesian field operators lower to fused Pallas tile kernels; the rest
#: run jit-staged (see next/pallas_bridge.py)
pallas = Backend("pallas_cartesian", "jax", jit=True, compiled="pallas")

#: reference-name aliases so ported code keeps working
roundtrip = numpy_oracle
gtfn_cpu = jax_jit
gtfn_gpu = jax_jit
run_gtfn = jax_jit
run_gtfn_gpu = jax_jit

_BY_NAME = {
    "numpy": numpy_oracle,
    "numpy_oracle": numpy_oracle,
    "roundtrip": numpy_oracle,
    "jax": jax_eager,
    "jax_eager": jax_eager,
    "jax_jit": jax_jit,
    "gtfn_cpu": jax_jit,
    "gtfn_gpu": jax_jit,
    "pallas": pallas,
    "pallas_cartesian": pallas,
}


def resolve(backend) -> "Backend | None":
    """None, a Backend, or a name string -> Backend (or None = embedded)."""
    if backend is None or isinstance(backend, Backend):
        return backend
    if isinstance(backend, str):
        try:
            return _BY_NAME[backend]
        except KeyError:
            raise ValueError(
                f"unknown backend '{backend}' "
                f"(available: {sorted(_BY_NAME)})"
            ) from None
    raise TypeError(f"not a backend: {backend!r}")
