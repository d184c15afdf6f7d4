"""3D Laplacian written in both frontends (the reference's flagship
example, examples/lap_cartesian_vs_next.ipynb, as a runnable script).

Run: python examples/laplacian_cartesian_vs_next.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# --------------------------- cartesian GTScript --------------------------- #
from gt4py_tpu import storage
from gt4py_tpu.cartesian import gtscript
from gt4py_tpu.cartesian.gtscript import PARALLEL, computation, interval

Field3D = gtscript.Field[np.float64]


@gtscript.stencil(backend="jax")
def lap_cartesian(inp: Field3D, out: Field3D):
    with computation(PARALLEL), interval(...):
        out = -4.0 * inp + (
            inp[1, 0, 0] + inp[-1, 0, 0] + inp[0, 1, 0] + inp[0, -1, 0]
        )


# ----------------------------- next field-view ---------------------------- #
import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dimension, FieldOffset, field_operator

I = Dimension("I")
J = Dimension("J")
K = Dimension("K", kind=gtx.DimensionKind.VERTICAL)
Ioff = FieldOffset("Ioff", source=I, target=(I,))
Joff = FieldOffset("Joff", source=J, target=(J,))


@field_operator
def lap_next(inp):
    return -4.0 * inp + (inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1]))


def main():
    n = 128
    rng = np.random.default_rng(0)
    data = rng.random((n, n, n))

    inp = storage.from_array(data, backend="jax", aligned_index=(1, 1, 0))
    out = storage.zeros((n, n, n), backend="jax", aligned_index=(1, 1, 0))
    lap_cartesian(inp, out)
    cart = np.asarray(out)[1:-1, 1:-1, :]

    f = gtx.as_field((I, J, K), data)
    nxt = lap_next(f).asnumpy()

    np.testing.assert_allclose(cart, nxt, rtol=1e-12)
    print(f"cartesian and next agree on the {n}^3 Laplacian "
          f"(max |diff| = {np.abs(cart - nxt).max():.2e})")


if __name__ == "__main__":
    main()
