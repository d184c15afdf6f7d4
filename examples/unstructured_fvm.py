"""Finite-volume operators on an unstructured mesh: gradient and
divergence through call-time offset providers.

The mesh is a 3x3 quad patch exposed as vertex/edge connectivity tables
(gt4py_tpu.next.testing.SimpleMesh); boundary vertices have fewer than 4
incident edges (skip values), which the reductions mask automatically.
Reference analog: the gt4py.next workshop divergence/gradient exercises
(docs/user/next/workshop/exercises) -- re-written for this API.

Run:  python examples/unstructured_fvm.py         (add JAX_PLATFORMS=cpu
      to force CPU; everything here also runs on the numpy oracle)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import Dims, Field, FieldOffset, neighbor_sum
    from gt4py_tpu.next.testing import (
        E2VDim,
        Edge,
        SimpleMesh,
        V2EDim,
        Vertex,
    )

    mesh = SimpleMesh.make()
    # named offsets: the field carries `source`, the result `target`;
    # the actual neighbor tables arrive per call via offset_provider
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
    f64 = gtx.float64

    @gtx.field_operator
    def gradient(psi: Field[Dims[Vertex], f64]) -> Field[Dims[Edge], f64]:
        """Per-edge difference of the endpoint values (edge gradient
        times edge length in a real FVM): E2V[k] selects the k-th
        endpoint through the call-time provider table."""
        return psi(E2V[1]) - psi(E2V[0])

    @gtx.field_operator
    def divergence(
        flux: Field[Dims[Edge], f64],
        sign: Field[Dims[Vertex, V2EDim], f64],
    ) -> Field[Dims[Vertex], f64]:
        """Signed sum of incident edge fluxes; skipped neighbor slots of
        boundary vertices contribute nothing."""
        return neighbor_sum(flux(V2E) * sign, axis=V2EDim)

    provider = {"E2V": mesh.e2v, "V2E": mesh.v2e}

    # psi = x + 2y on the 3x3 vertex grid
    xv, yv = np.meshgrid(np.arange(3.0), np.arange(3.0), indexing="xy")
    psi_np = (xv + 2 * yv).ravel()
    psi = gtx.as_field((Vertex,), psi_np)

    grad = gradient(psi, offset_provider=provider)
    expected_grad = psi_np[mesh.e2v.table[:, 1]] - psi_np[mesh.e2v.table[:, 0]]
    np.testing.assert_allclose(grad.asnumpy(), expected_grad)
    print("edge gradient :", grad.asnumpy())

    # outward sign of each incident edge per vertex: +1 if the vertex is
    # the edge's first endpoint, -1 if second, 0 at skip slots
    t = mesh.v2e.table
    first = mesh.e2v.table[np.clip(t, 0, mesh.n_edges - 1), 0]
    sign_np = np.where(t == -1, 0.0, np.where(first == np.arange(9)[:, None], 1.0, -1.0))
    sign = gtx.as_field((Vertex, V2EDim), sign_np)

    div = divergence(grad, sign, offset_provider=provider)
    # oracle
    mask = t != -1
    fluxes = expected_grad[np.clip(t, 0, mesh.n_edges - 1)]
    expected_div = np.where(mask, fluxes * sign_np, 0.0).sum(axis=1)
    np.testing.assert_allclose(div.asnumpy(), expected_div)
    print("vertex divergence:", div.asnumpy())

    # the sum of divergences over a closed stencil telescopes: every
    # interior edge appears once with each sign
    assert abs(div.asnumpy().sum()) < 1e-12
    print("OK: gradient/divergence verified (skip values masked, "
          "sum(div) telescopes to 0)")

    # ---- multi-hop chains fold into ONE gather ---- #
    # v(E2V[0], V2E[1]) hops vertex -> edge (first endpoint) -> vertex
    # (second incident edge).  The two gathers compose into a single
    # composite connectivity at call time (exact, incl. clip semantics);
    # on quasi-structured meshes the composite refits affine and runs as
    # dense strided windows (docs/next_unstructured.md 3c).
    from gt4py_tpu.next.ffront import field_operator

    @field_operator
    def second_ring(v: Field[Dims[Vertex], f64]) -> Field[Dims[Vertex], f64]:
        return v(E2V[0], V2E[1])

    ring = second_ring(psi, offset_provider=provider)
    vv = psi.asnumpy()
    exp_ring = vv[mesh.e2v.table[:, 0]][np.clip(mesh.v2e.table[:, 1], 0, None)]
    np.testing.assert_allclose(ring.asnumpy(), exp_ring, rtol=1e-15)
    print("OK: two-hop chain == composed gather (bitwise)")


if __name__ == "__main__":
    main()
