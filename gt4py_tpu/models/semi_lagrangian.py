"""Semi-Lagrangian transport: departure-point interpolation on TPU.

Departure points require data-dependent *horizontal* gathers, which the
Cartesian stencil DSL deliberately does not express (only K offsets may be
data-dependent); this model is therefore written directly against jax --
the TPU-native formulation is a per-level bilinear gather, vectorized over
K, with periodic index wrapping.  (Workload named by BASELINE.json; absent
from the reference repository.)
"""

from typing import Tuple

import numpy as np


def semi_lagrangian_step(q, u, v, dt: float, dx: float = 1.0, dy: float = 1.0):
    """One semi-Lagrangian advection step (first-order trajectories,
    bilinear interpolation, periodic domain).

    Arrays are physical K-leading ``(K, NI, NJ)`` (no halo needed --
    periodicity is handled by index wrapping).  Returns the advected q.
    """
    import jax.numpy as jnp

    nk, ni, nj = q.shape
    # arrival-grid index coordinates
    ii = jnp.arange(ni, dtype=q.dtype).reshape(1, ni, 1)
    jj = jnp.arange(nj, dtype=q.dtype).reshape(1, 1, nj)
    # departure points (in index space)
    xd = ii - u * (dt / dx)
    yd = jj - v * (dt / dy)

    i0 = jnp.floor(xd)
    j0 = jnp.floor(yd)
    wi = (xd - i0).astype(q.dtype)
    wj = (yd - j0).astype(q.dtype)
    i0 = i0.astype(jnp.int32) % ni
    j0 = j0.astype(jnp.int32) % nj
    i1 = (i0 + 1) % ni
    j1 = (j0 + 1) % nj

    kk = jnp.arange(nk, dtype=jnp.int32).reshape(nk, 1, 1)
    kk = jnp.broadcast_to(kk, (nk, ni, nj))

    def gather(iidx, jidx):
        return q[kk, jnp.broadcast_to(iidx, (nk, ni, nj)),
                 jnp.broadcast_to(jidx, (nk, ni, nj))]

    q00 = gather(i0, j0)
    q01 = gather(i0, j1)
    q10 = gather(i1, j0)
    q11 = gather(i1, j1)

    return (
        (1 - wi) * (1 - wj) * q00
        + (1 - wi) * wj * q01
        + wi * (1 - wj) * q10
        + wi * wj * q11
    )


def semi_lagrangian_step_numpy(q, u, v, dt: float, dx: float = 1.0, dy: float = 1.0):
    """NumPy oracle with identical semantics."""
    nk, ni, nj = q.shape
    ii = np.arange(ni, dtype=q.dtype).reshape(1, ni, 1)
    jj = np.arange(nj, dtype=q.dtype).reshape(1, 1, nj)
    xd = ii - u * (dt / dx)
    yd = jj - v * (dt / dy)
    i0 = np.floor(xd)
    j0 = np.floor(yd)
    wi = (xd - i0).astype(q.dtype)
    wj = (yd - j0).astype(q.dtype)
    i0 = i0.astype(np.int64) % ni
    j0 = j0.astype(np.int64) % nj
    i1 = (i0 + 1) % ni
    j1 = (j0 + 1) % nj
    kk = np.broadcast_to(np.arange(nk).reshape(nk, 1, 1), (nk, ni, nj))
    i0b = np.broadcast_to(i0, (nk, ni, nj))
    j0b = np.broadcast_to(j0, (nk, ni, nj))
    i1b = np.broadcast_to(i1, (nk, ni, nj))
    j1b = np.broadcast_to(j1, (nk, ni, nj))
    q00 = q[kk, i0b, j0b]
    q01 = q[kk, i0b, j1b]
    q10 = q[kk, i1b, j0b]
    q11 = q[kk, i1b, j1b]
    return (
        (1 - wi) * (1 - wj) * q00
        + (1 - wi) * wj * q01
        + wi * (1 - wj) * q10
        + wi * wj * q11
    )
