"""Explicit halo exchange with XLA collectives inside ``shard_map``.

Each shard holds a local block extended by halo rows/columns; neighbors
swap edge strips via ``lax.ppermute`` over the mesh axes (periodic
boundaries).  Corners are handled by exchanging I first (including the
J-halo rows), then J -- the standard two-phase scheme that makes corner
values travel two hops.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from gt4py_tpu import config


def halo_exchange(local, halo: Tuple[int, int], axes=("x", "y"), spatial_axes=(0, 1)):
    """Swap halos of a local block with mesh neighbors.

    ``spatial_axes`` selects the (I, J) array axes -- (0, 1) for logical
    (I, J, K) blocks, (1, 2) for the executor's physical K-leading layout.
    The I/J extents include the halo (ni + 2*hi etc.); halo strips are
    filled from the periodic neighbors.  Must run inside ``shard_map`` over
    a mesh with the given axes.
    """
    import jax
    from jax import lax

    hi, hj = halo

    def _exchange_axis(block, h, mesh_axis, array_axis):
        if h == 0:
            return block
        n = lax.axis_size(mesh_axis)
        if n == 1:
            # self-periodic: wrap our own edges
            import jax.numpy as jnp

            interior = _slice_axis(block, array_axis, h, -h)
            lo_strip = _slice_axis(interior, array_axis, 0, h)
            hi_strip = _slice_axis(interior, array_axis, -h, None)
            block = _set_axis(block, array_axis, slice(0, h), hi_strip)
            block = _set_axis(block, array_axis, _end_slice(block, array_axis, h), lo_strip)
            return block
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        # my interior high edge -> right neighbor's low halo
        hi_edge = _slice_axis(block, array_axis, -2 * h, -h)
        lo_halo = lax.ppermute(hi_edge, mesh_axis, fwd)
        # my interior low edge -> left neighbor's high halo
        lo_edge = _slice_axis(block, array_axis, h, 2 * h)
        hi_halo = lax.ppermute(lo_edge, mesh_axis, bwd)
        block = _set_axis(block, array_axis, slice(0, h), lo_halo)
        block = _set_axis(block, array_axis, _end_slice(block, array_axis, h), hi_halo)
        return block

    local = _exchange_axis(local, hi, axes[0], spatial_axes[0])
    local = _exchange_axis(local, hj, axes[1], spatial_axes[1])
    return local


def _slice_axis(arr, axis, start, stop):
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(start, stop)
    return arr[tuple(idx)]


def _end_slice(arr, axis, h):
    size = arr.shape[axis]
    return slice(size - h, size)


def _set_axis(arr, axis, sl, value):
    idx = [slice(None)] * arr.ndim
    idx[axis] = sl
    return arr.at[tuple(idx)].set(value)


def shard_map_stencil(
    stencil_fn: Callable[..., Dict],
    cmesh,
    halo: Tuple[int, int],
    *,
    field_names,
    scalar_names=(),
    spatial_axes=(0, 1),
):
    """Wrap a local stencil function into a sharded step.

    Field arguments are plain *global* (NI, NJ, ...) arrays sharded with
    ``P("x", "y")``.  Inside ``shard_map`` each local block is padded by the
    halo, the pad is filled from the periodic neighbors via ``ppermute``,
    ``stencil_fn(**halo_extended_locals, **scalars) -> dict(updated)`` runs
    (it sees blocks of shape (ni + 2*hi, nj + 2*hj, ...) and should compute
    with origin (hi, hj, 0) and domain (ni, nj, K)), and the interiors of
    the updated fields are returned re-assembled as sharded globals.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    field_names = tuple(field_names)
    scalar_names = tuple(scalar_names)
    hi, hj = halo
    ax_i, ax_j = spatial_axes

    def local_step(*args):
        fields = dict(zip(field_names, args[: len(field_names)]))
        scalars = dict(zip(scalar_names, args[len(field_names):]))
        padded = {}
        for name, arr in fields.items():
            pad_width = [(0, 0)] * arr.ndim
            pad_width[ax_i] = (hi, hi)
            pad_width[ax_j] = (hj, hj)
            p = jnp.pad(arr, pad_width)
            padded[name] = halo_exchange(p, halo, spatial_axes=spatial_axes)
        out = stencil_fn(**padded, **scalars)
        merged = dict(padded)
        merged.update(out)
        result = []
        for n in field_names:
            b = merged[n]
            idx = [slice(None)] * b.ndim
            idx[ax_i] = slice(hi, b.shape[ax_i] - hi)
            idx[ax_j] = slice(hj, b.shape[ax_j] - hj)
            result.append(b[tuple(idx)])
        return tuple(result)

    spec_entries = [None] * (max(spatial_axes) + 1)
    spec_entries[ax_i] = "x"
    spec_entries[ax_j] = "y"
    field_spec = P(*spec_entries)
    in_specs = tuple([field_spec] * len(field_names) + [P()] * len(scalar_names))
    out_specs = tuple([field_spec] * len(field_names))

    mapped = shard_map(
        local_step,
        mesh=cmesh.mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )

    def step(**kwargs):
        args = [kwargs[n] for n in field_names] + [kwargs[n] for n in scalar_names]
        result = mapped(*args)
        return dict(zip(field_names, result))

    return step
