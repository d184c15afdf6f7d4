"""Pallas (Mosaic TPU) backend: whole-stencil fused tile kernels.

The entire stencil -- every vertical loop, including serial-K tridiagonal
sweeps -- fuses into ONE Pallas kernel executed over a grid of (I, J) tiles:

- each tile DMAs the halo-extended K-column block of every field from HBM
  into VMEM (per-field halo width from extent analysis, expanded so the
  DMA start indices land on the (8, 128) tiling -- Mosaic requires aligned
  memref slices),
- the shared IR tracer runs *inside the kernel* in mutable-ref mode on the
  VMEM tiles (fori_loop for serial K), so temporaries never touch HBM --
  the TPU equivalent of the reference's stage fusion + IJ/K software
  caches (gtc/passes/oir_optimizations/{horizontal_execution_merging,
  caches}.py),
- written fields write their interior through an aligned staging scratch
  into fresh (K, dI, dJ) output buffers; the wrapper then splices those
  interiors back into the halo-carrying buffers (XLA fuses this with
  consumers).

Inputs/outputs use the executor's physical K-leading (K, I, J) layout;
J rides the TPU lane dimension.  Stencils the kernel path cannot express
(variable-K offsets, data dimensions, non-tileable domains) fall back to
the XLA executor transparently.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from gt4py_tpu.cartesian import ir
from gt4py_tpu.cartesian.backend import register
from gt4py_tpu.cartesian.backend.jax_backend import (
    JaxBackend,
    JaxTracer,
    _FieldMeta,
)


class _PallasIneligible(Exception):
    pass


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom below ~16MB/core
_SUBLANE = 8
_LANE = 128


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


@register("pallas")
class PallasBackend(JaxBackend):
    """Fused-tile Mosaic kernels with XLA fallback."""

    storage_device = "tpu"

    def _trace_env(self, metas, env, scalars, domain):
        try:
            return self._pallas_trace(metas, env, scalars, tuple(domain))
        except _PallasIneligible:
            return super()._trace_env(metas, env, scalars, domain)

    # ------------------------------------------------------------------ #

    def _check_eligible(self, metas) -> None:
        for node in ir.walk_values(self.analysis.stencil.vertical_loops):
            if isinstance(node, ir.FieldAccess):
                if not isinstance(node.offset, ir.CartesianOffset):
                    raise _PallasIneligible()  # variable/absolute K: XLA path
                if node.data_index:
                    raise _PallasIneligible()
        for m in metas.values():
            if m.data_ndim:
                raise _PallasIneligible()

    def _tile_plan(self, metas, domain, aligned: bool):
        """Pick (TI, TJ): tile sizes dividing the domain, fitting VMEM.

        On real TPUs (aligned mode) TI must be a multiple of the sublane
        tiling (8) and TJ of the lane tiling (128) so DMA starts align.
        """
        dI, dJ, dK = domain
        ext = self.analysis.extents

        halos: Dict[str, Tuple[int, int, int, int]] = {}
        for name, m in metas.items():
            e = ext.field_extent(name)
            hi0, hi1 = -e.i[0], e.i[1]
            hj0, hj1 = -e.j[0], e.j[1]
            if aligned:
                oi, oj, _ = m.origin
                # expand the lower halo so (origin - halo) is tile-aligned,
                # and the upper halo so the slice SIZE is a tiling multiple
                hi0 += (oi - hi0) % _SUBLANE
                hj0 += (oj - hj0) % _LANE
                if m.shape[0] != 1:
                    hi1 += (-(hi0 + hi1)) % _SUBLANE
                    # last tile must stay inside the (padded) buffer
                    if oi + dI + hi1 > m.shape[0]:
                        raise _PallasIneligible()
                if m.shape[1] != 1 and (hj0 or hj1):
                    hj1 += (-(hj0 + hj1)) % _LANE
                    if oj + dJ + hj1 > m.shape[1]:
                        raise _PallasIneligible()
            halos[name] = (hi0, hi1, hj0, hj1)

        temp_decls = self.analysis.stencil.temp_decls

        def vmem_bytes(ti, tj):
            total = 0
            for name, m in metas.items():
                hi0, hi1, hj0, hj1 = halos[name]
                sk = m.shape[2]
                total += sk * (ti + hi0 + hi1) * (tj + hj0 + hj1) * m.dtype.itemsize
                total += sk * ti * tj * m.dtype.itemsize  # staging scratch
            for name, decl in temp_decls.items():
                e = ext.alloc_extent(name)
                total += (
                    (dK - e.k[0] + e.k[1])
                    * (ti - e.i[0] + e.i[1])
                    * (tj - e.j[0] + e.j[1])
                    * np.dtype(decl.dtype).itemsize
                )
            return total

        if aligned:
            tj_options = [t for t in (256, 128) if dJ % t == 0]
            ti_options = [
                t
                for t in sorted(_divisors(dI), reverse=True)
                if t % _SUBLANE == 0 and t <= 512
            ]
        else:
            tj_options = sorted(
                (d for d in _divisors(dJ) if d >= min(8, dJ)), reverse=True
            )
            ti_options = sorted(
                (d for d in _divisors(dI) if d >= min(8, dI)), reverse=True
            )

        for tj in tj_options:
            for ti in ti_options:
                if vmem_bytes(ti, tj) <= _VMEM_BUDGET:
                    return ti, tj, halos
        raise _PallasIneligible()

    # ------------------------------------------------------------------ #

    def _pallas_trace(self, metas, env, scalars, domain):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        self._check_eligible(metas)
        dI, dJ, dK = domain

        interpret = jax.devices()[0].platform != "tpu"
        if not interpret:
            # Mosaic has no 64-bit types; fall back to the XLA executor
            for m in metas.values():
                if m.dtype.itemsize > 4:
                    raise _PallasIneligible()
            for decl in self.analysis.stencil.temp_decls.values():
                if np.dtype(decl.dtype).itemsize > 4:
                    raise _PallasIneligible()
        TI, TJ, halos = self._tile_plan(metas, domain, aligned=not interpret)
        grid = (dI // TI, dJ // TJ)

        analysis = self.analysis
        field_names = sorted(env.keys())
        written = [n for n in self.written if n in env]
        scalar_names = sorted(
            n for n in analysis.parameter_info if scalars.get(n) is not None
        )

        # tile-sized logical metas; tile origin = (expanded) halo width
        tile_metas: Dict[str, _FieldMeta] = {}
        tile_shapes: Dict[str, Tuple[int, ...]] = {}
        for name in field_names:
            m = metas[name]
            hi0, hi1, hj0, hj1 = halos[name]
            ni = 1 if m.shape[0] == 1 else TI + hi0 + hi1
            nj = 1 if m.shape[1] == 1 else TJ + hj0 + hj1
            sk = m.shape[2]
            tile_metas[name] = _FieldMeta(
                shape=(ni, nj, sk),
                origin=(hi0 if ni > 1 else 0, hj0 if nj > 1 else 0, m.origin[2]),
                dtype=m.dtype,
                dimensions=m.dimensions,
                data_ndim=0,
            )
            tile_shapes[name] = (sk, ni, nj)

        n_scalars = len(scalar_names)
        n_fields = len(field_names)
        n_written = len(written)

        # temporaries live in their own VMEM scratch refs, tile-extended
        temp_names = sorted(analysis.stencil.temp_decls)
        ext = analysis.extents
        temp_tile_shapes = {}
        for name in temp_names:
            e = ext.alloc_extent(name)
            temp_tile_shapes[name] = (
                dK - e.k[0] + e.k[1],
                TI - e.i[0] + e.i[1],
                TJ - e.j[0] + e.j[1],
            )

        def kernel(*refs):
            scalar_refs = refs[:n_scalars]
            pos = n_scalars
            in_refs = refs[pos : pos + n_fields]
            pos += n_fields
            out_refs = refs[pos : pos + n_written]
            pos += n_written
            scratch_refs = refs[pos : pos + n_fields]
            pos += n_fields
            stage_refs = refs[pos : pos + n_written]
            pos += n_written
            temp_scratch = refs[pos : pos + len(temp_names)]
            sem = refs[-1]

            gi = pl.program_id(0) * TI
            gj = pl.program_id(1) * TJ

            def ds32(start, size):
                # Mosaic memref slices require 32-bit indices (x64 would
                # otherwise promote the index arithmetic to i64)
                return pl.ds(jnp.asarray(start, dtype=jnp.int32), size)

            # ---- load halo-extended tiles (HBM -> VMEM, aligned starts) --- #
            copies = []
            for idx, name in enumerate(field_names):
                m = metas[name]
                hi0, hi1, hj0, hj1 = halos[name]
                oi, oj, _ = m.origin
                sk, ni, nj = tile_shapes[name]
                src = in_refs[idx]
                if m.shape[0] == 1 and m.shape[1] == 1:
                    sl = src
                elif m.shape[0] == 1:
                    sl = src.at[:, :, ds32(oj + gj - hj0, nj)]
                elif m.shape[1] == 1:
                    sl = src.at[:, ds32(oi + gi - hi0, ni), :]
                else:
                    sl = src.at[:, ds32(oi + gi - hi0, ni), ds32(oj + gj - hj0, nj)]
                cp = pltpu.make_async_copy(sl, scratch_refs[idx], sem.at[jnp.int32(idx)])
                cp.start()
                copies.append(cp)
            for cp in copies:
                cp.wait()

            # ---- run the stencil IR on the VMEM tiles (mutable refs) ---- #
            tile_env = {
                name: scratch_refs[idx] for idx, name in enumerate(field_names)
            }
            tile_scalars = {
                name: scalar_refs[i][0, 0] for i, name in enumerate(scalar_names)
            }

            tracer = JaxTracer(analysis, dict(tile_metas), (TI, TJ, dK))
            tracer.no_scan = True  # serial K is an in-VMEM fori_loop here
            tracer.ref_env = True
            tracer.temp_refs = {
                name: temp_scratch[i] for i, name in enumerate(temp_names)
            }
            tracer.axis_offset = (gi, gj)
            tracer.global_domain = (dI, dJ, dK)
            tracer.trace(tile_env, tile_scalars)

            # ---- stage interiors (value slice) and DMA to fresh outputs --- #
            stores = []
            for w_idx, name in enumerate(written):
                idx = field_names.index(name)
                hi0, hi1, hj0, hj1 = halos[name]
                sk, ni, nj = tile_shapes[name]
                full = scratch_refs[idx][...]
                interior = full[
                    :,
                    slice(hi0, hi0 + TI) if ni > 1 else slice(None),
                    slice(hj0, hj0 + TJ) if nj > 1 else slice(None),
                ]
                stage_refs[w_idx][...] = interior
                m = metas[name]
                if m.shape[0] == 1 and m.shape[1] == 1:
                    dst = out_refs[w_idx]
                elif m.shape[0] == 1:
                    dst = out_refs[w_idx].at[:, :, ds32(gj, TJ)]
                elif m.shape[1] == 1:
                    dst = out_refs[w_idx].at[:, ds32(gi, TI), :]
                else:
                    dst = out_refs[w_idx].at[:, ds32(gi, TI), ds32(gj, TJ)]
                cp = pltpu.make_async_copy(
                    stage_refs[w_idx], dst, sem.at[jnp.int32(idx)]
                )
                cp.start()
                stores.append(cp)
            for cp in stores:
                cp.wait()

        # ---- pallas_call plumbing ---- #
        scalar_ops = [jnp.asarray(scalars[n]).reshape(1, 1) for n in scalar_names]
        field_ops = [env[n] for n in field_names]

        def out_struct(name):
            m = metas[name]
            sk = m.shape[2]
            oi_dim = 1 if m.shape[0] == 1 else dI
            oj_dim = 1 if m.shape[1] == 1 else dJ
            return jax.ShapeDtypeStruct((sk, oi_dim, oj_dim), m.dtype)

        def stage_shape(name):
            m = metas[name]
            sk = m.shape[2]
            return (
                sk,
                1 if m.shape[0] == 1 else TI,
                1 if m.shape[1] == 1 else TJ,
            )

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in scalar_names] + [
            pl.BlockSpec(memory_space=pl.ANY) for _ in field_names
        ]
        out_specs = tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in written)
        out_shape = tuple(out_struct(n) for n in written)
        scratch_shapes = (
            [pltpu.VMEM(tile_shapes[n], metas[n].dtype) for n in field_names]
            + [pltpu.VMEM(stage_shape(n), metas[n].dtype) for n in written]
            + [
                pltpu.VMEM(temp_tile_shapes[n], analysis.stencil.temp_decls[n].dtype)
                for n in temp_names
            ]
            + [pltpu.SemaphoreType.DMA((n_fields,))]
        )

        result = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*scalar_ops, *field_ops)

        if not isinstance(result, (tuple, list)):
            result = (result,)

        # splice interiors back into the halo-carrying buffers
        new_env = dict(env)
        for w, r in zip(written, result):
            m = metas[w]
            buf = env[w]
            if r.shape == buf.shape:
                new_env[w] = r
            else:
                oi, oj, _ = m.origin
                ii = slice(oi, oi + dI) if m.shape[0] != 1 else slice(None)
                jj = slice(oj, oj + dJ) if m.shape[1] != 1 else slice(None)
                new_env[w] = buf.at[:, ii, jj].set(r)
        return new_env
