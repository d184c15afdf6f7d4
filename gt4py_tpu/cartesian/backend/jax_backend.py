"""JAX/XLA executor: the TPU product path.

The stencil IR is *traced* into an XLA program under ``jax.jit`` -- tracing
makes interpretation free at runtime and lets XLA fuse whole PARALLEL
sections into single kernels.  Sequential FORWARD/BACKWARD loops lower to
``lax.fori_loop`` over K with dynamic plane slices (a ``lax.scan``/Pallas
fast path exists in the pallas backend).

Semantics parity: identical statement ordering, explicit C-style dtype
promotion and the same clipping rules as the numpy oracle backend, so
float64 results are bit-comparable to the reference numerics.

Reference behavior being reproduced: the numpy backend's computation
semantics (src/gt4py/cartesian/gtc/numpy/npir_codegen.py) -- re-designed
as a traced functional program instead of generated source.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from gt4py_tpu import config
from gt4py_tpu.cartesian import ir
from gt4py_tpu.cartesian.analysis import (
    StencilAnalysis,
    default_float_dtype,
    default_int_dtype,
    promote_dtypes,
)
from gt4py_tpu.cartesian.backend import register
from gt4py_tpu.core.definitions import Extent


def _jax():
    config.ensure_jax_config()
    import jax

    return jax


@dataclass(frozen=True)
class _FieldMeta:
    """Static per-call metadata of one field buffer."""

    shape: Tuple[int, ...]  # full 3D+data shape (missing axes size 1)
    origin: Tuple[int, int, int]
    dtype: np.dtype
    dimensions: Tuple[bool, bool, bool]
    data_ndim: int


class _TraceCtx:
    """Context while tracing one statement unit."""

    def __init__(self, exe, ext: Extent, kslice=None, klevel=None):
        self.exe = exe
        self.ext = ext
        self.kslice = kslice  # (k0, k1) python ints, parallel sections
        self.klevel = klevel  # traced or python int, serial sections
        self.masks: List[Any] = []

    @property
    def ni(self):
        return self.exe.domain[0] - self.ext.i[0] + self.ext.i[1]

    @property
    def nj(self):
        return self.exe.domain[1] - self.ext.j[0] + self.ext.j[1]

    @property
    def nk(self):
        return 1 if self.klevel is not None else self.kslice[1] - self.kslice[0]

    def shape(self):
        return (self.ni, self.nj, self.nk)


_NATIVE_JNP: Dict[ir.NativeFunction, Callable] = {}


def _init_native_jnp():
    import jax
    import jax.numpy as jnp
    import jax.scipy.special as jsp

    def round_away_from_zero(x):
        half = jnp.asarray(0.5, dtype=x.dtype if x.dtype.kind == "f" else jnp.float64)
        return jnp.trunc(x + jnp.copysign(half, x))

    def gamma(x):
        # Gamma via gammaln for x>0; reflection formula
        # pi / (sin(pi x) * gamma(1-x)) for x<=0.
        pos = jnp.exp(jsp.gammaln(x))
        neg = jnp.pi / (jnp.sin(jnp.pi * x) * jnp.exp(jsp.gammaln(1.0 - x)))
        return jnp.where(x > 0, pos, neg)

    _NATIVE_JNP.update(
        {
            ir.NativeFunction.ABS: jnp.abs,
            ir.NativeFunction.MIN: jnp.minimum,
            ir.NativeFunction.MAX: jnp.maximum,
            ir.NativeFunction.MOD: jnp.mod,
            ir.NativeFunction.SIN: jnp.sin,
            ir.NativeFunction.COS: jnp.cos,
            ir.NativeFunction.TAN: jnp.tan,
            ir.NativeFunction.ARCSIN: jnp.arcsin,
            ir.NativeFunction.ARCCOS: jnp.arccos,
            ir.NativeFunction.ARCTAN: jnp.arctan,
            ir.NativeFunction.ARCTAN2: jnp.arctan2,
            ir.NativeFunction.SINH: jnp.sinh,
            ir.NativeFunction.COSH: jnp.cosh,
            ir.NativeFunction.TANH: jnp.tanh,
            ir.NativeFunction.ARCSINH: jnp.arcsinh,
            ir.NativeFunction.ARCCOSH: jnp.arccosh,
            ir.NativeFunction.ARCTANH: jnp.arctanh,
            ir.NativeFunction.SQRT: jnp.sqrt,
            ir.NativeFunction.EXP: jnp.exp,
            ir.NativeFunction.LOG: jnp.log,
            ir.NativeFunction.LOG10: jnp.log10,
            ir.NativeFunction.GAMMA: gamma,
            ir.NativeFunction.CBRT: jnp.cbrt,
            ir.NativeFunction.ISFINITE: jnp.isfinite,
            ir.NativeFunction.ISINF: jnp.isinf,
            ir.NativeFunction.ISNAN: jnp.isnan,
            ir.NativeFunction.FLOOR: jnp.floor,
            ir.NativeFunction.CEIL: jnp.ceil,
            ir.NativeFunction.TRUNC: jnp.trunc,
            ir.NativeFunction.ROUND: jnp.round,
            ir.NativeFunction.ROUND_AWAY_FROM_ZERO: round_away_from_zero,
            ir.NativeFunction.ERF: jsp.erf,
            ir.NativeFunction.ERFC: jsp.erfc,
            ir.NativeFunction.POW: jnp.power,
        }
    )


class JaxTracer:
    """Traces the stencil IR into jnp operations on an env of buffers."""

    def __init__(self, analysis: StencilAnalysis, meta: Dict[str, _FieldMeta], domain):
        if not _NATIVE_JNP:
            _init_native_jnp()
        self.analysis = analysis
        self.stencil = analysis.stencil
        self.meta = meta
        self.domain = domain

    # ------------------------------------------------------------------ #

    def trace(self, env: Dict[str, Any], scalars: Dict[str, Any]) -> Dict[str, Any]:
        """env: full 3D(+data) jnp buffers by name.  Returns updated env."""
        import jax.numpy as jnp

        self.scalars = scalars
        # allocate temporaries
        for name, decl in self.stencil.temp_decls.items():
            ext = self.analysis.extents.field_extent(name)
            shape = (
                self.domain[0] - ext.i[0] + ext.i[1],
                self.domain[1] - ext.j[0] + ext.j[1],
                self.domain[2],
            ) + tuple(decl.data_dims)
            env[name] = jnp.zeros(shape, dtype=decl.dtype)
            self.meta[name] = _FieldMeta(
                shape=shape,
                origin=(-ext.i[0], -ext.j[0], 0),
                dtype=np.dtype(decl.dtype),
                dimensions=(True, True, True),
                data_ndim=len(decl.data_dims),
            )

        for loop in self.stencil.vertical_loops:
            env = self._trace_loop(env, loop)
        return env

    def _trace_loop(self, env, loop: ir.VerticalLoop):
        import jax

        dK = self.domain[2]
        for section in loop.sections:
            k0, k1 = section.interval.resolve(dK)
            k0, k1 = max(k0, 0), min(k1, dK)
            if k1 <= k0:
                continue
            if loop.loop_order == ir.LoopOrder.PARALLEL:
                for stmt in section.body:
                    ctx = _TraceCtx(
                        self, self.analysis.extents.stmt_extent(stmt), kslice=(k0, k1)
                    )
                    env = self._trace_stmt(env, stmt, ctx)
            else:
                backward = loop.loop_order == ir.LoopOrder.BACKWARD
                n = k1 - k0

                def body(i, env, _k0=k0, _k1=k1, _bwd=backward, _section=section):
                    k = (_k1 - 1 - i) if _bwd else (_k0 + i)
                    for stmt in _section.body:
                        ctx = _TraceCtx(
                            self, self.analysis.extents.stmt_extent(stmt), klevel=k
                        )
                        env = self._trace_stmt(env, stmt, ctx)
                    return env

                if n == 1:
                    env = body(0, env)
                else:
                    env = jax.lax.fori_loop(0, n, body, env)
        return env

    # ------------------- statements ------------------- #

    def _trace_stmt(self, env, stmt: ir.Stmt, ctx: _TraceCtx):
        if isinstance(stmt, ir.Assign):
            return self._trace_assign(env, stmt, ctx)
        if isinstance(stmt, ir.If):
            return self._trace_if(env, stmt, ctx)
        if isinstance(stmt, ir.While):
            return self._trace_while(env, stmt, ctx)
        if isinstance(stmt, ir.HorizontalRestriction):
            return self._trace_horizontal(env, stmt, ctx)
        raise TypeError(f"Unknown statement {type(stmt).__name__}")

    def _trace_assign(self, env, stmt: ir.Assign, ctx: _TraceCtx):
        import jax.numpy as jnp

        value = self._eval(env, stmt.value, ctx)
        name = stmt.target.name
        meta = self.meta[name]
        rhs = jnp.asarray(value)
        if rhs.dtype != meta.dtype:
            rhs = rhs.astype(meta.dtype)

        old, write_back = self._read_region(env, stmt.target, ctx, for_write=True)
        rhs = jnp.broadcast_to(rhs, old.shape)
        if ctx.masks:
            mask = ctx.masks[0]
            for m in ctx.masks[1:]:
                mask = jnp.logical_and(mask, m)
            if mask.ndim and mask.ndim < old.ndim:
                mask = mask.reshape(mask.shape + (1,) * (old.ndim - mask.ndim))
            rhs = jnp.where(mask, rhs, old)
        env = dict(env)
        env[name] = write_back(env[name], rhs)
        return env

    def _trace_if(self, env, stmt: ir.If, ctx: _TraceCtx):
        import jax.numpy as jnp

        cond = self._eval(env, stmt.cond, ctx)
        cond = jnp.asarray(cond).astype(bool)
        ctx.masks.append(cond)
        for s in stmt.body:
            env = self._trace_stmt(env, s, ctx)
        ctx.masks.pop()
        if stmt.orelse:
            ctx.masks.append(jnp.logical_not(cond))
            for s in stmt.orelse:
                env = self._trace_stmt(env, s, ctx)
            ctx.masks.pop()
        return env

    def _trace_while(self, env, stmt: ir.While, ctx: _TraceCtx):
        import jax
        import jax.numpy as jnp

        mask0 = jnp.broadcast_to(
            jnp.asarray(self._eval(env, stmt.cond, ctx)).astype(bool), ctx.shape()
        )

        def cond_fn(carry):
            env_c, mask = carry
            return jnp.any(mask)

        def body_fn(carry):
            env_c, mask = carry
            ctx.masks.append(mask)
            for s in stmt.body:
                env_c = self._trace_stmt(env_c, s, ctx)
            ctx.masks.pop()
            new_mask = jnp.logical_and(
                mask,
                jnp.broadcast_to(
                    jnp.asarray(self._eval(env_c, stmt.cond, ctx)).astype(bool),
                    ctx.shape(),
                ),
            )
            return (env_c, new_mask)

        env, _ = jax.lax.while_loop(cond_fn, body_fn, (env, mask0))
        return env

    def _trace_horizontal(self, env, stmt: ir.HorizontalRestriction, ctx: _TraceCtx):
        import jax.numpy as jnp

        dI, dJ, _ = self.domain
        i_glob = jnp.arange(ctx.ext.i[0], dI + ctx.ext.i[1]).reshape(-1, 1, 1)
        j_glob = jnp.arange(ctx.ext.j[0], dJ + ctx.ext.j[1]).reshape(1, -1, 1)
        mask = jnp.zeros((ctx.ni, ctx.nj, 1), dtype=bool)
        for m in stmt.masks:
            ilo, ihi = m.i.resolve(dI)
            jlo, jhi = m.j.resolve(dJ)
            mask = mask | (
                (i_glob >= ilo) & (i_glob < ihi) & (j_glob >= jlo) & (j_glob < jhi)
            )
        mask = jnp.broadcast_to(mask, ctx.shape())
        ctx.masks.append(mask)
        for s in stmt.body:
            env = self._trace_stmt(env, s, ctx)
        ctx.masks.pop()
        return env

    # ------------------- region access ------------------- #

    def _region_spec(self, meta: _FieldMeta, off: ir.CartesianOffset, ctx: _TraceCtx):
        """Return (starts, sizes) of the accessed region in the full buffer.

        The K start may be a traced value in serial sections.
        """
        dI, dJ, _ = self.domain
        oi, oj, ok = meta.origin
        if meta.shape[0] == 1:
            i0, ni = 0, 1
        else:
            i0, ni = oi + ctx.ext.i[0] + off.i, ctx.ni
        if meta.shape[1] == 1:
            j0, nj = 0, 1
        else:
            j0, nj = oj + ctx.ext.j[0] + off.j, ctx.nj
        if meta.shape[2] == 1:
            k0, nk = 0, 1
        elif ctx.klevel is not None:
            k0, nk = ok + ctx.klevel + off.k, 1
        else:
            k0, nk = ok + ctx.kslice[0] + off.k, ctx.nk
        return (i0, j0, k0), (ni, nj, nk)

    def _read_region(self, env, acc: ir.FieldAccess, ctx: _TraceCtx, for_write=False):
        """Read the accessed region; if for_write, also return a writeback fn."""
        import jax
        import jax.numpy as jnp

        name = acc.name
        meta = self.meta[name]
        buf = env[name]
        off = acc.offset
        if not isinstance(off, ir.CartesianOffset):
            if for_write:
                raise NotImplementedError("Non-Cartesian write offsets")
            return self._read_nonuniform_k(env, acc, ctx), None

        (i0, j0, k0), (ni, nj, nk) = self._region_spec(meta, off, ctx)
        data_shape = meta.shape[3:]

        dyn_k = not isinstance(k0, int)
        if not dyn_k:
            idx = (slice(i0, i0 + ni), slice(j0, j0 + nj), slice(k0, k0 + nk))
            region = buf[idx]
        else:
            starts = (i0, j0, k0) + (0,) * len(data_shape)
            sizes = (ni, nj, nk) + data_shape
            region = jax.lax.dynamic_slice(buf, starts, sizes)

        didx = ()
        if acc.data_index:
            didx = tuple(self._data_index_value(env, d, ctx) for d in acc.data_index)
            region = region[(slice(None), slice(None), slice(None)) + didx]

        if not for_write:
            return region, None

        def write_back(buf, value):
            if acc.data_index:
                # write one component: read-modify-write the full region
                if not dyn_k:
                    full = buf[idx]
                else:
                    full = jax.lax.dynamic_slice(buf, starts, sizes)
                full = full.at[(slice(None), slice(None), slice(None)) + didx].set(value)
                value = full
            if not dyn_k:
                return buf.at[idx].set(value)
            return jax.lax.dynamic_update_slice(buf, value, starts)

        return region, write_back

    def _read_nonuniform_k(self, env, acc: ir.FieldAccess, ctx: _TraceCtx):
        import jax.numpy as jnp

        meta = self.meta[acc.name]
        buf = env[acc.name]
        off = acc.offset
        SK = meta.shape[2]
        ok = meta.origin[2]

        (i0, j0, _), (ni, nj, _) = self._region_spec(meta, ir.CartesianOffset(), ctx)
        block = buf[slice(i0, i0 + ni), slice(j0, j0 + nj), :]

        if isinstance(off, ir.VariableKOffset):
            dk = jnp.asarray(self._eval(env, off.k, ctx)).astype(jnp.int32)
            if ctx.klevel is not None:
                base = jnp.asarray(ok + ctx.klevel, dtype=jnp.int32)
            else:
                kk0, kk1 = ctx.kslice
                base = (ok + jnp.arange(kk0, kk1, dtype=jnp.int32)).reshape(1, 1, -1)
            kidx = jnp.clip(base + dk, 0, SK - 1)
        else:  # AbsoluteKIndex
            kval = jnp.asarray(self._eval(env, off.k, ctx)).astype(jnp.int32)
            kidx = jnp.clip(kval + ok, 0, SK - 1)
            if kidx.ndim == 0:
                kidx = kidx.reshape(1, 1, 1)

        kidx = jnp.asarray(kidx)
        if kidx.ndim == 0:
            kidx = kidx.reshape(1, 1, 1)
        kidx = jnp.broadcast_to(kidx, (ni, nj, ctx.nk))
        out = jnp.take_along_axis(block, kidx, axis=2)

        if acc.data_index:
            didx = tuple(self._data_index_value(env, d, ctx) for d in acc.data_index)
            out = out[(slice(None), slice(None), slice(None)) + didx]
        return out

    def _data_index_value(self, env, expr: ir.Expr, ctx: _TraceCtx):
        from gt4py_tpu.cartesian.analysis import try_static_int

        v = try_static_int(expr)
        if v is None:
            raise NotImplementedError("Non-static data-dimension indices")
        return v

    # ------------------- expressions ------------------- #

    def _eval(self, env, expr: ir.Expr, ctx: _TraceCtx):
        import jax.numpy as jnp

        if isinstance(expr, ir.Literal):
            if expr.dtype is not None:
                return jnp.asarray(expr.value, dtype=expr.dtype)
            if isinstance(expr.value, bool):
                return jnp.asarray(expr.value, dtype=bool)
            if isinstance(expr.value, int):
                return jnp.asarray(expr.value, dtype=default_int_dtype())
            return jnp.asarray(expr.value, dtype=default_float_dtype())

        if isinstance(expr, ir.ScalarAccess):
            decl = self.stencil.scalar_decls[expr.name]
            return jnp.asarray(self.scalars[expr.name], dtype=decl.dtype)

        if isinstance(expr, ir.FieldAccess):
            region, _ = self._read_region(env, expr, ctx)
            return region

        if isinstance(expr, ir.AxisPosition):
            dI, dJ, _ = self.domain
            dt = default_int_dtype()
            if expr.axis == "I":
                return jnp.arange(ctx.ext.i[0], dI + ctx.ext.i[1], dtype=dt).reshape(-1, 1, 1)
            if expr.axis == "J":
                return jnp.arange(ctx.ext.j[0], dJ + ctx.ext.j[1], dtype=dt).reshape(1, -1, 1)
            if ctx.klevel is not None:
                return jnp.asarray(ctx.klevel, dtype=dt)
            return jnp.arange(ctx.kslice[0], ctx.kslice[1], dtype=dt).reshape(1, 1, -1)

        if isinstance(expr, ir.AxisSize):
            return jnp.asarray(
                {"I": self.domain[0], "J": self.domain[1], "K": self.domain[2]}[expr.axis],
                dtype=default_int_dtype(),
            )

        if isinstance(expr, ir.Cast):
            return jnp.asarray(self._eval(env, expr.expr, ctx)).astype(expr.dtype)

        if isinstance(expr, ir.UnaryOp):
            v = self._eval(env, expr.expr, ctx)
            if expr.op == ir.UnaryOperator.NOT:
                return jnp.logical_not(v)
            if expr.op == ir.UnaryOperator.NEG:
                return jnp.negative(v)
            return v

        if isinstance(expr, ir.BinaryOp):
            left = jnp.asarray(self._eval(env, expr.left, ctx))
            right = jnp.asarray(self._eval(env, expr.right, ctx))
            if expr.op == ir.BinaryOperator.AND:
                return jnp.logical_and(left, right)
            if expr.op == ir.BinaryOperator.OR:
                return jnp.logical_or(left, right)
            target = promote_dtypes(np.dtype(left.dtype), np.dtype(right.dtype))
            if left.dtype != target:
                left = left.astype(target)
            if right.dtype != target:
                right = right.astype(target)
            return _apply_binop_jnp(expr.op, left, right)

        if isinstance(expr, ir.TernaryOp):
            cond = jnp.asarray(self._eval(env, expr.cond, ctx))
            t = jnp.asarray(self._eval(env, expr.true_expr, ctx))
            f = jnp.asarray(self._eval(env, expr.false_expr, ctx))
            target = promote_dtypes(np.dtype(t.dtype), np.dtype(f.dtype))
            return jnp.where(cond, t.astype(target), f.astype(target))

        if isinstance(expr, ir.NativeFuncCall):
            args = [jnp.asarray(self._eval(env, a, ctx)) for a in expr.args]
            if len(args) > 1:
                target = promote_dtypes(*[np.dtype(a.dtype) for a in args])
                args = [a.astype(target) if a.dtype != target else a for a in args]
            return _NATIVE_JNP[expr.func](*args)

        raise TypeError(f"Cannot trace {type(expr).__name__}")


def _apply_binop_jnp(op: ir.BinaryOperator, left, right):
    import jax.numpy as jnp

    table = {
        ir.BinaryOperator.ADD: jnp.add,
        ir.BinaryOperator.SUB: jnp.subtract,
        ir.BinaryOperator.MUL: jnp.multiply,
        ir.BinaryOperator.DIV: jnp.true_divide,
        ir.BinaryOperator.FLOOR_DIV: jnp.floor_divide,
        ir.BinaryOperator.MOD: jnp.mod,
        ir.BinaryOperator.POW: jnp.power,
        ir.BinaryOperator.EQ: jnp.equal,
        ir.BinaryOperator.NE: jnp.not_equal,
        ir.BinaryOperator.LT: jnp.less,
        ir.BinaryOperator.LE: jnp.less_equal,
        ir.BinaryOperator.GT: jnp.greater,
        ir.BinaryOperator.GE: jnp.greater_equal,
        ir.BinaryOperator.BIT_AND: jnp.bitwise_and,
        ir.BinaryOperator.BIT_OR: jnp.bitwise_or,
        ir.BinaryOperator.BIT_XOR: jnp.bitwise_xor,
    }
    return table[op](left, right)


@register("jax")
class JaxBackend:
    """Traced XLA executor.  Returns updated arrays for written fields."""

    storage_device = "tpu"

    def __init__(self, analysis: StencilAnalysis, options: Optional[dict] = None):
        self.analysis = analysis
        self.options = options or {}
        self._programs: Dict[Any, Callable] = {}
        self.written = [
            name
            for name, info in analysis.field_info.items()
            if info.access.value & 2  # WRITE
        ]

    # ------------------------------------------------------------------ #

    def _program_key(self, metas: Dict[str, _FieldMeta], domain, scalar_dtypes):
        return (
            tuple(sorted((n, m.shape, m.origin, str(m.dtype)) for n, m in metas.items())),
            tuple(domain),
            tuple(sorted((n, str(d)) for n, d in scalar_dtypes.items())),
        )

    def _build_program(self, metas: Dict[str, _FieldMeta], domain):
        jax = _jax()

        analysis = self.analysis
        written = [n for n in self.written if n in metas]

        def program(written_arrays, read_arrays, scalars):
            tracer = JaxTracer(analysis, dict(metas), domain)
            env = {**read_arrays, **written_arrays}
            env = tracer.trace(env, scalars)
            return {n: env[n] for n in written}

        donate = (0,) if config.DONATE_BUFFERS else ()
        return jax.jit(program, donate_argnums=donate)

    def run(self, arrays, scalars, domain, origins, exec_info=None):
        jax = _jax()
        import jax.numpy as jnp

        metas: Dict[str, _FieldMeta] = {}
        full_bufs: Dict[str, Any] = {}
        for name, arr in arrays.items():
            decl = self.analysis.stencil.field_decls[name]
            data_ndim = len(decl.data_dims)
            buf = jnp.asarray(arr)
            # reshape to full 3D(+data): missing axes become size-1
            shape = list(buf.shape)
            spatial = len(shape) - data_ndim
            full_shape: List[int] = []
            full_origin: List[int] = []
            it = iter(range(spatial))
            for present in decl.dimensions:
                if present:
                    ax = next(it)
                    full_shape.append(shape[ax])
                    full_origin.append(origins[name][ax] if ax < len(origins[name]) else 0)
                else:
                    full_shape.append(1)
                    full_origin.append(0)
            full_shape.extend(shape[spatial:])
            buf = buf.reshape(full_shape)
            full_bufs[name] = buf
            metas[name] = _FieldMeta(
                shape=tuple(full_shape),
                origin=tuple(full_origin),
                dtype=np.dtype(decl.dtype),
                dimensions=decl.dimensions,
                data_ndim=data_ndim,
            )

        scalar_vals = {
            name: scalars[name]
            for name in self.analysis.parameter_info
            if scalars.get(name) is not None
        }
        key = self._program_key(
            metas, domain, {n: np.asarray(v).dtype for n, v in scalar_vals.items()}
        )
        if key not in self._programs:
            self._programs[key] = self._build_program(metas, domain)
        program = self._programs[key]

        if exec_info is not None:
            exec_info["run_start_time"] = time.perf_counter()

        written_in = {n: full_bufs[n] for n in self.written if n in full_bufs}
        read_in = {n: b for n, b in full_bufs.items() if n not in written_in}
        out = program(written_in, read_in, scalar_vals)

        if exec_info is not None:
            jax.block_until_ready(out)
            exec_info["run_end_time"] = time.perf_counter()

        # reshape back to user shapes
        result = {}
        for name, buf in out.items():
            decl = self.analysis.stencil.field_decls[name]
            user_shape = arrays[name].shape
            result[name] = buf.reshape(user_shape)
        return result
