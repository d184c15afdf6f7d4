"""Field-operator / scan-operator / program decorators.

Reference: src/gt4py/next/ffront/decorator.py (field_operator :730,
scan_operator :784-871, Program :223) and the embedded execution semantics
in src/gt4py/next/embedded/operators.py:27-90 (the ScanOperator column
loop is the executable spec the lax.scan lowering reproduces).

Execution is embedded-on-jax: calling an operator runs jnp operations
eagerly (or traced, under an outer ``jax.jit``).  ``op(..., out=field)``
writes the result into ``out``'s buffer over the intersected (or given)
domain, mirroring program semantics.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .common import Dimension, Domain, Field, UnitRange, _expand


def _write_out(result: Field, out: Field, domain: Optional[Domain]) -> None:
    """Store ``result`` into ``out`` over ``domain`` (functional update on
    the holder, like the cartesian FieldStorage)."""
    target = domain or Domain(
        result.dims,
        tuple(
            result.domain[d].intersect(out.domain[d]) for d in result.dims
        ),
    )
    for d, r in target:
        rr = result.domain[d]
        orr = out.domain[d]
        if r.start < rr.start or r.stop > rr.stop:
            raise ValueError(
                f"out= domain {d.value}[{r.start}:{r.stop}] exceeds the "
                f"result's domain [{rr.start}:{rr.stop}]"
            )
        if r.start < orr.start or r.stop > orr.stop:
            raise ValueError(
                f"out= domain {d.value}[{r.start}:{r.stop}] exceeds the "
                f"output field's domain [{orr.start}:{orr.stop}]"
            )
    val = _expand(result, target)
    idx = []
    for d, r in target:
        own = out.domain[d]
        lo = r.start - own.start
        idx.append(slice(lo, lo + len(r)))
    shape = tuple(len(r) for _, r in target)
    if isinstance(out.data, np.ndarray):  # embedded numpy oracle: in-place
        out.data[tuple(idx)] = np.broadcast_to(val, shape).astype(out.dtype)
    else:
        out.data = out.data.at[tuple(idx)].set(
            jnp.broadcast_to(val, shape).astype(out.dtype)
        )


class FieldOperator:
    """Callable wrapper (reference: decorator.FieldOperator :558)."""

    def __init__(self, definition: Callable, name: Optional[str] = None):
        self.definition = definition
        self.__name__ = name or definition.__name__

    def __call__(self, *args, out: Optional[Field] = None,
                 domain: Optional[Domain] = None, offset_provider=None, **kwargs):
        result = self.definition(*args, **kwargs)
        if out is None:
            return result
        if isinstance(result, tuple):
            for r, o in zip(result, out):
                _write_out(r, o, domain)
        else:
            _write_out(result, out, domain)
        return None

    def with_backend(self, backend):  # API parity; embedded-on-jax only
        return self


def field_operator(fn=None, **kwargs):
    if fn is None:
        return lambda f: FieldOperator(f, **kwargs)
    return FieldOperator(fn, **kwargs)


class ScanOperator:
    """Column scan (reference: decorator.scan_operator :784-871).

    ``definition(carry, *args) -> carry`` runs over the ``axis`` dimension
    level by level; the stacked carries form the result -- lowered to
    ``lax.scan`` over the scan axis (reference executable spec:
    embedded/operators.py:40-90).
    """

    def __init__(self, definition: Callable, *, axis: Dimension,
                 forward: bool = True, init=0.0):
        self.definition = definition
        self.axis = axis
        self.forward = forward
        self.init = init
        self.__name__ = definition.__name__

    def __call__(self, *args, out: Optional[Field] = None,
                 domain: Optional[Domain] = None, offset_provider=None):
        fields = [a for a in args if isinstance(a, Field)]
        if not fields:
            raise TypeError("scan_operator needs at least one Field argument")
        from .builtins import _merge_domains

        dom = _merge_domains(*fields)
        if self.axis not in dom.dims:
            raise ValueError(f"No argument spans the scan axis {self.axis}")
        ax = dom.dims.index(self.axis)

        oracle = all(isinstance(f.data, np.ndarray) for f in fields)
        xp = np if oracle else jnp

        # broadcast all field args onto dom and move the scan axis first
        xs = []
        for a in args:
            if isinstance(a, Field):
                data = xp.broadcast_to(_expand(a, dom), dom.shape)
                xs.append(xp.moveaxis(data, ax, 0))
            else:
                xs.append(None)

        n = dom.shape[ax]
        plane_shape = dom.shape[:ax] + dom.shape[ax + 1 :]
        init = jax.tree_util.tree_map(
            lambda v: xp.broadcast_to(xp.asarray(v), plane_shape), self.init
        )

        statics = [a for a in args if not isinstance(a, Field)]

        def step(carry, x_planes):
            it = iter(x_planes)
            st = iter(statics)
            call_args = [
                next(it) if isinstance(a, Field) else next(st) for a in args
            ]
            new = self.definition(carry, *call_args)
            return new, new

        xs_stacked = tuple(x for x in xs if x is not None)
        if oracle:
            # embedded numpy oracle: the explicit level-by-level loop is the
            # reference's executable spec (embedded/operators.py:69-80)
            order = range(n) if self.forward else range(n - 1, -1, -1)
            carry = init
            ys_list = [None] * n
            for k in order:
                carry, y = step(carry, tuple(x[k] for x in xs_stacked))
                ys_list[k] = y
            ys = jax.tree_util.tree_map(
                lambda *planes: np.stack(planes, axis=0), *ys_list
            )
        else:
            _, ys = jax.lax.scan(step, init, xs_stacked, reverse=not self.forward)

        def to_field(stack):
            data = xp.moveaxis(stack, 0, ax)
            return Field(dom, data)

        result = jax.tree_util.tree_map(to_field, ys)
        if out is None:
            return result
        if isinstance(result, tuple):
            for r, o in zip(result, out):
                _write_out(r, o, domain)
        else:
            _write_out(result, out, domain)
        return None


def scan_operator(fn=None, *, axis: Dimension, forward: bool = True, init=0.0):
    if fn is None:
        return lambda f: ScanOperator(f, axis=axis, forward=forward, init=init)
    return ScanOperator(fn, axis=axis, forward=forward, init=init)


class Program:
    """A sequence of operator calls with out= arguments
    (reference: decorator.Program :223)."""

    def __init__(self, definition: Callable):
        self.definition = definition
        self.__name__ = definition.__name__

    def __call__(self, *args, offset_provider=None, **kwargs):
        return self.definition(*args, **kwargs)

    def with_backend(self, backend):
        return self


def program(fn=None, **kwargs):
    if fn is None:
        return lambda f: Program(f)
    return Program(fn)
