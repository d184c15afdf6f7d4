"""Program inspection: the tracing-era analog of the ITIR pretty printer.

Reference behavior being reproduced: next/iterator/pretty_printer.py /
pretty_parser.py give a textual view of the lowered iterator IR.  Here the
"lowered program" IS the jaxpr XLA compiles, so inspection formats exactly
that, plus the field-level signature (domains, dtypes) the trace was made
with -- strictly more faithful to what executes than a separate IR dump.

Usage::

    from gt4py_tpu.next import inspection

    print(inspection.describe(my_field_operator, f1, f2))
    print(inspection.format_field(f1))
"""

from __future__ import annotations

from typing import Any

from gt4py_tpu.next.common import Field


def format_field(f: Field) -> str:
    """One-line signature of a field: dims, ranges, dtype."""
    dims = ", ".join(
        f"{d.value}[{r.start}:{r.stop}]" for d, r in zip(f.domain.dims, f.domain.ranges)
    )
    return f"Field<{dims}; {f.dtype}>"


def describe(op: Any, *example_args, **example_kwargs) -> str:
    """Trace ``op`` (a field_operator / scan_operator / plain callable)
    against example arguments and return a readable report: the argument
    signature and the jaxpr the trace produces."""
    import jax

    fn = getattr(op, "definition", op)
    name = getattr(op, "__name__", getattr(fn, "__name__", "<program>"))

    lines = [f"program {name}:"]
    for i, a in enumerate(example_args):
        sig = format_field(a) if isinstance(a, Field) else repr(
            jax.eval_shape(lambda x=a: x)
        )
        lines.append(f"  arg{i}: {sig}")
    for k, a in example_kwargs.items():
        sig = format_field(a) if isinstance(a, Field) else repr(a)
        lines.append(f"  {k}: {sig}")

    closed = jax.make_jaxpr(
        lambda *args, **kwargs: op(*args, **kwargs)
    )(*example_args, **example_kwargs)
    lines.append("")
    lines.append(str(closed))
    return "\n".join(lines)
