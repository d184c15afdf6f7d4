"""Random field-operator generator for differential next-DSL testing.

Counterpart of ``program_gen`` for the field-view DSL: generates random
*valid* operator source in the restricted-Python subset, parses it
through the real frontend (type deduction + validation), and runs it on
numpy-backed and jax-backed Fields.  Both execute the same typed-IR
interpreter (next/interpreter.py), so divergence localizes to the array
namespaces -- broadcasting, dtype promotion, where/maximum/minimum,
reductions with skip values, domain-intersection slicing.
"""

from __future__ import annotations

import random
import textwrap
from typing import Dict, List

import numpy as np


class OperatorGenerator:
    """Builds one random field-operator source string + its closure."""

    def __init__(self, rng: random.Random, with_unstructured: bool = False,
                 with_collection: bool = False, with_provider: bool = False):
        self.rng = rng
        self.with_unstructured = with_unstructured
        self.with_collection = with_collection
        # provider leg: V2E is a named FieldOffset resolved through the
        # call-time offset_provider instead of a closure Connectivity
        self.with_provider = with_provider
        self.lines: List[str] = []
        self.n_tmp = 0

    def _leaf(self, names: List[str]) -> str:
        r = self.rng.random()
        if r < 0.55:
            name = self.rng.choice(names)
            # only certainly-field names may be shifted (the type system
            # rejects calling a scalar-typed temp -- correctly)
            if (
                not self.with_unstructured
                and name in self.field_names
                and self.rng.random() < 0.35
            ):
                off = self.rng.choice(["Ioff", "Joff"])
                k = self.rng.randint(-2, 2)
                return f"{name}({off}[{k}])"
            return name
        if r < 0.75:
            return "s"
        return repr(round(self.rng.uniform(-1.5, 1.5), 3))

    def _expr(self, names: List[str], depth: int = 0) -> str:
        r = self.rng.random()
        if depth >= 3 or r < 0.3:
            return self._leaf(names)
        if r < 0.7:
            op = self.rng.choice(["+", "-", "*"])
            return f"({self._expr(names, depth + 1)} {op} {self._expr(names, depth + 1)})"
        if r < 0.85:
            c = self._expr(names, depth + 1)
            t = self._expr(names, depth + 1)
            f = self._expr(names, depth + 1)
            return f"where(({c}) > 0.25, {t}, {f})"
        fn = self.rng.choice(["minimum", "maximum"])
        return f"{fn}({self._expr(names, depth + 1)}, {self._expr(names, depth + 1)})"

    def _is_field_expr(self, expr: str) -> bool:
        import re

        return any(re.search(rf"\b{n}\b", expr) for n in self.field_names)

    def generate(self) -> str:
        self.field_names = {"a", "b"}
        names = ["a", "b"]
        body = []
        if self.with_collection:
            # params arrive as a named collection: member access + (maybe)
            # an in-operator constructor round-trip
            body += ["a = pair.a", "b = pair.b"]
        for _ in range(self.rng.randint(1, 3)):
            t = f"t{self.n_tmp}"
            self.n_tmp += 1
            if not self.with_unstructured and self.rng.random() < 0.2:
                # boundary-condition pattern: concat_where along J
                c = self.rng.randint(2, 7)
                rel = self.rng.choice(["<", ">=", "<=", ">"])
                ea = f"({self._expr(names)}) + 0.0 * a"
                eb = f"({self._expr(names)}) + 0.0 * b"
                body.append(f"{t} = concat_where(J {rel} {c}, {ea}, {eb})")
                self.field_names.add(t)
                names.append(t)
                continue
            e = self._expr(names)
            body.append(f"{t} = {e}")
            if self._is_field_expr(e):
                self.field_names.add(t)
            names.append(t)
        if self.with_collection and self.rng.random() < 0.6:
            # both member exprs anchored to the field dtype: the ctor
            # type-checks members against the declared (field) types
            ea = f"({self._expr(names)}) + 0.0 * a"
            eb = f"({self._expr(names)}) + 0.0 * b"
            body.append(f"col = PT(a={ea}, b={eb})")
            body.append("ca = col.a")
            self.field_names.add("ca")
            names.append("ca")
        if self.with_unstructured:
            e = self._expr(names)
            if not self._is_field_expr(e):
                e = f"({e}) + 0.0 * a"
            if self.with_provider and self.rng.random() < 0.4:
                # neighbor selection through the provider table
                body.append(f"r = ({e})(V2E[{self.rng.randint(0, 2)}])")
            elif self.with_provider:
                # skip mask resolved from the ambient provider
                body.append(f"r = neighbor_sum(({e})(V2E), axis=V2EDim)")
            else:
                body.append(f"r = neighbor_sum(({e})(V2E), axis=V2E)")
            ret = "r"
        else:
            ret = self._expr(names)
            if not self._is_field_expr(ret):
                ret = f"({ret}) + 0.0 * a"
        sig = (
            "def op(pair: PT, s: float64) -> RT:"
            if self.with_collection
            else "def op(a: FT, b: FT, s: float64) -> RT:"
        )
        src = sig + "\n" + textwrap.indent(
            "\n".join(body + [f"return {ret}"]), "    "
        )
        return src


def run_differential_case(seed: int, rtol=1e-12, atol=1e-12,
                          transforms: bool = False, dtype=np.float64) -> None:
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import (
        Dimension,
        Field,
        FieldOffset,
        as_connectivity,
        as_field,
        concat_where,
        field_operator,
        maximum,
        minimum,
        neighbor_sum,
        where,
    )
    from gt4py_tpu.next.type_system import Dims

    rng = random.Random(seed)
    unstructured = rng.random() < 0.3
    provider = unstructured and rng.random() < 0.5
    collection = not unstructured and rng.random() < 0.35

    I = Dimension("I")
    J = Dimension("J")
    Vertex = Dimension("Vertex")
    Edge = Dimension("Edge")
    Ioff = FieldOffset("Ioff", source=I, target=(I,))
    Joff = FieldOffset("Joff", source=J, target=(J,))

    nprng = np.random.default_rng(seed)
    offset_provider = None
    V2EDim = None
    if unstructured:
        nv, ne, width = 6, 9, 3
        table = np.full((nv, width), -1, dtype=np.int64)
        for v in range(nv):
            n = nprng.integers(1, width + 1)
            table[v, :n] = nprng.integers(0, ne, n)
        conn = as_connectivity(table, source=Vertex, codomain=Edge)
        V2EDim = conn.local_dim
        if provider:
            # the operator sees only the named offset; the table arrives
            # per call through offset_provider (the reference call style)
            V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
            offset_provider = {"V2E": conn}
        else:
            V2E = conn
        FT = Field[Dims[Edge], dtype]
        RT = Field[Dims[Vertex], dtype]
        data_dims, shape = (Edge,), (ne,)
    else:
        V2E = None
        FT = Field[Dims[I, J], dtype]
        RT = Field[Dims[I, J], dtype]
        data_dims, shape = (I, J), (10, 9)

    gen = OperatorGenerator(
        rng, with_unstructured=unstructured, with_collection=collection,
        with_provider=provider,
    )
    src = gen.generate()

    from typing import NamedTuple as _NamedTuple

    PT = _NamedTuple("PT", [("a", FT), ("b", FT)])

    # the generated source annotates ``s: float64``; binding the name to
    # the case dtype keeps the scalar's concrete type equal to the fields'
    # (the type system correctly rejects mixed concrete dtypes)
    ns = dict(
        FT=FT, RT=RT, PT=PT, float64=dtype, where=where, minimum=minimum,
        maximum=maximum, neighbor_sum=neighbor_sum, Ioff=Ioff, Joff=Joff,
        V2E=V2E, V2EDim=V2EDim, concat_where=concat_where, I=I, J=J,
    )
    # the frontend reads the source via inspect.getsource; register the
    # generated text under a virtual filename so linecache can serve it
    import linecache

    filename = f"<next-fuzz-{seed}>"
    linecache.cache[filename] = (len(src), None, src.splitlines(True), filename)
    code = compile(src, filename, "exec")
    exec(code, ns)
    op = field_operator(ns["op"])

    a_np = nprng.random(shape).astype(dtype)
    b_np = nprng.random(shape).astype(dtype)
    s = np.dtype(dtype).type(nprng.uniform(-1, 1))

    by_kw = collection and rng.random() < 0.5
    results = {}
    for alloc in ("numpy", "jax"):
        a = as_field(data_dims, a_np.copy(), allocator=alloc)
        b = as_field(data_dims, b_np.copy(), allocator=alloc)
        try:
            if collection:
                # sometimes by keyword: the call-interface binder is in play
                if by_kw:
                    out = op(pair=PT(a=a, b=b), s=s)
                else:
                    out = op(PT(a=a, b=b), s)
            else:
                out = op(a, b, s, offset_provider=offset_provider)
        except ValueError as e:
            # a generated case can be legitimately rejected at runtime
            # (e.g. concat_where pieces left a gap after branch shifts);
            # the differential contract is then that BOTH paths reject
            # identically
            results[alloc] = (type(e).__name__, None, None)
            continue
        results[alloc] = (out.asnumpy(), out.dims, tuple(out.domain.ranges))

    r_np, d_np, dom_np = results["numpy"]
    r_jx, d_jx, dom_jx = results["jax"]
    if isinstance(r_np, str) or isinstance(r_jx, str):
        assert r_np == r_jx, (
            f"seed {seed}: error-path diverges ({r_np!r} vs {r_jx!r})\n{src}"
        )
        return
    assert d_np == d_jx, f"seed {seed}: dims diverge {d_np} vs {d_jx}\n{src}"
    assert dom_np == dom_jx, f"seed {seed}: domains diverge {dom_np} vs {dom_jx}\n{src}"
    np.testing.assert_allclose(
        r_jx, r_np, rtol=rtol, atol=atol,
        err_msg=f"seed {seed}: values diverge\n{src}",
    )

    if transforms:
        call = (
            (lambda x, y, z: op(PT(a=x, b=y), z)) if collection
            else (lambda x, y, z: op(x, y, z, offset_provider=offset_provider))
        )
        _check_transform_invariance(
            call, as_field, data_dims, a_np, b_np, s, r_np, d_np, dom_np,
            seed, src, rtol, atol,
        )


def _check_transform_invariance(
    call, as_field, data_dims, a_np, b_np, s, r_np, d_np, dom_np,
    seed, src, rtol, atol,
) -> None:
    """The jax path must be invariant under jax transforms: jit (Fields are
    pytrees; domains are static aux data) and vmap over scalar arguments
    (the interpreter must be trace-polymorphic in scalars)."""
    import jax
    import jax.numpy as jnp

    a = as_field(data_dims, a_np.copy(), allocator="jax")
    b = as_field(data_dims, b_np.copy(), allocator="jax")

    jit_out = jax.jit(lambda x, y, z: call(x, y, z))(a, b, s)
    assert jit_out.dims == d_np, f"seed {seed}: jit dims diverge\n{src}"
    assert tuple(jit_out.domain.ranges) == dom_np, (
        f"seed {seed}: jit domain diverges\n{src}"
    )
    np.testing.assert_allclose(
        jit_out.asnumpy(), r_np, rtol=rtol, atol=atol,
        err_msg=f"seed {seed}: jit values diverge from the numpy oracle\n{src}",
    )

    # vmap over the scalar parameter: row i must equal the eager run at s_i
    svals = np.linspace(-1.0, 1.0, 3)
    batched = jax.vmap(lambda z: call(a, b, z).ndarray)(jnp.asarray(svals))
    for i, sv in enumerate(svals):
        eager = call(a, b, float(sv))
        np.testing.assert_allclose(
            np.asarray(batched[i]), eager.asnumpy(), rtol=rtol, atol=atol,
            err_msg=f"seed {seed}: vmap row {i} diverges from eager\n{src}",
        )

    # the COMPOSITIONS (r3 verdict: claimed composable, only jit fuzzed):
    # jit(vmap(op)) and vmap(jit(op)) must both match the plain vmap rows
    jv = jax.jit(jax.vmap(lambda z: call(a, b, z).ndarray))(jnp.asarray(svals))
    np.testing.assert_allclose(
        np.asarray(jv), np.asarray(batched), rtol=rtol, atol=atol,
        err_msg=f"seed {seed}: jit(vmap) diverges from vmap\n{src}",
    )
    vj = jax.vmap(jax.jit(lambda z: call(a, b, z).ndarray))(jnp.asarray(svals))
    np.testing.assert_allclose(
        np.asarray(vj), np.asarray(batched), rtol=rtol, atol=atol,
        err_msg=f"seed {seed}: vmap(jit) diverges from vmap\n{src}",
    )


def run_program_case(seed: int, rtol=1e-12, atol=1e-12) -> None:
    """Random multi-statement PROGRAMS: operator calls with out= targets
    (plain names, relative slices, tuples) and domain= dict literals,
    executed embedded, through the numpy-oracle backend, and through the
    jit/AOT pool -- all three must produce identical out buffers
    (including the untouched fill in unwritten halo regions)."""
    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import (
        Dimension, Field, FieldOffset, as_field, backends, concat_where,
        field_operator, maximum, minimum, program, where,
    )
    from gt4py_tpu.next.type_system import Dims

    rng = random.Random(seed ^ 0x5EED)
    nprng = np.random.default_rng(seed ^ 0x5EED)

    from gt4py_tpu.next import DimensionKind, scan_operator

    I = Dimension("I")
    # J doubles as the scan axis for generated scan statements
    J = Dimension("J", kind=DimensionKind.VERTICAL)
    Ioff = FieldOffset("Ioff", source=I, target=(I,))
    Joff = FieldOffset("Joff", source=J, target=(J,))
    ni, nj = 10, 9
    FT = Field[Dims[I, J], np.float64]

    import linecache

    ns = dict(
        FT=FT, RT=FT, float64=np.float64, where=where, minimum=minimum,
        maximum=maximum, Ioff=Ioff, Joff=Joff, concat_where=concat_where,
        I=I, J=J,
    )

    # 1-2 random operators
    ops = []
    for k in range(rng.randint(1, 2)):
        gen = OperatorGenerator(rng)
        src = gen.generate().replace("def op(", f"def op{k}(")
        fname = f"<next-fuzz-prog-{seed}-op{k}>"
        linecache.cache[fname] = (len(src), None, src.splitlines(True), fname)
        exec(compile(src, fname, "exec"), ns)
        ops.append(field_operator(ns[f"op{k}"]))

    # maybe a scan statement: cumulative column op along J (the scan
    # carries run inside lax.scan on jax, a python loop on the oracle)
    scan_stmt = rng.random() < 0.35
    if scan_stmt:
        ssrc = (
            "def sc(c: float64, x: float64, w: float64) -> float64:\n"
            f"    return c * {round(rng.uniform(0.3, 0.9), 3)} + x * w\n"
        )
        sname = f"<next-fuzz-prog-{seed}-scan>"
        linecache.cache[sname] = (len(ssrc), None, ssrc.splitlines(True), sname)
        sns = dict(ns)
        exec(compile(ssrc, sname, "exec"), sns)
        scanf = scan_operator(
            axis=J, forward=bool(rng.random() < 0.5), init=np.float64(0.0)
        )(sns["sc"])

    # maybe a tuple-returning operator composing the generated ones
    # (nested operator calls) targeted by a tuple out=
    tuple_stmt = rng.random() < 0.4
    if tuple_stmt:
        tsrc = (
            "def optup(a: FT, b: FT, s: float64) -> TT:\n"
            f"    return opf0(a, b, s), opf{len(ops) - 1}(b, a, s)\n"
        )
        tname = f"<next-fuzz-prog-{seed}-optup>"
        linecache.cache[tname] = (len(tsrc), None, tsrc.splitlines(True), tname)
        tns = dict(ns)
        tns["TT"] = tuple[FT, FT]
        for k, op in enumerate(ops):
            tns[f"opf{k}"] = op  # reuse the parsed FieldOperator objects
        exec(compile(tsrc, tname, "exec"), tns)
        optup = field_operator(tns["optup"])

    # program body: each statement writes one out param
    n_out = rng.randint(1, 2) + (2 if tuple_stmt else 0) + (1 if scan_stmt else 0)
    n_plain = n_out - (2 if tuple_stmt else 0) - (1 if scan_stmt else 0)
    body = []
    for j in range(n_plain):
        k = rng.randrange(len(ops))
        target = f"o{j}"
        form = rng.random()
        kw = ""
        # generated operators shift by up to +-2, so writes restricted to
        # [2, n-2) per axis are always coverable by the full-size inputs
        if form < 0.5:
            lo = 2
            hi = rng.choice([-2, -3])
            target = f"o{j}[{lo}:{hi}, 2:-2]"
        else:
            kw = ", domain={I: (2, 7), J: (2, 7)}"
        body.append(f"    opf{k}(a, b, s, out={target}{kw})")
    if scan_stmt:
        js = n_plain
        target = f"o{js}" if rng.random() < 0.5 else f"o{js}[2:-2, 2:-2]"
        body.append(f"    scanf(a, s, out={target})")
    if tuple_stmt:
        j0, j1 = n_out - 2, n_out - 1
        if rng.random() < 0.5:
            target = f"(o{j0}[2:-2, 2:-2], o{j1}[2:-2, 2:-2])"
            kw = ""
        else:
            target = f"(o{j0}, o{j1})"
            kw = ", domain={I: (2, 7), J: (2, 7)}"
        body.append(f"    optupf(a, b, s, out={target}{kw})")
    params = ", ".join(
        ["a: FT", "b: FT", "s: float64"] + [f"o{j}: FT" for j in range(n_out)]
    )
    psrc = f"def prog({params}):\n" + "\n".join(body)
    pname = f"<next-fuzz-prog-{seed}>"
    linecache.cache[pname] = (len(psrc), None, psrc.splitlines(True), pname)
    pns = dict(ns)
    pns["I"] = I
    pns["J"] = J
    for k, op in enumerate(ops):
        pns[f"opf{k}"] = op
    if tuple_stmt:
        pns["optupf"] = optup
    if scan_stmt:
        pns["scanf"] = scanf
    exec(compile(psrc, pname, "exec"), pns)
    prog = program(pns["prog"])

    a_np = nprng.random((ni, nj))
    b_np = nprng.random((ni, nj))
    s = float(nprng.uniform(-1, 1))

    from gt4py_tpu.next.frontend import FieldViewError

    def run(backend, alloc):
        a = as_field((I, J), a_np.copy(), allocator=alloc)
        b = as_field((I, J), b_np.copy(), allocator=alloc)
        outs = [
            as_field((I, J), np.full((ni, nj), -3.0), allocator=alloc)
            for _ in range(n_out)
        ]
        p = prog if backend is None else prog.with_backend(backend)
        try:
            p(a, b, s, *outs)
        except (FieldViewError, ValueError) as e:
            # deeply chained shifts can make a generated write legitimately
            # uncoverable; the differential contract is then that EVERY
            # path rejects it the same way
            return type(e).__name__
        return [o.asnumpy() for o in outs]

    ref = run(backends.numpy_oracle, "numpy")
    for label, backend, alloc in (
        ("embedded-jax", None, None),
        ("jax_jit", backends.jax_jit, None),
        # the compiled backend: multi-statement programs fuse into one
        # Pallas kernel (pallas_bridge.lower_program) when eligible --
        # slices/domain=/tuple targets, scan statements and stale-halo
        # reads all fall back to the per-statement path transparently
        ("pallas", backends.pallas, None),
    ):
        got = run(backend, alloc)
        src_dump = psrc + "\n" + "\n".join(
            "".join(linecache.cache[f"<next-fuzz-prog-{seed}-op{k}>"][2])
            for k in range(len(ops))
        )
        if isinstance(ref, str) or isinstance(got, str):
            assert ref == got, (
                f"seed {seed}: {label} error-path diverges "
                f"(oracle: {ref!r}, {label}: {got!r})\n{src_dump}"
            )
            continue
        for j, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                g, r, rtol=rtol, atol=atol,
                err_msg=f"seed {seed}: {label} out {j} diverges\n{src_dump}",
            )


# --------------------------------------------------------------------- #
# pallas-bridge differential leg
# --------------------------------------------------------------------- #


def _scan_expr(rng: random.Random, names: List[str], depth: int = 0) -> str:
    """Random scalar expression over scan-body names (no division: inputs
    are uniform random and denominators could vanish)."""
    r = rng.random()
    if depth >= 3 or r < 0.35:
        rr = rng.random()
        if rr < 0.7:
            return rng.choice(names)
        return repr(round(rng.uniform(-1.2, 1.2), 3))
    if r < 0.7:
        op = rng.choice(["+", "-", "*"])
        return (
            f"({_scan_expr(rng, names, depth + 1)} {op} "
            f"{_scan_expr(rng, names, depth + 1)})"
        )
    if r < 0.85:
        return (
            f"where(({_scan_expr(rng, names, depth + 1)}) > 0.25, "
            f"{_scan_expr(rng, names, depth + 1)}, "
            f"{_scan_expr(rng, names, depth + 1)})"
        )
    fn = rng.choice(["minimum", "maximum"])
    return (
        f"{fn}({_scan_expr(rng, names, depth + 1)}, "
        f"{_scan_expr(rng, names, depth + 1)})"
    )


def run_bridge_case(seed: int, rtol=1e-12, atol=1e-12) -> bool:
    """Differential leg for the pallas bridge (next/pallas_bridge.py): the
    SAME generated operator runs on the numpy oracle and under
    ``with_backend("pallas")`` -- kernel lowering when eligible, the
    transparent embedded fallback otherwise; values, dims AND domains must
    agree either way.  Returns True when the case actually lowered (the
    corpus test asserts a minimum lowering rate so this leg cannot
    silently degrade into fallback-only coverage).

    Families: field operators extended with helper-operator CALLS (the
    inliner) and tuple returns (fused multi-output kernels, incl.
    differing-extent fallbacks); scan operators (scalar/tuple carries,
    forward/backward, K-broadcast args).
    """
    import linecache

    import gt4py_tpu.next as gtx
    from gt4py_tpu.next import (
        Dimension,
        DimensionKind,
        Field,
        FieldOffset,
        as_field,
        backends,
        field_operator,
        maximum,
        minimum,
        scan_operator,
        where,
    )
    from gt4py_tpu.next.type_system import Dims

    rng = random.Random(seed ^ 0x5EED)
    nprng = np.random.default_rng(seed + 424242)

    I = Dimension("I")
    J = Dimension("J")
    K = Dimension("K", kind=DimensionKind.VERTICAL)
    Ioff = FieldOffset("Ioff", source=I, target=(I,))
    Joff = FieldOffset("Joff", source=J, target=(J,))

    def register(src: str, tag: str):
        filename = f"<bridge-fuzz-{seed}-{tag}>"
        linecache.cache[filename] = (
            len(src), None, src.splitlines(True), filename
        )
        return compile(src, filename, "exec")

    scan_case = rng.random() < 0.4
    cw_case = not scan_case and rng.random() < 0.35

    if cw_case:
        # concat_where family (r4): K-partitioned vertical sections in
        # the bridge (pallas_bridge._concat_where); branches may shift
        # along K so the piece algebra's result domains get exercised,
        # including the fall-back shapes (uncoverable negative origins)
        Koff = FieldOffset("Koff", source=K, target=(K,))

        def cw_expr(depth=0):
            r = rng.random()
            if depth >= 2 or r < 0.4:
                rr = rng.random()
                if rr < 0.5:
                    nm = rng.choice(["a", "b"])
                    if rng.random() < 0.4:
                        off = rng.choice(["Ioff", "Joff", "Koff"])
                        return f"{nm}({off}[{rng.randint(-2, 2)}])"
                    return nm
                if rr < 0.75:
                    return "s"
                return repr(round(rng.uniform(-1.5, 1.5), 3))
            op2 = rng.choice(["+", "-", "*"])
            return f"({cw_expr(depth + 1)} {op2} {cw_expr(depth + 1)})"

        names = ["a", "b"]
        lines = []
        for i in range(rng.randint(1, 2)):
            c = rng.randint(1, 7)
            rel = rng.choice(["<", "<=", ">", ">="])
            ea = f"({cw_expr()}) + 0.0 * a"
            eb = f"({cw_expr()}) + 0.0 * b"
            lines.append(f"    t{i} = concat_where(K {rel} {c}, {ea}, {eb})")
            names.append(f"t{i}")
        ret = f"({cw_expr()}) + 0.0 * {names[-1]}"
        src = (
            "def op(a: FT3, b: FT3, s: float64):\n"
            + "\n".join(lines)
            + f"\n    return {ret}\n"
        )
        from gt4py_tpu.next import concat_where as _cw

        ns = dict(
            FT3=Field[Dims[I, J, K], np.float64], float64=np.float64,
            where=where, minimum=minimum, maximum=maximum,
            Ioff=Ioff, Joff=Joff, Koff=Koff, K=K, concat_where=_cw,
        )
        exec(register(src, "cw"), ns)
        op = field_operator(ns["op"])

        a = as_field((I, J, K), nprng.random((7, 6, 9)))
        b = as_field((I, J, K), nprng.random((7, 6, 9)))
        s = np.float64(nprng.uniform(-1, 1))

        def run_cw(backend):
            try:
                return backend(a, b, s)
            except (ValueError, Exception) as e:
                if type(e).__name__ in ("ValueError", "FieldViewError"):
                    return type(e).__name__
                raise

        ref = run_cw(op.with_backend(backends.numpy_oracle))
        bound = op.with_backend("pallas")
        got = run_cw(bound)
        if isinstance(ref, str) or isinstance(got, str):
            assert ref == got, (
                f"seed {seed}: cw error-path diverges ({ref!r} vs {got!r})\n{src}"
            )
            return False
        plans = bound.__dict__.get("_bridge_plans", {})
        lowered = any(p is not None for p in plans.values())
        assert ref.dims == got.dims, f"seed {seed}: cw dims\n{src}"
        assert tuple(ref.domain.ranges) == tuple(got.domain.ranges), (
            f"seed {seed}: cw domains {ref.domain} vs {got.domain}\n{src}"
        )
        np.testing.assert_allclose(
            got.asnumpy(), ref.asnumpy(), rtol=rtol, atol=atol,
            err_msg=f"seed {seed}: cw values diverge\n{src}",
        )
        return lowered

    if scan_case:
        arity = rng.choice([1, 2])
        cnames = ["carry"] if arity == 1 else ["carry[0]", "carry[1]"]
        names = cnames + ["x", "g", "w"]
        if arity == 1:
            ret = _scan_expr(rng, names)
            src = (
                "def sc(carry: float64, x: float64, g: float64, "
                "w: float64) -> float64:\n"
                f"    return {ret}\n"
            )
            init = round(rng.uniform(-1, 1), 3)
        else:
            e0 = _scan_expr(rng, names)
            e1 = _scan_expr(rng, names)
            src = (
                "def sc(carry: tuple[float64, float64], x: float64, "
                "g: float64, w: float64):\n"
                f"    t = {_scan_expr(rng, names)}\n"
                f"    return ({e0} + 0.0 * t, {e1} + 0.0 * t)\n"
            )
            init = (round(rng.uniform(-1, 1), 3), round(rng.uniform(-1, 1), 3))
        ns = dict(
            float64=np.float64, where=where, minimum=minimum, maximum=maximum
        )
        exec(register(src, "scan"), ns)
        forward = rng.random() < 0.5
        op = scan_operator(ns["sc"], axis=K, forward=forward, init=init)

        shape3 = (5, 6, 8)
        x_np = nprng.random(shape3)
        g_has_k = rng.random() < 0.5
        g_np = nprng.random(shape3 if g_has_k else shape3[:2])
        w = np.float64(nprng.uniform(-1, 1))

        x = as_field((I, J, K), x_np)
        g = as_field((I, J, K) if g_has_k else (I, J), g_np)
        ref = op.with_backend(backends.numpy_oracle)(x, g, w)
        bound = op.with_backend("pallas")
        got = bound(x, g, w)
        plans = bound.__dict__.get("_scan_bridge_plans", {})
        lowered = any(p is not None for p in plans.values())
    else:
        gen = OperatorGenerator(rng)
        gen.field_names = {"a", "b"}
        names = ["a", "b"]
        body: List[str] = []
        helper_src = (
            "def helper(x: FT, w: float64) -> FT:\n"
            f"    return ({_scan_expr(rng, ['x', 'w'])}) + 0.0 * x\n"
        )
        hns = dict(
            FT=Field[Dims[I, J], np.float64], float64=np.float64,
            where=where, minimum=minimum, maximum=maximum,
        )
        exec(register(helper_src, "helper"), hns)
        helper = field_operator(hns["helper"])
        for i in range(rng.randint(1, 3)):
            t = f"t{i}"
            if rng.random() < 0.35:
                arg = gen._expr(names)
                if not gen._is_field_expr(arg):
                    arg = f"({arg}) + 0.0 * a"
                body.append(f"{t} = helper({arg}, s)")
                gen.field_names.add(t)
            else:
                e = gen._expr(names)
                body.append(f"{t} = {e}")
                if gen._is_field_expr(e):
                    gen.field_names.add(t)
            names.append(t)
        tuple_ret = rng.random() < 0.4
        if tuple_ret:
            u = gen._expr(names)
            if not gen._is_field_expr(u):
                u = f"({u}) + 0.0 * a"
            body.append(f"u = {u} + 0.0 * (a + b)")
            r2 = rng.random()
            if r2 < 0.3:
                # differing member extents: exercises the fallback gate
                ret = "(u(Ioff[1]) - u, u(Joff[1]) + u)"
            elif r2 < 0.55:
                # the same INPUT read at asymmetric nonzero offsets across
                # members: the zero-widened extent hulls coincide while the
                # exact demands differ -- the r3-advisor shape the tuple
                # gate must catch with exact (not widened) extents
                o1, o2 = rng.choice([(1, 2), (-2, -1), (2, 1), (-1, -2)])
                ret = f"(a(Ioff[{o1}]) + a(Ioff[{o2}]), a + a(Ioff[{o2}]))"
            else:
                ret = f"(u * {round(rng.uniform(0.5, 2.0), 2)} + s, u - s)"
        else:
            ret = gen._expr(names)
            if not gen._is_field_expr(ret):
                ret = f"({ret}) + 0.0 * a"
        src = "def op(a: FT, b: FT, s: float64):\n" + textwrap.indent(
            "\n".join(body + [f"return {ret}"]), "    "
        )
        ns = dict(
            FT=Field[Dims[I, J], np.float64], float64=np.float64,
            where=where, minimum=minimum, maximum=maximum,
            Ioff=Ioff, Joff=Joff, helper=helper,
        )
        exec(register(src, "op"), ns)
        op = field_operator(ns["op"])

        a_np = nprng.random((10, 9))
        b_np = nprng.random((10, 9))
        s = np.float64(nprng.uniform(-1, 1))
        a = as_field((I, J), a_np)
        b = as_field((I, J), b_np)
        ref = op.with_backend(backends.numpy_oracle)(a, b, s)
        bound = op.with_backend("pallas")
        got = bound(a, b, s)
        plans = bound.__dict__.get("_bridge_plans", {})
        lowered = any(p is not None for p in plans.values())

    refs = ref if isinstance(ref, tuple) else (ref,)
    gots = got if isinstance(got, tuple) else (got,)
    assert len(refs) == len(gots), f"seed {seed}: arity diverges\n{src}"
    for j, (r, g) in enumerate(zip(refs, gots)):
        assert r.dims == g.dims, (
            f"seed {seed}: out {j} dims diverge {r.dims} vs {g.dims}\n{src}"
        )
        assert tuple(r.domain.ranges) == tuple(g.domain.ranges), (
            f"seed {seed}: out {j} domains diverge "
            f"{r.domain} vs {g.domain}\n{src}"
        )
        np.testing.assert_allclose(
            g.asnumpy(), r.asnumpy(), rtol=rtol, atol=atol,
            err_msg=f"seed {seed}: out {j} values diverge\n{src}",
        )
    return lowered
