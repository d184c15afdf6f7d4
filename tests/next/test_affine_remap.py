"""Affine-gather lowering (gt4py_tpu/next/affine_remap.py): detection of
piecewise 2D-affine neighbor tables and the dense strided-window replay.

The contract is EXACT equality with the ``xp.take`` base path (the
numpy oracle defines numerics; the affine path reads the same elements
through slices instead of gathers, so not even an ulp may move)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

import gt4py_tpu.next as gtx
from gt4py_tpu.next import Dims, Field, FieldOffset, backends, neighbor_sum
from gt4py_tpu.next import affine_remap as ar
from gt4py_tpu.next.common import Connectivity
from gt4py_tpu.next.testing import E2VDim, Edge, V2EDim, Vertex, grid_mesh


def _take_ref(table, data, own_start):
    safe = np.clip(np.asarray(table) - own_start, 0, data.shape[0] - 1)
    return np.take(np.asarray(data), safe.reshape(-1), axis=0).reshape(
        table.shape + data.shape[1:]
    )


@pytest.mark.parametrize("n", [64, 96])
def test_grid_mesh_tables_plan(n):
    mesh = grid_mesh(n)
    e2v = ar.build_table_plan(np.asarray(mesh.e2v.table), None)
    assert e2v is not None
    # two edge families (horizontal, vertical), each one affine block
    assert all(
        len(c.phases) == 1 and len(c.phases[0]) == 2 for c in e2v.cols
    )
    assert all(c.res_pos.size == 0 for c in e2v.cols)
    v2e = ar.build_table_plan(np.asarray(mesh.v2e.table), -1)
    assert v2e is not None
    # residual = boundary vertices + skips only: O(n) of n^2 entries
    assert all(c.res_pos.size <= 5 * n for c in v2e.cols)
    assert v2e.vmin >= 0  # skips never enter the plan's value range


@pytest.mark.parametrize("name", ["e2v", "v2e"])
@pytest.mark.parametrize("extra_dims", [(), (3,)])
def test_apply_exact_vs_take(name, extra_dims):
    mesh = grid_mesh(64)
    conn = getattr(mesh, name)
    nc = mesh.n_vertices if name == "e2v" else mesh.n_edges
    plan = ar.build_table_plan(np.asarray(conn.table), conn.skip_value)
    assert plan is not None
    data_np = (
        np.random.default_rng(5)
        .random((nc,) + extra_dims)
        .astype(np.float32)
    )
    got = ar.apply_table_plan(plan, jnp.asarray(data_np), 0, 0)
    assert got is not None
    ref = _take_ref(np.asarray(conn.table), data_np, 0)
    assert np.array_equal(np.asarray(got), ref)


def test_apply_nonzero_domain_start():
    """Field domains starting below zero shift every index; the window
    starts shift with them (and may go negative -> left pad)."""
    mesh = grid_mesh(64)
    conn = mesh.v2e
    plan = ar.build_table_plan(np.asarray(conn.table), -1)
    start = -7
    nc = mesh.n_edges - start  # domain [-7, ne): covers all edge ids
    data_np = np.random.default_rng(6).random(nc).astype(np.float32)
    got = ar.apply_table_plan(plan, jnp.asarray(data_np), start, 0)
    assert got is not None
    assert np.array_equal(
        np.asarray(got), _take_ref(np.asarray(conn.table), data_np, start)
    )


def test_apply_declines_noncovering_domain():
    """When the field does not cover the table's value range the base
    path clips -- the dense window cannot reproduce that, so the plan
    must decline and remap must fall back (still matching take)."""
    mesh = grid_mesh(64)
    plan = ar.build_table_plan(np.asarray(mesh.e2v.table), None)
    data = jnp.asarray(np.random.default_rng(7).random(mesh.n_vertices - 3))
    assert ar.apply_table_plan(plan, data, 0, 0) is None


def test_irregular_table_rejected():
    rng = np.random.default_rng(8)
    table = rng.integers(0, 5000, size=(5000, 2))
    assert ar.build_table_plan(table, None) is None


def test_small_table_rejected():
    mesh = grid_mesh(8)  # 112 edges: far below the planning threshold
    assert ar.build_table_plan(np.asarray(mesh.e2v.table), None) is None


def test_middle_axis():
    """Codomain on a non-leading axis (e.g. (K, Edge) layouts)."""
    mesh = grid_mesh(64)
    conn = mesh.e2v
    plan = ar.build_table_plan(np.asarray(conn.table), None)
    data_np = np.random.default_rng(9).random((4, mesh.n_vertices, 2))
    got = ar.apply_table_plan(plan, jnp.asarray(data_np), 0, 1)
    assert got is not None
    t = np.asarray(conn.table)
    ref = np.take(data_np, t.reshape(-1), axis=1).reshape(
        (4,) + t.shape + (2,)
    )
    assert np.array_equal(np.asarray(got), ref)


def test_fvm_end_to_end_bitwise():
    """gradient+divergence through jax_jit with affine gathers is
    BITWISE equal to the numpy oracle (which keeps the take path)."""
    n = 64
    mesh = grid_mesh(n)
    E2V = FieldOffset("E2V", source=Vertex, target=(Edge, E2VDim))
    V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))

    @gtx.field_operator
    def gradient(
        psi: Field[Dims[Vertex], gtx.float64],
    ) -> Field[Dims[Edge], gtx.float64]:
        return psi(E2V[1]) - psi(E2V[0])

    @gtx.field_operator
    def divergence(
        flux: Field[Dims[Edge], gtx.float64],
        sign: Field[Dims[Vertex, V2EDim], gtx.float64],
    ) -> Field[Dims[Vertex], gtx.float64]:
        return neighbor_sum(flux(V2E) * sign, axis=V2EDim)

    provider = {"E2V": mesh.e2v, "V2E": mesh.v2e}
    t = mesh.v2e.table
    first = mesh.e2v.table[np.clip(t, 0, mesh.n_edges - 1), 0]
    sign_np = np.where(
        t == -1,
        0.0,
        np.where(first == np.arange(mesh.n_vertices)[:, None], 1.0, -1.0),
    )
    psi_np = np.random.default_rng(3).random(mesh.n_vertices)

    def run(backend, wrap):
        psi = gtx.as_field((Vertex,), wrap(psi_np))
        sign = gtx.as_field((Vertex, V2EDim), wrap(sign_np))
        g = gradient.with_backend(backend)(psi, offset_provider=provider)
        d = divergence.with_backend(backend)(
            g, sign, offset_provider=provider
        )
        return np.asarray(d.asnumpy())

    ref = run(backends.numpy_oracle, np.asarray)
    assert ar.plan_for(mesh.e2v) is not None
    assert ar.plan_for(mesh.v2e) is not None
    got = run(backends.jax_jit, jnp.asarray)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("seed,frac", [(0, 0.0), (1, 0.02), (2, 0.08), (3, 0.25)])
def test_perturbed_tables_exact(seed, frac):
    """Randomly corrupted quasi-structured tables: light corruption
    plans with residual entries, heavy corruption rejects the plan --
    either way remap must equal the take reference exactly."""
    mesh = grid_mesh(70)
    t = np.asarray(mesh.e2v.table).copy()
    rng = np.random.default_rng(seed)
    k = int(frac * t.size)
    if k:
        pos = rng.choice(t.size, k, replace=False)
        t.reshape(-1)[pos] = rng.integers(0, mesh.n_vertices, k)
    conn = Connectivity(
        table=t,
        source=Edge,
        codomain=Vertex,
        local_dim=E2VDim,
        skip_value=None,
    )
    data_np = rng.random(mesh.n_vertices).astype(np.float32)
    f = gtx.as_field((Vertex,), jnp.asarray(data_np))
    got = f.remap(conn)
    assert np.array_equal(np.asarray(got.asnumpy()), _take_ref(t, data_np, 0))


def test_column_conn_cached_on_parent():
    """`f(V2E[k])` gathers reuse one column Connectivity per parent, so
    the affine plan survives across calls."""
    mesh = grid_mesh(64)
    V2E = FieldOffset("V2E", source=Edge, target=(Vertex, V2EDim))
    flux_np = np.random.default_rng(11).random(mesh.n_edges).astype(np.float32)
    f = gtx.as_field((Edge,), jnp.asarray(flux_np))
    from gt4py_tpu.next.common import _OFFSET_PROVIDER

    tok = _OFFSET_PROVIDER.set({"V2E": mesh.v2e})
    try:
        got = f(V2E[1])
        again = f(V2E[1])
    finally:
        _OFFSET_PROVIDER.reset(tok)
    cols = mesh.v2e.__dict__.get("_column_conns")
    assert cols is not None
    # keyed on (table token, k) so replaced tables re-key (ADVICE r4)
    token = ar.table_token(mesh.v2e.table)
    assert (token, 1) in cols
    assert ar.plan_for(cols[(token, 1)]) is not None  # 1D column planned
    ref = _take_ref(np.asarray(mesh.v2e.table)[:, 1], flux_np, 0)
    assert np.array_equal(np.asarray(got.asnumpy()), ref)
    assert np.array_equal(np.asarray(again.asnumpy()), ref)


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("GT4PY_TPU_AFFINE_GATHER", "0")
    mesh = grid_mesh(64)
    assert ar.plan_for(mesh.e2v) is None


@pytest.mark.parametrize("seed", range(6))
def test_synthetic_affine_families_exact(seed):
    """Random tables built from 1-4 affine families (random C, A, v0)
    plus sprinkled corruption: the fitter must either plan (and replay
    exactly) or reject (and the take path runs) -- exact either way."""
    rng = np.random.default_rng(100 + seed)
    nfam = int(rng.integers(1, 5))
    cols = []
    for _ in range(2):
        segs = []
        for _f in range(nfam):
            L = int(rng.integers(3000, 9000))
            C = int(rng.integers(8, 200))
            A = int(rng.integers(1, 2 * C))
            v0 = int(rng.integers(0, 500))
            segs.append(ar._predict(C, A, v0, L))
        col = np.concatenate(segs)
        k = int(0.01 * col.size)
        if k:
            pos = rng.choice(col.size, k, replace=False)
            col[pos] = rng.integers(0, col.max() + 1, k)
        cols.append(col)
    n = min(len(c) for c in cols)
    table = np.stack([c[:n] for c in cols], axis=1)
    nc = int(table.max()) + 1
    plan = ar.build_table_plan(table, None)
    data_np = np.random.default_rng(7).random(nc).astype(np.float32)
    if plan is not None:
        got = ar.apply_table_plan(plan, jnp.asarray(data_np), 0, 0)
        if got is not None:
            assert np.array_equal(np.asarray(got), _take_ref(table, data_np, 0))
    # end-to-end through remap must be exact regardless of plan outcome
    conn = Connectivity(table=table, source=Edge, codomain=Vertex,
                        local_dim=E2VDim, skip_value=None)
    f = gtx.as_field((Vertex,), jnp.asarray(data_np))
    out = f.remap(conn)
    assert np.array_equal(np.asarray(out.asnumpy()), _take_ref(table, data_np, 0))


def test_triangle_mesh_tables_plan():
    """Structured triangle mesh (each quad split into 2 triangles,
    cell->vertex table): three affine columns with a 2-cell period --
    plans must fit (the fitter is not quad-specific) and replay exactly."""
    n = 72
    # vertices on an (n+1)^2 grid; cells (2*n^2, 3)
    vid = lambda i, j: i * (n + 1) + j
    rows = []
    for i in range(n):
        for j in range(n):
            rows.append([vid(i, j), vid(i, j + 1), vid(i + 1, j)])
            rows.append([vid(i + 1, j + 1), vid(i + 1, j), vid(i, j + 1)])
    c2v = np.asarray(rows, dtype=np.int64)
    plan = ar.build_table_plan(c2v, None)
    assert plan is not None
    # interleaved: each column is 2 phases (up/down triangles)
    assert all(len(c.phases) == 2 for c in plan.cols)
    assert all(c.res_pos.size == 0 for c in plan.cols)
    nv = (n + 1) * (n + 1)
    data_np = np.random.default_rng(13).random(nv).astype(np.float32)
    got = ar.apply_table_plan(plan, jnp.asarray(data_np), 0, 0)
    assert got is not None
    assert np.array_equal(np.asarray(got), _take_ref(c2v, data_np, 0))


def test_apply_under_jit_and_vmap():
    """Planned replay composes with jax transforms: identical results
    under jit, and vmap over a batched data axis (the window slices,
    residual scatter, and phase interleave are all batchable)."""
    import jax

    mesh = grid_mesh(64)
    plan = ar.build_table_plan(np.asarray(mesh.v2e.table), -1)
    assert plan is not None
    data_np = np.random.default_rng(23).random(
        (5, mesh.n_edges)
    ).astype(np.float32)

    def one(d):  # codomain on axis 0 of the unbatched operand
        return ar.apply_table_plan(plan, d, 0, 0)

    ref = np.stack([np.asarray(one(jnp.asarray(r))) for r in data_np])
    got_v = np.asarray(jax.jit(jax.vmap(one))(jnp.asarray(data_np)))
    assert np.array_equal(got_v, ref)
    t = np.asarray(mesh.v2e.table)
    safe = np.clip(t, 0, mesh.n_edges - 1)
    assert np.array_equal(ref, data_np[:, safe])


def test_stale_plan_guard_mutation_and_replacement():
    """ADVICE r4: the plan cache must not replay a stale table.  In-place
    mutation after planning raises (planning freezes the array);
    replacing the table re-plans against the new content."""
    mesh = grid_mesh(64)
    conn = mesh.e2v
    assert ar.plan_for(conn) is not None
    with pytest.raises(ValueError):
        conn.table[0, 0] = 7  # frozen by planning
    # replacement (a NEW array) re-keys the cache and replans
    flipped = np.asarray(conn.table)[::-1].copy()
    conn.__dict__.pop("_column_conns", None)
    conn.table = flipped
    data_np = np.random.default_rng(3).random(mesh.n_vertices).astype(
        np.float32
    )
    f = gtx.as_field((Edge,), jnp.asarray(data_np[: mesh.n_edges]))
    del f  # only the gather matters; use remap directly
    g = gtx.as_field((Vertex,), jnp.asarray(data_np))
    got = g.remap(conn)
    assert np.array_equal(
        np.asarray(got.asnumpy()), _take_ref(flipped, data_np, 0)
    )


def test_table_token_detects_content_change():
    t1 = np.arange(8192, dtype=np.int64).reshape(-1, 2)
    tok1 = ar.table_token(t1)
    t2 = t1.copy()
    assert ar.table_token(t2)[1:] == tok1[1:]  # same content sample
    t2[0, 0] = 99
    assert ar.table_token(t2)[-1] != tok1[-1]
