"""Pallas windowed DMA local-panel gather: bit-identity with the XLA gather.

The kernel (ops/pallas/panel_gather.py) feeds the level >= 2 sweeps; on
valid slots (j < deg) it must reproduce
``C[nbrs[:, :, None], nbrs[:, None, :]]`` / ``C[node_ixs[:, None], nbrs]``
exactly, including NaN positions (a NaN routed through the one-hot
matmuls would otherwise smear across the dot). Runs in interpreter mode
on CPU; the compiled path is exercised on the real TPU by probe scripts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cigwas_tpu.ops.pallas.panel_gather import (
    MAX_W, MIN_W, gather_local_panels, plan_window,
)


def _biteq(a, b):
    return np.array_equal(np.isnan(a), np.isnan(b)) and np.array_equal(
        np.nan_to_num(a), np.nan_to_num(b)
    )


def _clustered_case(vp, nt, d, span, seed=0, nan_frac=0.01):
    """Neighbour lists clustered in `span`-wide windows (LD-like)."""
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(vp, vp)).astype(np.float32)
    if nan_frac:
        C[rng.random((vp, vp)) < nan_frac] = np.nan
    centers = rng.integers(0, vp, nt)
    lo = np.clip(centers - span // 2, 0, vp - span)
    nbrs = (lo[:, None] + rng.integers(0, span, (nt, d))).astype(np.int32)
    nbrs.sort(axis=1)
    node_ixs = np.clip(centers, lo, lo + span - 1).astype(np.int32)
    deg = np.full(nt, d, np.int32)
    return C, node_ixs, nbrs, deg


@pytest.mark.parametrize("d", [64, 128])
def test_gather_bit_identical_with_nans(d):
    vp = 2176
    C, node_ixs, nbrs, deg = _clustered_case(vp, 19, d, span=400)
    got = gather_local_panels(
        jnp.asarray(C), node_ixs, nbrs, deg, interpret=True
    )
    assert got is not None
    Cb, qb = (np.asarray(x) for x in got)
    assert _biteq(Cb, C[nbrs[:, :, None], nbrs[:, None, :]])
    assert _biteq(qb, C[node_ixs[:, None], nbrs])


def test_gather_pad_slots_remap_to_node_row():
    """Pad slots (j >= deg, stored 0 by _compact_neighbors) must not blow
    up the window span; they gather the node's own row/column and every
    consumer masks them by deg."""
    vp = 1024
    C, node_ixs, nbrs, deg = _clustered_case(vp, 7, 64, span=200,
                                             nan_frac=0.0)
    deg = np.full(7, 40, np.int32)
    nbrs[:, 40:] = 0  # _compact_neighbors pad convention
    got = gather_local_panels(
        jnp.asarray(C), node_ixs, nbrs, deg, interpret=True
    )
    assert got is not None
    Cb, qb = (np.asarray(x) for x in got)
    valid = nbrs[:, :40]
    assert _biteq(Cb[:, :40, :40], C[valid[:, :, None], valid[:, None, :]])
    assert _biteq(qb[:, :40], C[node_ixs[:, None], valid])


def test_gather_falls_back_on_wide_span():
    """A neighbour span wider than MAX_W returns None (XLA route)."""
    vp = 4096
    C, node_ixs, nbrs, deg = _clustered_case(vp, 5, 32, span=300)
    nbrs[0, 0] = 0
    nbrs[0, -1] = vp - 1  # span ~ vp > MAX_W
    assert plan_window(node_ixs, nbrs, deg, vp) is None
    assert gather_local_panels(
        jnp.asarray(C), node_ixs, nbrs, deg, interpret=True
    ) is None


def test_gather_duplicate_neighbours_and_window_edges():
    """Duplicated indices and spans touching the panel edges gather
    cleanly (base clamps keep the window inside the array)."""
    vp = MIN_W + 128
    rng = np.random.default_rng(1)
    C = rng.normal(size=(vp, vp)).astype(np.float32)
    nt, d = 6, 64
    nbrs = rng.integers(0, vp, (nt, d)).astype(np.int32)  # full-panel span
    nbrs[:, d // 2:] = nbrs[:, : d // 2]
    nbrs.sort(axis=1)
    node_ixs = nbrs[:, 0].copy()
    deg = np.full(nt, d, np.int32)
    plan = plan_window(node_ixs, nbrs, deg, vp)
    assert plan is not None and plan[1] <= vp
    got = gather_local_panels(
        jnp.asarray(C), node_ixs, nbrs, deg, interpret=True
    )
    Cb, qb = (np.asarray(x) for x in got)
    assert _biteq(Cb, C[nbrs[:, :, None], nbrs[:, None, :]])
    assert _biteq(qb, C[node_ixs[:, None], nbrs])


def test_level_local_wide_degree_positions_not_truncated(monkeypatch):
    """Degrees above 256 must not route through the uint8 hit-bits fetch:
    neighbour-list slots would wrap mod 256 and produce silently wrong
    sepsets on the production want_pmax=False path (ADVICE r4). The gather
    route must match the XLA route bit-for-bit at a 270-degree node."""
    from cigwas_tpu.skeleton import cupc

    rng = np.random.default_rng(7)
    v = 384
    C = (0.3 * rng.normal(size=(v, v))).astype(np.float32)
    C = ((C + C.T) / 2).astype(np.float32)
    np.fill_diagonal(C, 1.0)
    G = np.zeros((v, v), np.int32)
    G[0, 1:271] = 1
    G[1:271, 0] = 1
    C_dev = jnp.asarray(C)
    out = {}
    for flag in ("0", "1"):
        monkeypatch.setattr(cupc, "PALLAS_GATHER", flag)
        removed, (xs, ys, rho, sep) = cupc._run_level_local(
            C_dev, G, 2, 0.9, want_rho=False
        )
        assert rho is None
        out[flag] = (removed, xs, ys, sep)
    ra, xa, ya, sa = out["0"]
    rb, xb, yb, sb = out["1"]
    # the case must actually exercise slots > 255 (neighbour list is
    # 1..270, so variable index == slot + 1)
    assert (sa > 256).any()
    assert np.array_equal(ra, rb)
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)
    assert np.array_equal(sa, sb)


def test_gather_threshold_is_traced_not_baked(monkeypatch):
    """A second skeleton run with a DIFFERENT alpha in the same process
    must not reuse the first run's rho threshold from the fused-kernel jit
    cache (ADVICE r4: the cache key omitted the baked threshold)."""
    from cigwas_tpu.ops.pallas import panel_gather as pg
    from cigwas_tpu.skeleton import cupc

    rng = np.random.default_rng(11)
    v = 256
    C = (0.4 * rng.normal(size=(v, v))).astype(np.float32)
    C = ((C + C.T) / 2).astype(np.float32)
    np.fill_diagonal(C, 1.0)
    G = np.zeros((v, v), np.int32)
    G[0, 1:65] = 1
    G[1:65, 0] = 1
    C_dev = jnp.asarray(C)
    pg._FUSED_CACHE.clear()

    def run(flag, th):
        monkeypatch.setattr(cupc, "PALLAS_GATHER", flag)
        removed, (xs, ys, _, sep) = cupc._run_level_local(
            C_dev, G, 2, th, want_rho=False
        )
        return removed, xs, ys, sep

    # first call populates the fused cache with the loose threshold
    loose = run("1", 0.9)
    assert loose[1].size > 0
    # the tight-threshold rerun must decide with ITS OWN threshold
    tight_pallas = run("1", 1e-6)
    tight_xla = run("0", 1e-6)
    assert np.array_equal(tight_pallas[0], tight_xla[0])
    assert np.array_equal(tight_pallas[1], tight_xla[1])
    assert np.array_equal(tight_pallas[3], tight_xla[3])


def test_skeleton_route_parity_pallas_gather(monkeypatch):
    """skeleton() with the Pallas gather route forced (interpret mode on
    CPU) is byte-identical to the XLA-gather route — adjacency, sepsets,
    and final level (the gather only changes WHERE values come from)."""
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.utils.stats import threshold_array

    rng = np.random.default_rng(5)
    v, n = 96, 900
    # AR(1)-correlated panel so level >= 2 sees degrees >= 32 (the route
    # gate's minimum width)
    L = rng.normal(size=(v, n))
    for i in range(1, v):
        L[i] = 0.92 * L[i - 1] + np.sqrt(1 - 0.92**2) * L[i]
    C = np.corrcoef(L).astype(np.float32)
    vp = 128
    Cp = np.zeros((vp, vp), np.float32)
    Cp[:v, :v] = C
    np.fill_diagonal(Cp, 1.0)
    th = threshold_array(n, 1e-2)

    # force the host loop (not the device-resident loop) so the gather
    # route is reachable, then compare both gather settings
    monkeypatch.setattr(cupc, "DEV_RESIDENT_MAX", 0)
    monkeypatch.setattr(cupc, "PALLAS_SWEEP", "0")
    results = {}
    for flag in ("0", "1"):
        monkeypatch.setattr(cupc, "PALLAS_GATHER", flag)
        results[flag] = cupc.skeleton(
            jnp.asarray(Cp), th, 5, n_var=v, want_pmax=False
        )
    a, b = results["0"], results["1"]
    assert a.final_level >= 2  # levels the gather route serves must run
    assert a.final_level == b.final_level
    assert np.array_equal(a.G, b.G)
    assert np.array_equal(a.sepset, b.sepset)


@pytest.mark.parametrize("want_pmax", [False, True])
def test_skeleton_route_parity_pallas_fused_sweep(monkeypatch, want_pmax):
    """skeleton() with the FUSED gather+sweep kernel forced (interpret
    mode on CPU) matches the XLA route exactly — the kernel runs the
    shared `_pair_sweep_chunk` arithmetic on bit-identical gathered
    panels, with per-node dynamic chunk bounds that skip only fully
    masked work (VERDICT r4 #2)."""
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.utils.stats import threshold_array

    rng = np.random.default_rng(5)
    v, n = 96, 900
    L = rng.normal(size=(v, n))
    for i in range(1, v):
        L[i] = 0.92 * L[i - 1] + np.sqrt(1 - 0.92**2) * L[i]
    C = np.corrcoef(L).astype(np.float32)
    vp = 128
    Cp = np.zeros((vp, vp), np.float32)
    Cp[:v, :v] = C
    np.fill_diagonal(Cp, 1.0)
    th = threshold_array(n, 1e-2)

    monkeypatch.setattr(cupc, "DEV_RESIDENT_MAX", 0)
    monkeypatch.setattr(cupc, "PALLAS_GATHER", "0")
    results = {}
    for flag in ("0", "1"):
        monkeypatch.setattr(cupc, "PALLAS_SWEEP", flag)
        results[flag] = cupc.skeleton(
            jnp.asarray(Cp), th, 5, n_var=v, want_pmax=want_pmax
        )
    a, b = results["0"], results["1"]
    assert a.final_level >= 2
    assert a.final_level == b.final_level
    assert np.array_equal(a.G, b.G)
    assert np.array_equal(a.sepset, b.sepset)
    if want_pmax:
        assert np.array_equal(a.pmax, b.pmax)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_rowsweep_scattered_neighbours_matches_xla(l):
    """The row-DMA gather+sweep kernel serves nodes whose neighbour spans
    fit NO window (chance correlations at genome scale); outputs must
    match the XLA local sweeps exactly — scattered neighbours, NaNs and
    pad slots included."""
    from cigwas_tpu.ops import pcorr as pcorr_ops
    from cigwas_tpu.ops.pallas.panel_gather import plan_window, rowsweep_apply

    rng = np.random.default_rng(21)
    vp, nt, d = 2176, 9, 64
    C = (0.4 * rng.normal(size=(vp, vp))).astype(np.float32)
    C = ((C + C.T) / 2).astype(np.float32)
    C[rng.random((vp, vp)) < 0.005] = np.nan
    np.fill_diagonal(C, 1.0)
    nbrs = np.sort(rng.choice(vp, size=(nt, d), replace=True), axis=1).astype(
        np.int32
    )  # full-panel spans
    node_ixs = rng.integers(0, vp, nt).astype(np.int32)
    deg = rng.integers(max(4, d // 2), d + 1, nt).astype(np.int32)
    sl = np.arange(d)[None, :]
    nbrs = np.where(sl < deg[:, None], nbrs, 0)
    assert plan_window(node_ixs, nbrs, deg, vp) is None  # no window fits

    ct = 16 if l == 2 else 8
    got = rowsweep_apply(C, node_ixs, nbrs, deg, l, ct, 0.5, True,
                         interpret=True)
    packed = np.asarray(got)
    rho_k = packed[:, :, 0]
    pos_k = packed[:, :, 1:].astype(np.int32)
    C_dev = jnp.asarray(C)
    if l == 1:
        rho_x, pos_x = pcorr_ops.level1_local_sweep(
            C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs), jnp.asarray(deg))
        pos_x = np.asarray(pos_x)[:, :, None]
    elif l == 2:
        rho_x, pos_x = pcorr_ops.level2_local_sweep(
            C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs), jnp.asarray(deg),
            ct)
    else:
        rho_x, pos_x = pcorr_ops.level3_local_sweep(
            C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs), jnp.asarray(deg),
            ct)
    rho_x = np.asarray(rho_x)
    pos_x = np.asarray(pos_x).reshape(nt, d, l)
    valid = np.arange(d)[None, :] < deg[:, None]
    # positions (the sepset decisions) must be bit-exact; rho may drift
    # HERE ONLY because XLA:CPU contracts the sweep's a*b - c*d into FMA
    # differently across the interpret-mode kernel and the jitted XLA
    # sweep — a 1-ULP operand perturbation that cancellation amplifies on
    # near-zero rho (measured <= 3e-8 absolute, positions identical). On
    # the TPU the compiled kernel is bit-identical to the XLA route
    # (scripts/probe_r5_rowsweep.py).
    assert np.array_equal(pos_k[valid], pos_x[valid])
    np.testing.assert_allclose(
        rho_k[valid], rho_x[valid], rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("l", [1, 2])
def test_level_local_rowsweep_route_decision_parity(l, monkeypatch):
    """`_run_level_local{1,}` with scattered-span nodes (no window fits)
    must route them through the row-DMA kernel when the Pallas routes are
    on, and the DECISIONS (removals, sepset positions) must match the
    XLA route exactly."""
    from cigwas_tpu.ops.pallas import panel_gather as pg
    from cigwas_tpu.skeleton import cupc

    rng = np.random.default_rng(33)
    v, hubs, dh = 2176, 48, 40
    C = (0.25 * rng.normal(size=(v, v))).astype(np.float32)
    C = ((C + C.T) / 2).astype(np.float32)
    np.fill_diagonal(C, 1.0)
    G = np.zeros((v, v), np.int32)
    hub_ix = rng.choice(v, hubs, replace=False)
    for h in hub_ix:
        nb = rng.choice(v, dh, replace=False)
        nb = nb[nb != h]
        G[h, nb] = 1
        G[nb, h] = 1
    C_dev = jnp.asarray(C)
    th = 0.15

    def run(gflag, sflag):
        monkeypatch.setattr(cupc, "PALLAS_GATHER", gflag)
        monkeypatch.setattr(cupc, "PALLAS_SWEEP", sflag)
        if l == 1:
            return cupc._run_level_local1(C_dev, G, th, want_rho=False)
        return cupc._run_level_local(C_dev, G, l, th, want_rho=False)

    n_row_keys = lambda: sum(
        1 for k in pg._SWEEP_CACHE if k[0] == "rowsweep"
    )
    before = n_row_keys()
    ra, ta = run("0", "0")
    assert n_row_keys() == before
    rb, tb = run("1", "1")
    assert n_row_keys() > before  # the row-DMA kernel actually fired
    # gather disabled, sweep on: the span split must still route the
    # scattered group to the row kernel (not sink it to the XLA fallback
    # through a windowed plan that cannot fit)
    calls = []
    orig = pg.rowsweep_apply
    monkeypatch.setattr(
        pg, "rowsweep_apply",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )
    rc, _ = run("0", "1")
    assert calls  # the row kernel fired without the gather route
    np.testing.assert_array_equal(ra, rc)
    # _run_level_local1 returns (xs, ys, sep, rho); _run_level_local
    # returns (xs, ys, rho, sep)
    if l == 1:
        (xa, ya, sa, _), (xb, yb, sb, _) = ta, tb
    else:
        (xa, ya, _, sa), (xb, yb, _, sb) = ta, tb
    assert np.array_equal(ra, rb)
    oa, ob = np.lexsort((ya, xa)), np.lexsort((yb, xb))
    assert np.array_equal(xa[oa], xb[ob])
    assert np.array_equal(ya[oa], yb[ob])
    assert np.array_equal(np.asarray(sa)[oa], np.asarray(sb)[ob])
