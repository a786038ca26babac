"""Pallas DMA local-panel gather: the level >= 2 hot-path feeder.

Every level >= 2 kernel consumes per-node LOCAL panels

    Cb[i] = C[nbrs[i, :, None], nbrs[i, None, :]]   (nt, d, d)
    qb[i] = C[node_ixs[i], nbrs[i]]                 (nt, d)

The XLA gather that builds them reads d^2 scattered f32 elements per node
and runs at ~2.4 GB/s effective on the v5e (README "Pallas findings") —
the measured bound on levels 2/3 of a production block (the reference's
equivalent per-thread reads are `cuPC-S.cu:584-871`, served by the GPU's
L2). This kernel exploits the structure the XLA gather ignores: in LD
data a node's neighbours cluster in a CONTIGUOUS marker window, so

* one grid program per node issues ONE aligned 2-D DMA of the (W, W)
  panel window covering the node's neighbour span (both dims 128-aligned,
  which the (8, 128) HBM tiling requires — single scattered rows are not
  DMA-able at all),
* the row and column selections run on the MXU as one-hot matmuls:
  out = R @ window @ S with R[j, l] = (base + l == rowix[j]) and
  S[l, k] = (base + l == nbrs[k]). A one-hot dot accumulates exactly one
  nonzero term, so the gathered VALUES are bit-identical to the XLA
  gather. NaNs (which the panel carries for undefined correlations and
  which a NaN*0 term would smear across the dot) ride a parallel 0/1
  count matmul and are re-inserted afterwards,
* per node this moves W^2 * 4 bytes (1 MB at W=512) sequentially instead
  of d^2 scattered element reads — and W adapts per launch to the widest
  span in the tile (pow2 bucket, fallback to the XLA gather when a span
  exceeds MAX_W).

The sweep math itself stays in the existing jitted `*_local_sweep_pre` /
`level_scan_minrho_pre` consumers, so adjacency decisions cannot drift:
this kernel only changes WHERE the same f32 values come from.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_W = 256
# (W, W) f32 window must fit VMEM next to the one-hots and outputs
MAX_W = 1024


def plan_window(node_ixs, nbrs, deg, vp: int):
    """Host-side launch plan: (base (nt,) int32, W, nbrs_w) or None.

    base[i] is the 128-aligned window start covering node i's VALID
    neighbours and its own row; W is the smallest pow2 window (>= MIN_W,
    <= MAX_W) that covers every node's span. Pad slots (nbrs[i, j] with
    j >= deg[i], stored as 0 by `_compact_neighbors`) would wreck the span,
    so nbrs_w remaps them to the node's own index — every consumer masks
    pad slots by deg, so gathered pad VALUES are never read.
    Returns None when any span exceeds MAX_W (caller falls back to the
    XLA gather).
    """
    node_ixs = np.asarray(node_ixs, dtype=np.int32)
    nbrs = np.asarray(nbrs, dtype=np.int32)
    deg = np.asarray(deg, dtype=np.int32)
    nt, d = nbrs.shape
    valid = np.arange(d)[None, :] < deg[:, None]
    nbrs_w = np.where(valid, nbrs, node_ixs[:, None]).astype(np.int32)
    lo = np.minimum(nbrs_w.min(axis=1), node_ixs)
    hi = np.maximum(nbrs_w.max(axis=1), node_ixs)
    base = (lo // 128) * 128
    span = int((hi - base).max()) + 1 if nt else 1
    # W in multiples of 256 (not pow2): a 527-wide span costs a 768
    # window instead of 1024 — DMA bytes scale with W^2
    W = max(MIN_W, -(-span // 256) * 256)
    if W > vp:
        # a small panel between buckets: the whole panel is the window
        # (vp is a multiple of 128 by the shape buckets)
        W = vp
    if W > MAX_W or span > W:
        return None
    base = np.minimum(base, max(vp - W, 0)).astype(np.int32)
    return base, W, nbrs_w


def _window_kernel(base_ref, nbr_ref, C_hbm, Cb_ref, qb_ref, win_buf, sem,
                   *, d: int, W: int):
    """Double-buffered across grid steps: TPU grid programs run
    sequentially on the core and scratch persists, so program i waits on
    the window DMA program i-1 started for it and prefetches i+1's."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    def win_dma(slot, node):
        b = pl.multiple_of(base_ref[node], 128)  # bases are 128-aligned
        return pltpu.make_async_copy(
            C_hbm.at[pl.ds(b, W), pl.ds(b, W)], win_buf.at[slot], sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        # slot (i+1) % 2 was last read by program i-1, which has finished
        win_dma((i + 1) % 2, i + 1).start()

    nbr = nbr_ref[0, 0, :d]      # (d,) neighbour ids
    rowix = nbr_ref[0, 1, :]     # (d + 8,) = [nbrs, node_ix, pads]
    b = pl.multiple_of(base_ref[i], 128)
    l_ids_r = jax.lax.broadcasted_iota(jnp.int32, (d + 8, W), 1) + b
    R = (l_ids_r == rowix[:, None]).astype(jnp.float32)  # (d+8, W)
    l_ids_c = jax.lax.broadcasted_iota(jnp.int32, (W, d), 0) + b
    S = (l_ids_c == nbr[None, :]).astype(jnp.float32)  # (W, d)

    win_dma(i % 2, i).wait()
    win = win_buf[i % 2]
    isn = jnp.isnan(win)
    # HIGHEST precision is REQUIRED for bit-identity: the default single
    # bf16 MXU pass rounds the gathered f32 values; the multi-pass f32
    # scheme is exact for one-hot selections (0/1 operands are exact and
    # the hi/lo split reassembles the f32 value)
    hi = jax.lax.Precision.HIGHEST
    t_val = jnp.dot(R, jnp.where(isn, 0.0, win), precision=hi,
                    preferred_element_type=jnp.float32)  # (d+8, W)
    t_nan = jnp.dot(R, isn.astype(jnp.float32), precision=hi,
                    preferred_element_type=jnp.float32)
    val = jnp.dot(t_val, S, precision=hi,
                  preferred_element_type=jnp.float32)  # (d+8, d)
    nan = jnp.dot(t_nan, S, precision=hi,
                  preferred_element_type=jnp.float32)
    out = jnp.where(nan > 0.5, jnp.float32(jnp.nan), val)
    Cb_ref[0] = out[:d]
    qb_ref[0, 0] = out[d]


def _gather_core(C, base, rowix, nbrs2, W: int, interpret: bool):
    """Traceable core (no jit): builds the pallas_call so callers can fuse
    a consumer into the SAME dispatch (the remote relay charges ~0.1-1 s
    per dispatch, which an extra gather->consumer hop would double)."""
    nt = base.shape[0]
    d = nbrs2.shape[-1] - 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2, d + 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # C stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, d, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    Cb, qb = pl.pallas_call(
        partial(_window_kernel, d=d, W=W),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, d, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(base, jnp.stack([nbrs2, rowix], axis=1), C)
    return Cb, qb[:, 0, :]


def _plan_inputs(C, node_ixs, nbrs, deg):
    vp = int(C.shape[0])
    plan = plan_window(node_ixs, nbrs, deg, vp)
    if plan is None:
        return None
    base, W, nbrs_w = plan
    nt, d = nbrs_w.shape
    # rowix rows: [nbrs | node_ix | repeats] so the kernel's (d+8) one-hot
    # covers qb's row too (the 7 repeat slots are discarded)
    rowix = np.concatenate(
        [nbrs_w, np.repeat(np.asarray(node_ixs, np.int32)[:, None], 8, axis=1)],
        axis=1,
    )
    nbrs2 = np.concatenate(
        [nbrs_w, np.zeros((nt, 8), np.int32)], axis=1
    )  # padded to d+8 lanes to match rowix's shape
    return base, W, rowix, nbrs2


_FUSED_CACHE: dict = {}


def gather_apply(C, node_ixs, nbrs, deg, consumer, key, extra=(),
                 interpret: bool = False):
    """Run ``consumer(Cb, qb, deg, *extra)`` with the windowed gather fused
    into ONE jitted dispatch (measured at the 11k block: a separate
    gather->consumer hop costs an extra relay dispatch PER LAUNCH and
    erases the gather's 4.3x win). ``key`` identifies the consumer (+ its
    static config) in the jit cache. Returns None when no window plan
    exists (caller falls back to the XLA route)."""
    plan = _plan_inputs(C, node_ixs, nbrs, deg)
    if plan is None:
        return None
    base, W, rowix, nbrs2 = plan
    cache_key = (key, W, interpret)
    fn = _FUSED_CACHE.get(cache_key)
    if fn is None:
        def fused(C_, base_, rowix_, nbrs2_, deg_, *extra_):
            Cb, qb = _gather_core(C_, base_, rowix_, nbrs2_, W, interpret)
            return consumer(Cb, qb, deg_, *extra_)

        fn = jax.jit(fused)
        _FUSED_CACHE[cache_key] = fn
    return fn(
        C, jnp.asarray(base), jnp.asarray(rowix), jnp.asarray(nbrs2),
        jnp.asarray(np.asarray(deg)), *extra,
    )


def _dyn_pair_sweep(Cb, qb, deg_x, t_hi, y_excl, ct: int):
    """`pcorr._pair_sweep` with a DYNAMIC chunk bound: chunks whose t
    range lies entirely past min(deg, t_hi) contribute only the RHO_BIG
    sentinel, so skipping them is decision-identical — and per-node work
    becomes proportional to the node's true degree instead of the bucket
    width (the XLA route cannot do this profitably; inside a Mosaic
    kernel the bound is a cheap scalar loop). Chunk rows are selected by
    an exact one-hot dot (Mosaic cannot dynamic-slice values; a one-hot
    f32 HIGHEST dot reproduces the rows bit-for-bit, the same argument as
    the gather's selection matmuls)."""
    from cigwas_tpu.ops import pcorr as pcorr_ops

    d = Cb.shape[0]
    t_cap = jnp.minimum(deg_x, t_hi)
    n_chunks = (jnp.minimum(jnp.maximum(t_cap, 1), d) + (ct - 1)) // ct

    def chunk(i, carry):
        rho0, tp0, sp0 = carry
        t0 = i * ct
        # single-nonzero masked sums, NOT a one-hot dot: the panel carries
        # deliberate NaNs and NaN * 0 would smear through a dot. The 3-D
        # mask is built from 3-D iotas directly (reshaping an i1 vector is
        # unsupported under Mosaic)
        E3 = (
            jax.lax.broadcasted_iota(jnp.int32, (ct, d, d), 1)
            == t0 + jax.lax.broadcasted_iota(jnp.int32, (ct, d, d), 0)
        )
        Ct = jnp.sum(
            jnp.where(E3, Cb[None, :, :], 0.0), axis=1
        )  # (ct, d)
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (ct, d), 1)
            == t0 + jax.lax.broadcasted_iota(jnp.int32, (ct, d), 0)
        )
        qt = jnp.sum(jnp.where(E, qb[None, :], 0.0), axis=1)
        rmin, tl, sl = pcorr_ops._pair_sweep_chunk(
            Cb, qb, Ct, qt, deg_x, t_cap, y_excl, t0, ct
        )
        better = rmin < rho0
        return (
            jnp.where(better, rmin, rho0),
            jnp.where(better, tl, tp0),
            jnp.where(better, sl, sp0),
        )

    init = (
        jnp.full((d,), pcorr_ops.RHO_BIG, jnp.float32),
        jnp.zeros((d,), jnp.float32),
        jnp.zeros((d,), jnp.float32),
    )
    # positions stay f32 (see _pair_sweep_chunk): exact, and int32
    # sublane vectors miscompile on the kernel's output relayout
    return jax.lax.fori_loop(0, n_chunks, chunk, init)


def _sweep_kernel(sc_ref, nbr_ref, C_hbm, rho_ref, pos_ref, win_buf, sem,
                  *, d: int, W: int, l: int, ct: int, nbuf: int):
    """Windowed gather + level-l local sweep fused in ONE kernel: the
    (d, d) local panel never leaves VMEM and one launch covers a whole
    degree bucket (the XLA route's LOCAL_ELEM_BUDGET tile cap forced ~22
    launches per level at the 11k block — launch issue on the remote
    relay, not compute, was the deep-level wall; VERDICT r4 #2)."""
    from cigwas_tpu.ops import pcorr as pcorr_ops

    i = pl.program_id(0)
    nt = pl.num_programs(0)

    def win_dma(slot, node):
        b = pl.multiple_of(sc_ref[0, node], 128)
        return pltpu.make_async_copy(
            C_hbm.at[pl.ds(b, W), pl.ds(b, W)], win_buf.at[slot], sem.at[slot]
        )

    if nbuf == 2:
        @pl.when(i == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            win_dma((i + 1) % 2, i + 1).start()
    else:
        # single-buffered at the largest windows: the sweep compute per
        # node dwarfs the DMA, and a second W=1024 buffer blows the 16 MB
        # scoped-VMEM limit (measured OOM at the 11k block)
        win_dma(0, i).start()

    nbr = nbr_ref[0, 0, :d]
    rowix = nbr_ref[0, 1, :]
    b = pl.multiple_of(sc_ref[0, i], 128)
    l_ids_r = jax.lax.broadcasted_iota(jnp.int32, (d + 8, W), 1) + b
    R = (l_ids_r == rowix[:, None]).astype(jnp.float32)
    l_ids_c = jax.lax.broadcasted_iota(jnp.int32, (W, d), 0) + b
    S = (l_ids_c == nbr[None, :]).astype(jnp.float32)

    win_dma(i % nbuf, i).wait()
    win = win_buf[i % nbuf]
    isn = jnp.isnan(win)
    hi = jax.lax.Precision.HIGHEST
    t_val = jnp.dot(R, jnp.where(isn, 0.0, win), precision=hi,
                    preferred_element_type=jnp.float32)
    t_nan = jnp.dot(R, isn.astype(jnp.float32), precision=hi,
                    preferred_element_type=jnp.float32)
    val = jnp.dot(t_val, S, precision=hi, preferred_element_type=jnp.float32)
    nan = jnp.dot(t_nan, S, precision=hi, preferred_element_type=jnp.float32)
    out = jnp.where(nan > 0.5, jnp.float32(jnp.nan), val)
    Cb = out[:d]
    qb = out[d]
    deg_i = sc_ref[1, i]
    _sweep_tail(Cb, qb, deg_i, rho_ref, pos_ref, d=d, l=l, ct=ct)


def _sweep_tail(Cb, qb, deg_i, rho_ref, pos_ref, *, d: int, l: int, ct: int):
    """The level-l in-kernel sweep on a gathered (d, d) local panel —
    shared by the windowed-DMA and row-DMA gather kernels."""
    if l == 1:
        # single-conditioning sweep, the in-kernel form of
        # `level1_local_sweep_pre` (same pre-scaled expression; masked-iota
        # min = its argmin): rho[s, y] = |c_xy R_xs R_ys - P_xs P_ys|.
        # Index tensors are broadcasted_iota (a 1-D arange reshaped onto
        # sublanes miscompiles under Mosaic — measured all-zero positions)
        from cigwas_tpu.ops import pcorr as pcorr_ops

        s_i2 = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        y_i2 = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        Rc = jax.lax.rsqrt(jnp.abs(1.0 - Cb * Cb))  # (s, y)
        Pc = Cb * Rc
        Rq = jax.lax.rsqrt(jnp.abs(1.0 - qb * qb))  # (s,)
        Pq = qb * Rq
        rho2 = jnp.abs(qb[None, :] * (Rq[:, None] * Rc) - Pq[:, None] * Pc)
        bad = (s_i2 >= deg_i) | (s_i2 == y_i2)
        rho2 = jnp.where(bad | ~jnp.isfinite(rho2), pcorr_ops.RHO_BIG, rho2)
        rho_k = jnp.min(rho2, axis=0, keepdims=True)  # (1, y)
        # f32 iota min: int32 sublane-axis min reductions miscompile under
        # Mosaic (measured all-zero positions); f32 is exact here
        pos = jnp.min(
            jnp.where(rho2 == rho_k, s_i2.astype(jnp.float32),
                      jnp.float32(d)), axis=0
        )
        rho_ref[0, 0] = rho_k[0]
        pos_ref[0, 0] = pos
    elif l == 2:
        rho, tp, sp = _dyn_pair_sweep(
            Cb, qb, deg_i, jnp.int32(d), jnp.int32(d), ct
        )
        rho_ref[0, 0] = rho
        pos_ref[0, 0] = sp
        pos_ref[0, 1] = tp
    else:
        def outer(u, carry):
            rho0, p3, p2, p1 = carry
            # row u of the panel via an exact single-nonzero masked sum
            # (no dynamic value indexing under Mosaic)
            row_oh = (
                jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) == u
            )
            cu = jnp.sum(jnp.where(row_oh, Cb, 0.0), axis=0)  # (d,)
            qu = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (1, d), 1) == u,
                    qb[None, :], 0.0,
                )
            )
            Ru = jax.lax.rsqrt(jnp.abs(1.0 - cu * cu))
            T1 = (Cb - cu[:, None] * cu[None, :]) * (Ru[:, None] * Ru[None, :])
            q1 = (qb - qu * cu) * (jax.lax.rsqrt(jnp.abs(1.0 - qu * qu)) * Ru)
            rmin, tb, sb = _dyn_pair_sweep(T1, q1, deg_i, u, u, ct)
            better = (rmin < rho0) & (u < deg_i)
            return (
                jnp.where(better, rmin, rho0),
                jnp.where(better, u.astype(jnp.float32), p3),
                jnp.where(better, tb, p2),
                jnp.where(better, sb, p1),
            )

        from cigwas_tpu.ops import pcorr as pcorr_ops
        init = (
            jnp.full((d,), pcorr_ops.RHO_BIG, jnp.float32),
            jnp.zeros((d,), jnp.float32),
            jnp.zeros((d,), jnp.float32),
            jnp.zeros((d,), jnp.float32),
        )
        # dynamic bound: u >= deg contributes nothing (masked by `better`)
        rho, p3, p2, p1 = jax.lax.fori_loop(
            2, jnp.maximum(jnp.minimum(deg_i, d), 2), outer, init
        )
        rho_ref[0, 0] = rho
        pos_ref[0, 0] = p1
        pos_ref[0, 1] = p2
        pos_ref[0, 2] = p3


ROW_CHUNK = 8
COL_BLOCK = 1024


def _row_gather_panel(sc_ref, nbv_ref, C1d, rows_buf, cb_buf, sem,
                      *, d: int, vp: int):
    """Shared row-DMA gather loop: fills ``cb_buf`` (d+8, d) with the
    node's local panel (rows = rowix entries of sc_ref, columns selected
    by the one-hot matmul).

    One DMA per NEIGHBOUR ROW — no span constraint at all. Chance
    correlations above the level-0 threshold give ~every node at a
    genome-scale block a far-flung neighbour (measured: zero 11k-block
    nodes fit a 1024-wide window at level 1), which defeats the windowed
    kernel AND the XLA element gather (~0.2 GB/s effective). Mosaic
    rejects single-row slices of a (8, 128)-tiled 2-D array, so rows ride
    a 1-D VIEW of C with vp-aligned offsets into a 1-D landing buffer
    (measured 95 GB/s effective at the 11k shape — DMA-issue bound,
    scripts/probe_r5_rowgather.py); the column selection is the same
    exact one-hot matmul as the windowed kernel, blocked over vp so VMEM
    holds only ROW_CHUNK rows. Bit-identical to the XLA gather (NaNs via
    the parallel count matmul).

    ``sc_ref`` is a per-step (1, d + 9) SMEM WINDOW of the index table,
    not a scalar-prefetch operand: a program only reads ITS OWN row, and
    whole-table prefetch put nt * (d + 9) int32 in SMEM — an uncapped
    16384-node launch at the 11k block asked for 16 MB of the ~1 MB SMEM
    and failed to compile. The window keeps SMEM at ~2 KB for any nt.
    """
    n_rch = (d + 8) // ROW_CHUNK
    nbr = nbv_ref[0, 0, :d]

    def row_dma(slot, r_global):
        idx = sc_ref[0, 0, r_global]
        return pltpu.make_async_copy(
            C1d.at[pl.ds(idx * vp, vp)],
            rows_buf.at[pl.ds(slot * vp, vp)],
            sem.at[slot],
        )

    # prime the first chunk's row DMAs (double-buffered chunks)
    for r in range(ROW_CHUNK):
        row_dma(r, r).start()

    def chunk(k, carry):
        # prefetch chunk k+1 while selecting chunk k
        @pl.when(k + 1 < n_rch)
        def _():
            for r in range(ROW_CHUNK):
                row_dma(ROW_CHUNK * ((k + 1) % 2) + r,
                        (k + 1) * ROW_CHUNK + r).start()

        slot0 = ROW_CHUNK * (k % 2)
        for r in range(ROW_CHUNK):
            # reconstruct the EXACT start descriptor: interpret mode
            # performs the copy at wait() using the descriptor given
            row_dma(slot0 + r, k * ROW_CHUNK + r).wait()
        rows = rows_buf[pl.ds(slot0 * vp, ROW_CHUNK * vp)].reshape(
            ROW_CHUNK, vp
        )
        isn = jnp.isnan(rows)
        rows0 = jnp.where(isn, 0.0, rows)
        isnf = isn.astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        val = jnp.zeros((ROW_CHUNK, d), jnp.float32)
        nan = jnp.zeros((ROW_CHUNK, d), jnp.float32)
        for b0 in range(0, vp, COL_BLOCK):
            cb = min(COL_BLOCK, vp - b0)
            S = (
                jax.lax.broadcasted_iota(jnp.int32, (cb, d), 0) + b0
                == nbr[None, :]
            ).astype(jnp.float32)
            val = val + jnp.dot(rows0[:, b0 : b0 + cb], S, precision=hi,
                                preferred_element_type=jnp.float32)
            nan = nan + jnp.dot(isnf[:, b0 : b0 + cb], S, precision=hi,
                                preferred_element_type=jnp.float32)
        out = jnp.where(nan > 0.5, jnp.float32(jnp.nan), val)
        cb_buf[pl.ds(k * ROW_CHUNK, ROW_CHUNK), :] = out
        return carry

    jax.lax.fori_loop(0, n_rch, chunk, 0, unroll=False)


def _rowsweep_kernel(sc_ref, nbv_ref, C1d, rho_ref, pos_ref, rows_buf,
                     cb_buf, sem, *, d: int, vp: int, l: int, ct: int):
    """Row-DMA gather + level-l sweep fused in one kernel (the windowed
    `_sweep_kernel`'s scattered-span sibling)."""
    _row_gather_panel(sc_ref, nbv_ref, C1d, rows_buf, cb_buf, sem,
                      d=d, vp=vp)
    Cb = cb_buf[:d, :]
    qb = cb_buf[d, :]
    deg_i = sc_ref[0, 0, d + 8]
    _sweep_tail(Cb, qb, deg_i, rho_ref, pos_ref, d=d, l=l, ct=ct)


def _rowgather2_kernel(sc_ref, nbv_ref, C1d, N1d, Cb_ref, qb_ref, Nb_ref,
                       nr_ref, rows_buf, cb_buf, sem, *, d: int, vp: int):
    """Row-DMA gather of TWO panels' local blocks in ONE kernel (hetcor
    consumes matched correlation + per-pair-ESS panels; a second gather
    dispatch per launch costs a relay round trip)."""
    _row_gather_panel(sc_ref, nbv_ref, C1d, rows_buf, cb_buf, sem,
                      d=d, vp=vp)
    Cb_ref[0] = cb_buf[:d, :]
    qb_ref[0, 0] = cb_buf[d, :]
    _row_gather_panel(sc_ref, nbv_ref, N1d, rows_buf, cb_buf, sem,
                      d=d, vp=vp)
    Nb_ref[0] = cb_buf[:d, :]
    nr_ref[0, 0] = cb_buf[d, :]


def _row_grid_spec(nt: int, d: int, vp: int, out_specs, n_panels: int = 1):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            # per-step SMEM window of the DMA index table (see
            # _row_gather_panel: whole-table scalar prefetch blew SMEM);
            # 3-D so the (1, d + 9) window passes the block-shape rule
            pl.BlockSpec((1, 1, d + 9), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_panels,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * ROW_CHUNK * vp,), jnp.float32),
            pltpu.VMEM((d + 8, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * ROW_CHUNK,)),
        ],
    )


def _rowsweep_core(C, scalars, nbrs2, l: int, ct: int, interpret: bool):
    nt = scalars.shape[0]
    d = nbrs2.shape[-1] - 8
    vp = int(C.shape[0])
    grid_spec = _row_grid_spec(nt, d, vp, (
        pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ))
    rho, pos = pl.pallas_call(
        partial(_rowsweep_kernel, d=d, vp=vp, l=l, ct=ct),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, l, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars.reshape(nt, 1, d + 9), nbrs2[:, :d].reshape(nt, 1, d),
      C.reshape(vp * vp))
    return rho[:, 0, :], jnp.transpose(pos, (0, 2, 1))


def _row_inputs(node_ixs, nbrs, deg):
    node_ixs = np.asarray(node_ixs, dtype=np.int32)
    nbrs = np.asarray(nbrs, dtype=np.int32)
    deg = np.asarray(deg, dtype=np.int32)
    nt, d = nbrs.shape
    valid = np.arange(d)[None, :] < deg[:, None]
    nbrs_w = np.where(valid, nbrs, node_ixs[:, None]).astype(np.int32)
    # scalar rows: [nbrs | node_ix x8 | deg] — DMA row ids then degree
    rowix = np.concatenate(
        [nbrs_w, np.repeat(node_ixs[:, None], 8, axis=1)], axis=1
    )
    scalars = np.concatenate([rowix, deg[:, None]], axis=1)  # (nt, d+9)
    nbrs2 = np.concatenate([nbrs_w, np.zeros((nt, 8), np.int32)], axis=1)
    return scalars, nbrs2, deg


def rowsweep_apply(C, node_ixs, nbrs, deg, l: int, ct: int, rho_threshold,
                   want_rho: bool, interpret: bool = False):
    """Row-DMA gather+sweep launch (any neighbour spans); output formats
    identical to :func:`sweep_apply`."""
    scalars, nbrs2, deg = _row_inputs(node_ixs, nbrs, deg)
    nt, d = np.asarray(nbrs).shape
    lean = (not want_rho) and d <= 256
    cache_key = ("rowsweep", l, ct, int(C.shape[0]), d, nt, lean, interpret)
    fn = _SWEEP_CACHE.get(cache_key)
    if fn is None:
        def fused(C_, scalars_, nbrs2_, rho_th_):
            rho, pos = _rowsweep_core(C_, scalars_, nbrs2_, l, ct,
                                      interpret)
            if lean:
                hit = jnp.packbits(rho < rho_th_, axis=1)
                return hit, pos.astype(jnp.uint8)
            return jnp.concatenate([rho[:, :, None], pos], axis=2)

        fn = jax.jit(fused)
        _SWEEP_CACHE[cache_key] = fn
    return fn(
        C, jnp.asarray(scalars), jnp.asarray(nbrs2),
        jnp.float32(rho_threshold),
    )


def _rowgather2_core(C, N, scalars, nbrs2, interpret: bool):
    """Traceable TWO-panel row-DMA gather: ((Cb, qb), (Nb, nr))."""
    nt = scalars.shape[0]
    d = nbrs2.shape[-1] - 8
    vp = int(C.shape[0])
    grid_spec = _row_grid_spec(nt, d, vp, (
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ), n_panels=2)
    Cb, qb, Nb, nr = pl.pallas_call(
        partial(_rowgather2_kernel, d=d, vp=vp),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, d, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, d, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars.reshape(nt, 1, d + 9), nbrs2[:, :d].reshape(nt, 1, d),
      C.reshape(vp * vp), N.reshape(vp * vp))
    return Cb, qb[:, 0, :], Nb, nr[:, 0, :]


def rowgather2_apply(C, N, node_ixs, nbrs, deg, consumer, key, extra=(),
                     interpret: bool = False):
    """Run ``consumer(Cb, qb, Nb, nr, deg, *extra)`` on row-DMA-gathered
    local panels of TWO matched arrays in ONE jitted dispatch (the hetcor
    path needs both the correlation and per-pair-ESS panels; separate
    gather dispatches each cost a relay round trip)."""
    scalars, nbrs2, deg = _row_inputs(node_ixs, nbrs, deg)
    nt, d = np.asarray(nbrs).shape
    vp = int(C.shape[0])
    cache_key = (key, "rowapply2", vp, d, nt, interpret)
    fn = _FUSED_CACHE.get(cache_key)
    if fn is None:
        def fused(C_, N_, scalars_, nbrs2_, deg_, *extra_):
            Cb, qb, Nb, nr = _rowgather2_core(C_, N_, scalars_, nbrs2_,
                                              interpret)
            return consumer(Cb, qb, Nb, nr, deg_, *extra_)

        fn = jax.jit(fused)
        _FUSED_CACHE[cache_key] = fn
    return fn(
        C, N, jnp.asarray(scalars), jnp.asarray(nbrs2),
        jnp.asarray(np.asarray(deg)), *extra,
    )


def _sweep_core(C, scalars, rowix, nbrs2, W: int, l: int, ct: int,
                interpret: bool):
    nt = scalars.shape[1]
    d = nbrs2.shape[-1] - 8
    nbuf = 1 if W >= 1024 else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 2, d + 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, W, W), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    rho, pos = pl.pallas_call(
        partial(_sweep_kernel, d=d, W=W, l=l, ct=ct, nbuf=nbuf),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nt, 1, d), jnp.float32),
            # positions lane-major (l rows of d lanes) and f32: writing a
            # lane vector onto sublanes relayouts it and int32 relayouts
            # miscompile under Mosaic; the transpose + int cast run in XLA
            jax.ShapeDtypeStruct((nt, l, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scalars, jnp.stack([nbrs2, rowix], axis=1), C)
    # positions stay f32 out of here (exact); the packers below keep them
    # f32 — bitcasting to int32 and back creates denormals the TPU
    # flushes to zero in fused layout ops
    return rho[:, 0, :], jnp.transpose(pos, (0, 2, 1))


_SWEEP_CACHE: dict = {}


def sweep_apply(C, node_ixs, nbrs, deg, l: int, ct: int, rho_threshold,
                want_rho: bool, interpret: bool = False):
    """Fused gather+sweep launch for one (bucket) node set; outputs match
    `_run_level_local`'s fetch formats exactly: the `_pack_rho_pos`
    packed array when want_rho, else the lean (hit bits, uint8 positions)
    pair (d <= 256 only; the caller guards). Returns None when no window
    plan exists (caller falls back to the XLA route)."""
    plan = _plan_inputs(C, node_ixs, nbrs, deg)
    if plan is None:
        return None
    base, W, rowix, nbrs2 = plan
    nt, d = np.asarray(nbrs).shape
    lean = (not want_rho) and d <= 256
    cache_key = ("sweep", l, ct, W, d, nt, lean, interpret)
    fn = _SWEEP_CACHE.get(cache_key)
    if fn is None:
        def fused(C_, scalars_, rowix_, nbrs2_, rho_th_):
            rho, pos = _sweep_core(C_, scalars_, rowix_, nbrs2_, W, l, ct,
                                   interpret)
            if lean:
                hit = jnp.packbits(rho < rho_th_, axis=1)
                return hit, pos.astype(jnp.uint8)
            return jnp.concatenate([rho[:, :, None], pos], axis=2)

        fn = jax.jit(fused)
        _SWEEP_CACHE[cache_key] = fn
    scalars = np.stack([base, np.asarray(deg, np.int32)], axis=0)
    return fn(
        C, jnp.asarray(scalars), jnp.asarray(rowix), jnp.asarray(nbrs2),
        jnp.float32(rho_threshold),
    )


def gather_local_panels(C, node_ixs, nbrs, deg, interpret: bool = False):
    """(Cb (nt, d, d), qb (nt, d)) via the windowed DMA gather — VALID
    entries (j < deg) bit-identical to the XLA gathers
    ``C[nbrs[:, :, None], nbrs[:, None, :]]`` / ``C[node_ixs[:, None],
    nbrs]`` including NaN positions; pad slots gather the node's own
    row/column instead of row 0 (consumers mask them by deg).
    Returns None when the neighbour spans exceed MAX_W (caller uses the
    XLA gather).
    """
    plan = _plan_inputs(C, node_ixs, nbrs, deg)
    if plan is None:
        return None
    base, W, rowix, nbrs2 = plan

    @partial(jax.jit, static_argnames=("W_", "interpret_"))
    def run(C_, base_, rowix_, nbrs2_, W_, interpret_):
        return _gather_core(C_, base_, rowix_, nbrs2_, W_, interpret_)

    return run(
        C, jnp.asarray(base), jnp.asarray(rowix), jnp.asarray(nbrs2),
        W_=W, interpret_=interpret,
    )
