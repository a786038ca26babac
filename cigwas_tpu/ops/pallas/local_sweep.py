"""Pallas TPU kernels: dense local-panel level-2/3 CI-test sweeps.

The production replacement for the per-(x, S, y) enumeration of
`cal_Indepl2` / `cal_Indepl3` (`cuPC-S.cu:584-871`). For one node x with
local neighbour panel Cb = C[adj(x), adj(x)] and cross row qb = C[x, adj(x)],
the level-(k+2) partial correlation is two (level 3: three) steps of the
classic recursion

    rho_{ab|B,c} = (rho_{ab|B} - rho_{ac|B} rho_{bc|B})
                   / sqrt((1 - rho_{ac|B}^2)(1 - rho_{bc|B}^2))

— the same Schur complement as the reference's per-thread inverses, but each
test costs O(1) fused VPU ops.

Why Pallas instead of the XLA formulation (`pcorr._pair_sweep`): the XLA
sweep builds a (y, t, s) cube per node whose min AND argmin reductions force
the cube through HBM (or recompute it), and its fused numerics change with
the batch shape, which complicates sharded byte-identity. Here the grid is
one program per node: the (d, d) panel lives in VMEM scratch, every
conditioning step is a VMEM-resident (d, d) elementwise pass, min and argmin
ride one strict-< merge, and per-node results are bit-identical regardless
of how nodes are tiled or sharded BY CONSTRUCTION.

Tie-breaking matches the colex contract of the combinatorial path: the
running merge over t (and the level-3 outer u) is strict `<` with the index
ascending, and the per-row argmin takes the first occurrence (lowest lane
index attaining the row minimum) — together the LOWEST COLEX RANK among
exact ties.

Layout notes (TPU): tensors keep y on sublanes and s on lanes. Mosaic can
dynamic-slice refs only on the sublane dimension, so per-step ROWS are ref
slices (`C_ref[pl.ds(t, 1), :]`) while COLUMNS are masked lane reductions
(`where(lane == t, C, 0).sum(axis=1)` — exactly one surviving term, bitwise
exact, and inf-safe where a one-hot multiply is not). Outputs are written
as (d, 1) column blocks and squeezed by the wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RHO_BIG = np.float32(2.0)


def _rsq(x):
    return jax.lax.rsqrt(jnp.abs(1.0 - x * x))


def _pair_min(C_ref, R_ref, qr_ref, qc_ref, deg_x, t_hi, y_excl, d, carry0):
    """Min over pairs s < t < min(t_hi, deg_x) of |rho(x, y | {s, t})|.

    C_ref/R_ref: (d, d) VMEM refs of the current local panel and its
    rsqrt(1-C^2); qr_ref (1, d) / qc_ref (d, 1): pcorr(x, b | B) in both
    layouts; y_excl: the y ROW whose tests are invalid this pass (the
    level-3 outer conditioning element — that pair is tested under other
    outer values — else d); carry0 = (rho (d, 1), t (d, 1), s (d, 1)).
    """
    y_col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    s_row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    Cb = C_ref[:, :]
    q_row = qr_ref[:, :]
    q_col = qc_ref[:, :]

    def t_step(t, carry):
        rho_b, t_b, s_b = carry
        ct_row = C_ref[pl.ds(t, 1), :]  # (1, d)
        rt_row = R_ref[pl.ds(t, 1), :]
        # column t as (d, 1): Mosaic cannot dynamic-slice the lane dim, so
        # select it with a masked lane reduction — `where`, not a one-hot
        # multiply, because R's diagonal is inf and inf * 0 = NaN; the sum
        # has exactly one surviving term, so the selection is bitwise exact
        sel = lane == t  # (1, d)
        ct_col = jnp.sum(jnp.where(sel, Cb, 0.0), axis=1, keepdims=True)
        rt_col = jnp.sum(jnp.where(sel, R_ref[:, :], 0.0), axis=1, keepdims=True)
        qt = jnp.sum(jnp.where(sel, q_row, 0.0), axis=1, keepdims=True)  # (1, 1)
        rqt = _rsq(qt)
        # pcorr(x, s | B u {t}) in s-lane and y-sublane layouts (identical
        # arithmetic, so exact ties between the two reads are preserved)
        q2_row = (q_row - qt * ct_row) * (rqt * rt_row)  # (1, d)
        q2_col = (q_col - qt * ct_col) * (rqt * rt_col)  # (d, 1)
        # pcorr(y, s | B u {t})
        T2 = (Cb - ct_col * ct_row) * (rt_col * rt_row)  # (d, d)
        rho = jnp.abs(q2_col - q2_row * T2) * (_rsq(q2_row) * _rsq(T2))
        bad = (
            (s_row >= t)
            | (s_row == y_col)
            | (y_col == t)
            | (t >= jnp.minimum(t_hi, deg_x))
            | (y_col >= deg_x)
            | (y_col == y_excl)
        )
        rho = jnp.where(bad | ~(rho < jnp.inf), RHO_BIG, rho)
        rho_s = jnp.min(rho, axis=1, keepdims=True)  # (d, 1)
        # first-occurrence argmin without the argmin primitive: the lowest
        # lane index attaining the row minimum
        am_s = jnp.min(
            jnp.where(rho == rho_s, s_row, d), axis=1, keepdims=True
        ).astype(jnp.int32)
        better = rho_s < rho_b  # strict: lowest t among exact ties
        return (
            jnp.where(better, rho_s, rho_b),
            jnp.where(better, t, t_b),
            jnp.where(better, am_s, s_b),
        )

    return jax.lax.fori_loop(1, d, t_step, carry0)


def _make_kernel2(d: int):
    def kernel(deg_ref, cb_ref, qr_ref, qc_ref, rho_ref, p1_ref, p2_ref,
               cs, rs, qrs, qcs):
        deg_x = deg_ref[pl.program_id(0)]
        cs[:, :] = cb_ref[0]
        rs[:, :] = _rsq(cb_ref[0])
        qrs[:, :] = qr_ref[0]
        qcs[:, :] = qc_ref[0]
        init = (
            jnp.full((d, 1), RHO_BIG, jnp.float32),
            jnp.zeros((d, 1), jnp.int32),
            jnp.zeros((d, 1), jnp.int32),
        )
        rho_b, t_b, s_b = _pair_min(
            cs, rs, qrs, qcs, deg_x, jnp.int32(d), jnp.int32(d), d, init
        )
        rho_ref[0] = rho_b
        p1_ref[0] = s_b
        p2_ref[0] = t_b

    return kernel


def _make_kernel3(d: int):
    def kernel(deg_ref, cb_ref, qr_ref, qc_ref,
               rho_ref, p1_ref, p2_ref, p3_ref,
               cs, rs, qrs, qcs, c1s, r1s, q1rs, q1cs,
               rho_s, u_s, t_s, s_s):
        deg_x = deg_ref[pl.program_id(0)]
        cs[:, :] = cb_ref[0]
        rs[:, :] = _rsq(cb_ref[0])
        qrs[:, :] = qr_ref[0]
        qcs[:, :] = qc_ref[0]
        rho_s[:, :] = jnp.full((d, 1), RHO_BIG, jnp.float32)
        u_s[:, :] = jnp.zeros((d, 1), jnp.int32)
        t_s[:, :] = jnp.zeros((d, 1), jnp.int32)
        s_s[:, :] = jnp.zeros((d, 1), jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)

        def u_step(u, _):
            cu_row = cs[pl.ds(u, 1), :]
            ru_row = rs[pl.ds(u, 1), :]
            sel_u = lane == u  # masked select; see _pair_min
            cu_col = jnp.sum(jnp.where(sel_u, cs[:, :], 0.0), axis=1, keepdims=True)
            ru_col = jnp.sum(jnp.where(sel_u, rs[:, :], 0.0), axis=1, keepdims=True)
            qu = jnp.sum(jnp.where(sel_u, qrs[:, :], 0.0), axis=1, keepdims=True)
            rqu = _rsq(qu)
            c1s[:, :] = (cs[:, :] - cu_col * cu_row) * (ru_col * ru_row)
            r1s[:, :] = _rsq(c1s[:, :])
            q1rs[:, :] = (qrs[:, :] - qu * cu_row) * (rqu * ru_row)
            q1cs[:, :] = (qcs[:, :] - qu * cu_col) * (rqu * ru_col)
            init = (
                jnp.full((d, 1), RHO_BIG, jnp.float32),
                jnp.zeros((d, 1), jnp.int32),
                jnp.zeros((d, 1), jnp.int32),
            )
            rho_u, t_u, s_u = _pair_min(
                c1s, r1s, q1rs, q1cs, deg_x, u, u, d, init
            )
            # u >= deg_x conditions on a padded slot: its panel row is junk
            better = (rho_u < rho_s[:, :]) & (u < deg_x)
            rho_s[:, :] = jnp.where(better, rho_u, rho_s[:, :])
            u_s[:, :] = jnp.where(better, u, u_s[:, :])
            t_s[:, :] = jnp.where(better, t_u, t_s[:, :])
            s_s[:, :] = jnp.where(better, s_u, s_s[:, :])
            return 0

        jax.lax.fori_loop(2, d, u_step, 0)
        rho_ref[0] = rho_s[:, :]
        p1_ref[0] = s_s[:, :]
        p2_ref[0] = t_s[:, :]
        p3_ref[0] = u_s[:, :]

    return kernel


@partial(jax.jit, static_argnames=("l", "interpret"))
def _local_sweep_pallas(C, node_ixs, nbrs, deg, l: int, interpret: bool):
    nt, d = nbrs.shape
    Cb = C[nbrs[:, :, None], nbrs[:, None, :]]  # (nt, d, d)
    q = C[node_ixs[:, None], nbrs]  # (nt, d)
    q_row = q.reshape(nt, 1, d)
    q_col = q.reshape(nt, d, 1)

    col = pl.BlockSpec((1, d, 1), lambda i, *_: (i, 0, 0))
    outs = [
        jax.ShapeDtypeStruct((nt, d, 1), jnp.float32),
        jax.ShapeDtypeStruct((nt, d, 1), jnp.int32),
        jax.ShapeDtypeStruct((nt, d, 1), jnp.int32),
    ]
    out_specs = [col, col, col]
    scratch = [
        pltpu.VMEM((d, d), jnp.float32),  # cs
        pltpu.VMEM((d, d), jnp.float32),  # rs
        pltpu.VMEM((1, d), jnp.float32),  # qrs
        pltpu.VMEM((d, 1), jnp.float32),  # qcs
    ]
    if l == 3:
        outs.append(jax.ShapeDtypeStruct((nt, d, 1), jnp.int32))
        out_specs.append(col)
        scratch += [
            pltpu.VMEM((d, d), jnp.float32),  # c1s
            pltpu.VMEM((d, d), jnp.float32),  # r1s
            pltpu.VMEM((1, d), jnp.float32),  # q1rs
            pltpu.VMEM((d, 1), jnp.float32),  # q1cs
            pltpu.VMEM((d, 1), jnp.float32),  # rho carry
            pltpu.VMEM((d, 1), jnp.int32),    # u carry
            pltpu.VMEM((d, 1), jnp.int32),    # t carry
            pltpu.VMEM((d, 1), jnp.int32),    # s carry
        ]
    kernel = _make_kernel2(d) if l == 2 else _make_kernel3(d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, d, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, d, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(outs),
        interpret=interpret,
    )(deg.astype(jnp.int32), Cb, q_row, q_col)
    rho = res[0][:, :, 0]
    pos = jnp.stack([r[:, :, 0] for r in res[1:]], axis=-1)
    return rho, pos


def level2_local_sweep_pallas(C, node_ixs, nbrs, deg, ct: int = 0,
                              interpret: bool = False):
    """Drop-in Pallas variant of :func:`cigwas_tpu.ops.pcorr.level2_local_sweep`
    (ct is ignored: the whole pair sweep is VMEM-resident)."""
    return _local_sweep_pallas(
        jnp.asarray(C), jnp.asarray(node_ixs), jnp.asarray(nbrs),
        jnp.asarray(deg), 2, interpret,
    )


def level3_local_sweep_pallas(C, node_ixs, nbrs, deg, ct: int = 0,
                              interpret: bool = False):
    """Drop-in Pallas variant of :func:`cigwas_tpu.ops.pcorr.level3_local_sweep`."""
    return _local_sweep_pallas(
        jnp.asarray(C), jnp.asarray(node_ixs), jnp.asarray(nbrs),
        jnp.asarray(deg), 3, interpret,
    )
