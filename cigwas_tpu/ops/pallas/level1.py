"""Pallas TPU kernel: dense level-1 minimum-|partial-rho| sweep.

For every ordered pair (x, y) of a correlation panel C, the minimum over all
single conditioning variables s of

    |rho_{xy|s}| = |c_xy - c_xs c_ys| / sqrt(|1 - c_xs^2| |1 - c_ys^2|)

The XLA formulation materializes (rows, v, v) intermediates in HBM, making
the sweep bandwidth bound. This kernel pre-scales the panel once,

    R = rsqrt(|1 - C^2|),  P = C * R,  |rho| = |c_xy R_xs R_ys - P_xs P_ys|

and walks a (x-tile, y-tile, s-tile) grid with the s axis innermost: the
output tile lives in VMEM across the s sweep and accumulates the minimum, so
each (x, y, s) test costs ~4 VPU ops with only (TX, TS)/(TY, TS) tile loads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX = 8
TY = 128
TS = 128

RHO_PAD = 2.0  # sentinel above any valid |rho|


def _make_kernel(v_real: int):
    def kernel(cxy_ref, rx_ref, px_ref, ry_ref, py_ref, out_ref):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            out_ref[:, :] = jnp.full((TX, TY), jnp.float32(RHO_PAD))

        cxy = cxy_ref[:, :]  # (TX, TY)
        rx = rx_ref[:, :]  # (TX, TS)
        px = px_ref[:, :]
        ry = ry_ref[:, :]  # (TY, TS)
        py = py_ref[:, :]
        rho = jnp.abs(
            cxy[:, :, None] * (rx[:, None, :] * ry[None, :, :])
            - px[:, None, :] * py[None, :, :]
        )
        s_ix = t * TS + jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TS), 2)
        x_ix = pl.program_id(0) * TX + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 0
        )
        y_ix = pl.program_id(1) * TY + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 1
        )
        # skip s == x, s == y and padded conditioning variables; NaN
        # (degenerate sets) keeps the edge like the reference's z < th
        # comparing false
        bad = (s_ix == x_ix) | (s_ix == y_ix) | (s_ix >= v_real)
        rho = jnp.where(bad | jnp.isnan(rho), jnp.float32(RHO_PAD), rho)
        out_ref[:, :] = jnp.minimum(out_ref[:, :], jnp.min(rho, axis=2))

    return kernel


@partial(jax.jit, static_argnames=("v_real", "interpret"))
def _sweep_padded(C, P, R, v_real: int, interpret: bool = False):
    v = C.shape[0]
    grid = (v // TX, v // TY, v // TS)
    return pl.pallas_call(
        _make_kernel(v_real),
        out_shape=jax.ShapeDtypeStruct((v, v), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),
        ],
        out_specs=pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
        interpret=interpret,
    )(C, R, P, R, P)


def _make_masked_kernel(v_real: int):
    """Adjacency-masked sweep with argmin tracking (skeleton level 1).

    gx is the float32 adjacency row-tile of x over s: candidates are exactly
    adj(x) (`cal_Indepl1` enumerates x's neighbour list, `cuPC-S.cu:486-582`).
    Ties and cross-tile minima resolve toward the smallest s — the same
    ordering as the colex neighbour-list enumeration.
    """

    def kernel(cxy_ref, rx_ref, px_ref, gx_ref, ry_ref, py_ref, out_ref, arg_ref):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            out_ref[:, :] = jnp.full((TX, TY), jnp.float32(RHO_PAD))
            arg_ref[:, :] = jnp.zeros((TX, TY), jnp.int32)

        cxy = cxy_ref[:, :]  # (TX, TY)
        rx = rx_ref[:, :]  # (TX, TS)
        px = px_ref[:, :]
        gx = gx_ref[:, :]  # (TX, TS) adjacency of x over s
        ry = ry_ref[:, :]  # (TY, TS)
        py = py_ref[:, :]
        rho = jnp.abs(
            cxy[:, :, None] * (rx[:, None, :] * ry[None, :, :])
            - px[:, None, :] * py[None, :, :]
        )
        s_ix = t * TS + jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TS), 2)
        x_ix = pl.program_id(0) * TX + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 0
        )
        y_ix = pl.program_id(1) * TY + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 1
        )
        bad = (
            (s_ix == x_ix)
            | (s_ix == y_ix)
            | (s_ix >= v_real)
            | (gx[:, None, :] == 0.0)
        )
        rho = jnp.where(bad | jnp.isnan(rho), jnp.float32(RHO_PAD), rho)
        rmin = jnp.min(rho, axis=2)
        sarg = t * TS + jnp.argmin(rho, axis=2).astype(jnp.int32)
        better = rmin < out_ref[:, :]
        arg_ref[:, :] = jnp.where(better, sarg, arg_ref[:, :])
        out_ref[:, :] = jnp.where(better, rmin, out_ref[:, :])

    return kernel


@partial(jax.jit, static_argnames=("v_real", "interpret"))
def _sweep_masked_padded(C, P, R, Gm, v_real: int, interpret: bool = False):
    v = C.shape[0]
    grid = (v // TX, v // TY, v // TS)
    return pl.pallas_call(
        _make_masked_kernel(v_real),
        out_shape=(
            jax.ShapeDtypeStruct((v, v), jnp.float32),
            jax.ShapeDtypeStruct((v, v), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),
        ],
        out_specs=(
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
        ),
        interpret=interpret,
    )(C, R, P, Gm, R, P)


def level1_min_rho_masked(C, G, interpret: bool = False):
    """(min |rho_{xy|s}| over s in adj(x)\\{x,y}, argmin s) — both (v, v).

    Entries for x with no valid candidate stay at the RHO_PAD sentinel with
    argmin 0.
    """
    C = jnp.asarray(C, dtype=jnp.float32)
    Gm = jnp.asarray(G, dtype=jnp.float32)
    v = C.shape[0]
    pad = (-v) % TS
    if pad:
        C = jnp.pad(C, ((0, pad), (0, pad)))
        Gm = jnp.pad(Gm, ((0, pad), (0, pad)))
    R = jax.lax.rsqrt(jnp.abs(1.0 - C * C))
    P = C * R
    rho, arg = _sweep_masked_padded(C, P, R, Gm, v, interpret=interpret)
    return rho[:v, :v], arg[:v, :v]


MARGIN_PAD = 3.0e38


def _make_hetcor_kernel(th: float):
    """Hetcor level-1 margin sweep (`cal_Indepl1_ess`, `hetcor-cuPC-S.cu:343-460`).

    Per test: margin = |rho_{xy|s}| - tanh(th / sqrt(mean_ess({x,y,s}) - 4))
    where mean_ess averages N[x,y], N[x,s], N[y,s] ignoring NaNs
    (`hetcor-cuPC-S.cu:3068-3089`); conditioning variables with a time index
    above max(t_x, t_y) are excluded (`valid_time_conditioning`).
    """

    def kernel(
        cxy_ref, rx_ref, px_ref, gx_ref, nxy_ref, nxs_ref, tx_ref,
        ry_ref, py_ref, nys_ref, ty_ref, ts_ref, out_ref,
    ):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _():
            out_ref[:, :] = jnp.full((TX, TY), jnp.float32(MARGIN_PAD))

        cxy = cxy_ref[:, :]  # (TX, TY)
        rx = rx_ref[:, :]  # (TX, TS)
        px = px_ref[:, :]
        gx = gx_ref[:, :]
        ry = ry_ref[:, :]  # (TY, TS)
        py = py_ref[:, :]
        nxy = nxy_ref[:, :]  # (TX, TY) pair ess
        nxs = nxs_ref[:, :]  # (TX, TS)
        nys = nys_ref[:, :]  # (TY, TS)
        tx = tx_ref[0, :]  # (TX,)
        ty = ty_ref[0, :]  # (TY,)
        ts = ts_ref[0, :]  # (TS,)
        rho = jnp.abs(
            cxy[:, :, None] * (rx[:, None, :] * ry[None, :, :])
            - px[:, None, :] * py[None, :, :]
        )
        oxy = (~jnp.isnan(nxy)).astype(jnp.float32)
        oxs = (~jnp.isnan(nxs)).astype(jnp.float32)
        oys = (~jnp.isnan(nys)).astype(jnp.float32)
        vxy = jnp.where(jnp.isnan(nxy), 0.0, nxy)
        vxs = jnp.where(jnp.isnan(nxs), 0.0, nxs)
        vys = jnp.where(jnp.isnan(nys), 0.0, nys)
        total = vxy[:, :, None] + vxs[:, None, :] + vys[None, :, :]
        count = oxy[:, :, None] + oxs[:, None, :] + oys[None, :, :]
        mean_ess = total / count
        th_test = jnp.tanh(jnp.float32(th) / jnp.sqrt(mean_ess - 4.0))
        t_pair = jnp.maximum(tx[:, None], ty[None, :])  # (TX, TY)
        bad_time = ts[None, None, :] > t_pair[:, :, None]
        s_ix = t * TS + jax.lax.broadcasted_iota(jnp.int32, (TX, TY, TS), 2)
        x_ix = pl.program_id(0) * TX + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 0
        )
        y_ix = pl.program_id(1) * TY + jax.lax.broadcasted_iota(
            jnp.int32, (TX, TY, TS), 1
        )
        bad = (
            (s_ix == x_ix)
            | (s_ix == y_ix)
            | (gx[:, None, :] == 0.0)
            | bad_time
        )
        margin = rho - th_test
        margin = jnp.where(
            bad | jnp.isnan(margin) | (margin == jnp.inf), jnp.float32(MARGIN_PAD),
            margin,
        )
        out_ref[:, :] = jnp.minimum(out_ref[:, :], jnp.min(margin, axis=2))

    return kernel


@partial(jax.jit, static_argnames=("th", "interpret"))
def _hetcor_sweep_padded(C, P, R, Gm, N, tf, th: float, interpret: bool = False):
    v = C.shape[0]
    grid = (v // TX, v // TY, v // TS)
    t2d = tf.reshape(1, v)
    return pl.pallas_call(
        _make_hetcor_kernel(th),
        out_shape=jax.ShapeDtypeStruct((v, v), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),  # cxy
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),  # rx
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),  # px
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),  # gx
            pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),  # nxy
            pl.BlockSpec((TX, TS), lambda i, j, t: (i, t)),  # nxs
            pl.BlockSpec((1, TX), lambda i, j, t: (0, i)),  # tx
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),  # ry
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),  # py
            pl.BlockSpec((TY, TS), lambda i, j, t: (j, t)),  # nys
            pl.BlockSpec((1, TY), lambda i, j, t: (0, j)),  # ty
            pl.BlockSpec((1, TS), lambda i, j, t: (0, t)),  # ts
        ],
        out_specs=pl.BlockSpec((TX, TY), lambda i, j, t: (i, j)),
        interpret=interpret,
    )(C, R, P, Gm, N, N, t2d, R, P, N, t2d, t2d)


def hetcor1_min_margin(C, N, t, G, th: float, interpret: bool = False):
    """Dense hetcor level-1 margin minimum, (v, v); inputs may carry NaN N."""
    C = jnp.asarray(C, dtype=jnp.float32)
    Gm = jnp.asarray(G, dtype=jnp.float32)
    N = jnp.asarray(N, dtype=jnp.float32)
    tf = jnp.asarray(t, dtype=jnp.float32)
    v = C.shape[0]
    pad = (-v) % TS
    if pad:
        C = jnp.pad(C, ((0, pad), (0, pad)))
        Gm = jnp.pad(Gm, ((0, pad), (0, pad)))
        N = jnp.pad(N, ((0, pad), (0, pad)), constant_values=10.0)
        tf = jnp.pad(tf, (0, pad))
    R = jax.lax.rsqrt(jnp.abs(1.0 - C * C))
    P = C * R
    out = _hetcor_sweep_padded(C, P, R, Gm, N, tf, float(th), interpret=interpret)
    return out[:v, :v]


def level1_min_rho(C, interpret: bool = False):
    """min over single conditioning variables of |rho_{xy|s}|, (v, v).

    Entries for pairs with x == y are meaningless (diagonal); padded
    variables are masked inside the kernel.
    """
    C = jnp.asarray(C, dtype=jnp.float32)
    v = C.shape[0]
    pad = (-v) % TS
    if pad:
        C = jnp.pad(C, ((0, pad), (0, pad)))
    R = jax.lax.rsqrt(jnp.abs(1.0 - C * C))
    P = C * R
    out = _sweep_padded(C, P, R, v, interpret=interpret)
    return out[:v, :v]
