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
