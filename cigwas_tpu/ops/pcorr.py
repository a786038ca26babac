"""Batched partial-correlation CI tests — the level-l kernels of the skeleton.

The reference runs one CUDA thread per (node, combination) with hand-unrolled
SVD pseudo-inverses per level (`cuPC-S.cu:486-3020`). Here a level is a dense
batched computation: for a tile of nodes X, a chunk of K candidate
conditioning sets S (position tuples into each node's neighbour list, shared
across nodes thanks to colex enumeration) and all neighbour slots Y at once:

    M2    = C[S, S]                  (K, l, l)   per node
    t     = M2^-1 C[X, S]            (K, l)
    H00   = 1 - C[X,S]·t
    H01   = C[X,Y] - C[Y,S]·t        (K, d)
    H11   = 1 - C[Y,S]·M2^-1·C[Y,S]  (K, d)
    rho   = H01 / sqrt(|H00 H11|)
    z     = |atanh(rho)|  (Fisher)

which is the identical Schur-complement formulation of
`cuPC-S.cu:664-699`. The inner contractions are MXU/VPU friendly and the
min-z reduction over K replaces the atomicCAS edge mutex with a deterministic
reduction (removing the reference's sepset tie-break nondeterminism).

Small conditioning matrices are inverted with closed forms for l <= 3 and
batched LU (`jnp.linalg.inv`) above; near-singular sets produce |rho| ~ 1 and
a huge z, i.e. "dependent", which errs on the side of keeping edges like the
reference's pseudo-inverse path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.0e38)


def _inv_small(M: jnp.ndarray, l: int) -> jnp.ndarray:
    """Batched inverse of (..., l, l) matrices; closed form for l <= 3."""
    if l == 1:
        return 1.0 / M
    if l == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 0]
        d = M[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return inv / det[..., None, None]
    if l == 3:
        m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        c00 = m11 * m22 - m12 * m21
        c01 = m02 * m21 - m01 * m22
        c02 = m01 * m12 - m02 * m11
        c10 = m12 * m20 - m10 * m22
        c11 = m00 * m22 - m02 * m20
        c12 = m02 * m10 - m00 * m12
        c20 = m10 * m21 - m11 * m20
        c21 = m01 * m20 - m00 * m21
        c22 = m00 * m11 - m01 * m10
        det = m00 * c00 + m10 * c01 + m20 * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, c01, c02], axis=-1),
                jnp.stack([c10, c11, c12], axis=-1),
                jnp.stack([c20, c21, c22], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(M)


def _fisher_z(rho: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(0.5 * jnp.log(jnp.abs((1.0 + rho) / (1.0 - rho))))


def _pcorr_z_node(C, x, nbrs_x, deg_x, combos, combos_left, l: int):
    """Per-node level-l statistics for one chunk of candidate sepsets.

    Returns z: (K, d) Fisher statistics (BIG where the test is invalid) and
    S: (K, l) the conditioning variable indices per combo.
    """
    K, _ = combos.shape
    d = nbrs_x.shape[0]
    S = nbrs_x[combos]  # (K, l)
    M2 = C[S[:, :, None], S[:, None, :]]  # (K, l, l)
    M2inv = _inv_small(M2, l)
    Cx = C[x, S]  # (K, l)
    t = jnp.einsum("kij,kj->ki", M2inv, Cx)
    H00 = 1.0 - jnp.einsum("ki,ki->k", Cx, t)  # (K,)
    M1Y = C[nbrs_x[None, :, None], S[:, None, :]]  # (K, d, l)
    C0Y = C[x, nbrs_x]  # (d,)
    H01 = C0Y[None, :] - jnp.einsum("kdl,kl->kd", M1Y, t)  # (K, d)
    V = jnp.einsum("kij,kdj->kdi", M2inv, M1Y)
    H11 = 1.0 - jnp.einsum("kdi,kdi->kd", V, M1Y)  # (K, d)
    rho = H01 / jnp.sqrt(jnp.abs(H00[:, None] * H11))
    z = _fisher_z(rho)

    k_ix = jnp.arange(K)
    slot_ix = jnp.arange(d)
    combo_ok = k_ix < combos_left  # (K,)
    slot_ok = slot_ix < deg_x  # (d,)
    y_in_S = jnp.any(combos[:, None, :] == slot_ix[None, :, None], axis=-1)  # (K, d)
    invalid = (~combo_ok[:, None]) | (~slot_ok[None, :]) | y_in_S
    z = jnp.where(invalid | ~jnp.isfinite(z), BIG, z)
    return z, S


@partial(jax.jit, static_argnames=("l",))
def level_chunk_minz(C, node_ixs, nbrs, deg, combos, combos_left, l: int):
    """Chunk of level-l CI tests for a tile of nodes.

    C: (n, n) f32; node_ixs: (nt,) global node indices of the tile;
    nbrs: (nt, d) int32; deg: (nt,); combos: (K, l) colex position tuples;
    combos_left: (nt,) number of valid chunk rows per node.

    Returns (zmin (nt, d), argk (nt, d)): per (node, neighbour-slot) the
    minimum Fisher z over the chunk's conditioning sets and the chunk-row
    index achieving it.
    """

    def per_node(x, nbrs_x, deg_x, left_x):
        z, _ = _pcorr_z_node(C, x, nbrs_x, deg_x, combos, left_x, l)
        return jnp.min(z, axis=0), jnp.argmin(z, axis=0)

    return jax.vmap(per_node)(node_ixs, nbrs, deg, combos_left)


@partial(jax.jit, static_argnames=("l",))
def level_chunk_hetcor(
    C, N, time_index, node_ixs, nbrs, deg, combos, combos_left, th, l: int
):
    """Hetcor level-l chunk: per-test ESS thresholds + time-index constraints.

    Implements the semantics of `hetcor-cuPC-S.cu` level kernels: a test of
    (X, Y | S) uses threshold th / sqrt(mean_ess({X,Y} u S) - l - 3) where
    mean_ess averages the pairwise ESS matrix over all variable pairs of the
    test ignoring NaNs (`hetcor-cuPC-S.cu:3068-3089`), and S must not contain
    a variable with time index greater than max(t_X, t_Y)
    (`valid_time_conditioning`, `hetcor-cuPC-S.cu:3055-3065`).

    Returns margin_min (nt, d): min over the chunk of (z - th_test); an edge
    is removed when its margin over all levels/chunks goes below 0.
    """

    def per_node(x, nbrs_x, deg_x, left_x):
        z, S = _pcorr_z_node(C, x, nbrs_x, deg_x, combos, left_x, l)
        K, d = z.shape
        y = nbrs_x  # (d,)
        # pairwise ESS sums: within S (combo only), S-to-X, S-to-Y, X-to-Y
        if l >= 2:
            NSS = N[S[:, :, None], S[:, None, :]]  # (K, l, l)
            tri = jnp.tril(jnp.ones((l, l), bool), k=-1)
            nss_vals = jnp.where(tri[None], NSS, jnp.nan)
            s_SS = jnp.nansum(nss_vals, axis=(1, 2))  # (K,)
            c_SS = jnp.sum(jnp.where(tri[None], ~jnp.isnan(NSS), False), axis=(1, 2))
        else:
            s_SS = jnp.zeros((K,), jnp.float32)
            c_SS = jnp.zeros((K,), jnp.int32)
        NxS = N[x, S]  # (K, l)
        s_xS = jnp.nansum(NxS, axis=1)
        c_xS = jnp.sum(~jnp.isnan(NxS), axis=1)
        NyS = N[y[None, :, None], S[:, None, :]]  # (K, d, l)
        s_yS = jnp.nansum(NyS, axis=2)  # (K, d)
        c_yS = jnp.sum(~jnp.isnan(NyS), axis=2)
        Nxy = N[x, y]  # (d,)
        s_xy = jnp.where(jnp.isnan(Nxy), 0.0, Nxy)[None, :]
        c_xy = (~jnp.isnan(Nxy)).astype(jnp.int32)[None, :]
        total = s_SS[:, None] + s_xS[:, None] + s_yS + s_xy
        count = c_SS[:, None] + c_xS[:, None] + c_yS + c_xy
        mean_ess = total / count
        th_test = th / jnp.sqrt(mean_ess - l - 3.0)
        # time-index constraint
        tS_max = jnp.max(time_index[S], axis=1)  # (K,)
        t_pair = jnp.maximum(time_index[x], time_index[y])  # (d,)
        time_bad = tS_max[:, None] > t_pair[None, :]
        margin = jnp.where(time_bad | ~jnp.isfinite(th_test), BIG, z - th_test)
        margin = jnp.where(z >= BIG, BIG, margin)
        return jnp.min(margin, axis=0)

    return jax.vmap(per_node)(node_ixs, nbrs, deg, combos_left)
