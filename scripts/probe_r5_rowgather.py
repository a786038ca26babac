#!/usr/bin/env python
"""Probe: scattered-neighbour local-panel gather strategies on the TPU.

The windowed DMA kernel cannot serve scattered spans, single-row HBM
DMAs are rejected by Mosaic ((8, 128) tiling), and the XLA 2-level
element gather measured ~0.3 GB/s. Race the alternatives at the 11k
level-1 shape (vp=11264, d=128, nt=512):

  a. XLA 2-level element gather  C[nb[:,:,None], nb[:,None,:]]
  b. XLA row-gather -> transpose -> row-gather (all whole-row takes)
  c. XLA row-gather -> blocked one-hot matmul column select (HIGHEST)
  d. Pallas row DMA from a 1-D reshape of C (row starts are 1024-aligned
     when vp % 1024 == 0 — may satisfy 1-D tiling where 2-D failed)

Bit-identity vs (a) checked on device. One JSON line each.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fetch(x):
    return np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    vp, d, nt = 11264, 128, 512
    A = rng.normal(size=(vp, 64)).astype(np.float32)

    @jax.jit
    def build_panel(Ad):
        Cd = jnp.dot(Ad, Ad.T, preferred_element_type=jnp.float32)
        dg = jax.lax.rsqrt(jnp.diagonal(Cd))
        Cd = Cd * dg[:, None] * dg[None, :]
        key = jax.random.PRNGKey(0)
        mask = jax.random.uniform(key, Cd.shape) < 0.001
        return jnp.where(mask, jnp.nan, Cd)

    C_dev = build_panel(jax.device_put(A))
    nbrs = np.sort(rng.choice(vp, size=(nt, d), replace=True), axis=1)
    nbrs = nbrs.astype(np.int32)
    nb_dev = jnp.asarray(nbrs)

    @jax.jit
    def elem_gather(Cd, nb):
        return Cd[nb[:, :, None], nb[:, None, :]]

    @jax.jit
    def rowrow_gather(Cd, nb):
        rows = jnp.take(Cd, nb.reshape(-1), axis=0)  # (nt*d, vp)
        rows = rows.reshape(nt, d, vp)
        rt = jnp.swapaxes(rows, 1, 2)  # (nt, vp, d)
        return jnp.take_along_axis(
            rt, nb[:, :, None].astype(jnp.int32), axis=1
        ).swapaxes(1, 2)  # (nt, d, d): [i, s, y] = C[nb[i,s], nb[i,y]]

    @jax.jit
    def rowmm_gather(Cd, nb):
        rows = jnp.take(Cd, nb.reshape(-1), axis=0).reshape(nt, d, vp)
        isn = jnp.isnan(rows)
        rows0 = jnp.where(isn, 0.0, rows)
        hi = jax.lax.Precision.HIGHEST
        blk = 2048

        def body(c, b0):
            ids = jax.lax.broadcasted_iota(jnp.int32, (nt, blk, d), 1) + b0
            S = (ids == nb[:, None, :]).astype(jnp.float32)
            seg = jax.lax.dynamic_slice_in_dim(rows0, b0, blk, axis=2)
            segn = jax.lax.dynamic_slice_in_dim(
                isn.astype(jnp.float32), b0, blk, axis=2)
            val = jax.lax.dot_general(
                seg, S, (((2,), (1,)), ((0,), (0,))), precision=hi,
                preferred_element_type=jnp.float32)
            nan = jax.lax.dot_general(
                segn, S, (((2,), (1,)), ((0,), (0,))), precision=hi,
                preferred_element_type=jnp.float32)
            return (c[0] + val, c[1] + nan), 0

        (val, nan), _ = jax.lax.scan(
            body, (jnp.zeros((nt, d, d), jnp.float32),
                   jnp.zeros((nt, d, d), jnp.float32)),
            jnp.arange(0, vp, blk))
        return jnp.where(nan > 0.5, jnp.float32(jnp.nan), val)

    # d: pallas row DMA from the 1-D reshape
    RCH = 8

    def rowdma_kernel(sc_ref, nbv_ref, C1d, out_ref, rows_buf, sem, *, vp, d):
        i = pl.program_id(0)
        n_rch = d // RCH

        def row_dma(slot, r):
            idx = sc_ref[i, r]
            return pltpu.make_async_copy(
                C1d.at[pl.ds(idx * vp, vp)], rows_buf.at[slot],
                sem.at[slot],
            )

        for r in range(RCH):
            row_dma(r, r).start()

        def chunk(k, carry):
            @pl.when(k + 1 < n_rch)
            def _():
                for r in range(RCH):
                    row_dma(RCH * ((k + 1) % 2) + r,
                            (k + 1) * RCH + r).start()
            slot0 = RCH * (k % 2)
            for r in range(RCH):
                row_dma(slot0 + r, k * RCH + r).wait()
            rows = rows_buf[pl.ds(slot0, RCH), :]
            isn = jnp.isnan(rows)
            rows0 = jnp.where(isn, 0.0, rows)
            hi = jax.lax.Precision.HIGHEST
            nbr = nbv_ref[0, 0, :]
            val = jnp.zeros((RCH, d), jnp.float32)
            nan = jnp.zeros((RCH, d), jnp.float32)
            for b0 in range(0, vp, 1024):
                S = (
                    jax.lax.broadcasted_iota(jnp.int32, (1024, d), 0) + b0
                    == nbr[None, :]
                ).astype(jnp.float32)
                val = val + jnp.dot(rows0[:, b0:b0 + 1024], S, precision=hi,
                                    preferred_element_type=jnp.float32)
                nan = nan + jnp.dot(
                    isn.astype(jnp.float32)[:, b0:b0 + 1024], S,
                    precision=hi, preferred_element_type=jnp.float32)
            out = jnp.where(nan > 0.5, jnp.float32(jnp.nan), val)
            out_ref[0, pl.ds(k * RCH, RCH), :] = out
            return carry

        jax.lax.fori_loop(0, n_rch, chunk, 0, unroll=False)

    @jax.jit
    def pallas_rowdma(Cd, nb):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, d), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, d, d), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * RCH, vp), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * RCH,)),
            ],
        )
        return pl.pallas_call(
            partial(rowdma_kernel, vp=vp, d=d),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, d, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(nb, nb.reshape(nt, 1, d), Cd.reshape(vp * vp))

    @jax.jit
    def same(a, b):
        return jnp.array_equal(jnp.nan_to_num(a), jnp.nan_to_num(b)) & (
            jnp.array_equal(jnp.isnan(a), jnp.isnan(b))
        )

    def timeit(fn, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            fetch(jnp.sum(jnp.nan_to_num(out[:, :1, :1])))
            walls.append(round(time.perf_counter() - t0, 4))
        return walls

    ref = elem_gather(C_dev, nb_dev)
    out_bytes = nt * d * d * 4
    results = {"elem": lambda: elem_gather(C_dev, nb_dev),
               "rowrow": lambda: rowrow_gather(C_dev, nb_dev),
               "rowmm": lambda: rowmm_gather(C_dev, nb_dev),
               "pallas1d": lambda: pallas_rowdma(C_dev, nb_dev)}
    for name, fn in results.items():
        try:
            out = fn()  # warmup/compile
            biteq = bool(fetch(same(out, ref)))
            walls = timeit(fn)
            print(json.dumps({
                "phase": name, "bit_identical": biteq, "walls": walls,
                "min_wall": min(walls),
                "gbps_effective": round(out_bytes / min(walls) / 1e9, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "phase": name,
                "error": str(e).splitlines()[0][:200],
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
