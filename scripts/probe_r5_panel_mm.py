#!/usr/bin/env python
"""Probe: the 11k panel's mm-tile device wall (r5 ask #5 follow-up).

r5 measured panel_mm_wall ~= 3.7 s while the contingency-matmul roofline
at the post-chunk-fix shapes predicts ~0.7 s. Variants:

  a. production `_panel_mm_tiles_fused` at row_tile=1024 (the default)
  b. row_tile=2048 (fewer, bigger stripes)
  c. decode-once: materialize the (3m, n) int8 one-hot in HBM, then pure
     int8 matmul stripes (no per-stripe re-decode of the column panel)
  d. the raw counts matmul alone at the stripe shape (no kendall epilogue)

One JSON line per variant (run with nohup, poll the log).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M = 11264
N = 16384
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops.corr import (
        _device_put_chunked, _kendall_from_counts, _panel_mm_tiles_fused,
        _prep_bytes,
    )
    from cigwas_tpu.ops.decode import (
        contingency_counts, geno_onehot, unpack_bed_codes,
    )

    rng = np.random.default_rng(0)
    bb = rng.integers(0, 256, size=(M, N // 4), dtype=np.uint8)
    padded, n_chunks = _prep_bytes(bb, N, 4 * (((N // 4) + 31) // 32) * 32)
    cols = _device_put_chunked(padded)
    float(jnp.asarray(cols[0, 0]))
    K = int(padded.shape[1]) * 4

    def timed(tag, fn, flops, *args):
        out = fn(*args)
        float(jnp.asarray(out.ravel()[0]))  # compile+sync
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.asarray(out.ravel()[0]))
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        print(json.dumps({
            "probe": tag, "wall_s": round(best, 3),
            "tops": round(flops / best / 1e12, 1),
        }), flush=True)

    flops_total = 2.0 * (3 * M) ** 2 * K

    for row_tile in (1024, 2048):
        nfull = M // row_tile

        def run_fused(cols_, rt=row_tile, nf=nfull):
            C = jnp.zeros((M, M), jnp.float32)
            return _panel_mm_tiles_fused(C, cols_, n_chunks, rt, nf)

        timed(f"fused_rowtile{row_tile}", run_fused, flops_total, cols)

    # decode once -> int8 one-hot in HBM -> pure matmul stripes
    @jax.jit
    def decode_once(cols_):
        return geno_onehot(unpack_bed_codes(cols_)).reshape(3 * M, -1)

    X = decode_once(cols)
    float(jnp.asarray(X[0, 0]))

    @jax.jit
    def mm_predecoded(X_):
        def body(i, C):
            t0 = i * 1024
            rows = jax.lax.dynamic_slice(X_, (3 * t0, 0), (3 * 1024, X_.shape[1]))
            counts = jax.lax.dot_general(
                rows, X_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            tile = _kendall_from_counts(counts, 1024, M)
            return jax.lax.dynamic_update_slice(C, tile, (t0, 0))

        return jax.lax.fori_loop(0, M // 1024, body, jnp.zeros((M, M), jnp.float32))

    timed("predecoded_mm", mm_predecoded, flops_total, X)

    # raw counts matmul at the stripe shape (one stripe, no epilogue)
    @jax.jit
    def raw_stripe(X_):
        rows = X_[: 3 * 1024]
        return jax.lax.dot_general(
            rows, X_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    timed("raw_stripe", raw_stripe, 2.0 * (3 * 1024) * (3 * M) * K, X)


if __name__ == "__main__":
    main()
