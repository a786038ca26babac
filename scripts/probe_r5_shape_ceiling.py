#!/usr/bin/env python
"""Probe: challenge the fused-step shape ceiling (VERDICT r4 ask #8).

r4's roofline argued the flat 21%-of-bf16 headline via the SHAPE: a raw
int8 contingency matmul at (3*1024, 16384) caps at ~85 TOP/s. This probe
sweeps the marker-tile and sample axes — m in {1024, 2048, 4096}, n in
{16384, 65536} — for (a) the raw int8 matmul and (b) the full fused
contingency (decode included), to find whether a larger amortized shape
raises the ceiling itself. One JSON line per point (run with nohup).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K = 4
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops.decode import (
        contingency_counts, geno_onehot, unpack_bed_codes,
    )

    rng = np.random.default_rng(0)

    def timed(fn, *args):
        float(jnp.asarray(fn(*args)))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(jnp.asarray(fn(*args)))
        return (time.perf_counter() - t0) / REPS / K

    for m in (1024, 2048, 4096):
        for n in (16384, 65536):
            flops = 2.0 * (3 * m) ** 2 * n

            Xh = rng.integers(0, 2, size=(3 * m, n), dtype=np.int8)
            Xd = jax.device_put(Xh)

            @jax.jit
            def raw_int8(X):
                # loop-VARIANT input: a loop-invariant matmul gets hoisted
                # out of the scan by XLA and the amortized rate reads ~Kx
                # too high (the first r5 sweep reported 1019 "TOP/s")
                def body(acc, k):
                    Xk = X + k.astype(jnp.int8)
                    c = jax.lax.dot_general(
                        Xk, X, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    # consume the WHOLE result: a c[0, 1] slice lets
                    # XLA narrow the dot to a single row x column
                    return acc + jnp.sum(c), None
                s, _ = jax.lax.scan(body, jnp.int32(0),
                                    jnp.arange(K, dtype=jnp.int32))
                return s

            t = timed(raw_int8, Xd)
            print(json.dumps({
                "probe": "raw_int8", "m": m, "n": n,
                "s_per_call": round(t, 5),
                "tops": round(flops / t / 1e12, 1),
            }), flush=True)

            bh = rng.integers(0, 256, size=(m, n // 4), dtype=np.uint8)
            bd = jax.device_put(bh)

            @jax.jit
            def fused(bb):
                def body(acc, k):
                    oh = geno_onehot(
                        unpack_bed_codes(bb ^ k.astype(jnp.uint8))
                    ).reshape(3 * m, -1)
                    c = contingency_counts(oh, oh)
                    return acc + jnp.sum(c), None
                s, _ = jax.lax.scan(body, jnp.int32(0),
                                    jnp.arange(K, dtype=jnp.uint8))
                return s

            t = timed(fused, bd)
            print(json.dumps({
                "probe": "fused_contingency", "m": m, "n": n,
                "s_per_call": round(t, 5),
                "tops": round(flops / t / 1e12, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
