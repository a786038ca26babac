#!/usr/bin/env python
"""Probe: where the fused step's MFU goes (VERDICT r4 item 6).

Measures, amortized over a scan like bench.py's fused step:
  1. raw int8 matmul at the contingency shape -> achievable peak here
  2. contingency from PRE-DECODED one-hot int8 (no unpack/decode)
  3. full contingency (decode fused in, = bench's attrib_contingency)
  4. the dense level-1 sweep at tiles 32/128/512

(1) vs (2) isolates the counts epilogue + int32 accumulate cost;
(2) vs (3) isolates the 2-bit decode; (4) maps the VPU sweep's
tile sensitivity. One JSON line each.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

M, N, P, K = 1024, 16384, 4, 8
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops.corr import _kendall_from_counts
    from cigwas_tpu.ops.decode import (
        contingency_counts, geno_onehot, unpack_bed_codes,
    )
    from cigwas_tpu.ops.pcorr import _level1_dense_padded

    rng = np.random.default_rng(0)

    def timed(fn, *args):
        float(jnp.asarray(fn(*args)))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(jnp.asarray(fn(*args)))
        return (time.perf_counter() - t0) / REPS / K

    flops = 2.0 * (3 * M) ** 2 * N

    # 1. raw int8 matmul at the contingency shape (X int8 on device)
    Xh = rng.integers(0, 2, size=(3 * M, N), dtype=np.int8)
    Xd = jax.device_put(Xh)

    @jax.jit
    def raw_int8(X):
        def body(acc, _):
            c = jax.lax.dot_general(
                X, X, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc + c[0, 1], None
        s, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K))
        return s

    t1 = timed(raw_int8, Xd)
    print(json.dumps({"probe": "raw_int8_matmul", "s_per_call": round(t1, 5),
                      "tops": round(flops / t1 / 1e12, 1)}), flush=True)

    # 2. contingency from pre-decoded one-hot (counts epilogue included)
    @jax.jit
    def cont_predecoded(X):
        def body(acc, _):
            counts = contingency_counts(X, X).astype(jnp.float32)
            C = _kendall_from_counts(counts, M, M)
            return acc + C[0, 1], None
        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return s

    t2 = timed(cont_predecoded, Xd)
    print(json.dumps({"probe": "contingency_predecoded",
                      "s_per_call": round(t2, 5),
                      "tops": round(flops / t2 / 1e12, 1)}), flush=True)

    # 3. full contingency with fused decode (bench's attribution phase)
    beds = jax.device_put(
        rng.integers(0, 256, size=(K, M, N // 4), dtype=np.uint8)
    )

    @jax.jit
    def cont_full(bb):
        def body(acc, b):
            codes = unpack_bed_codes(b)
            X = geno_onehot(codes).reshape(3 * M, -1)
            counts = contingency_counts(X, X).astype(jnp.float32)
            C = _kendall_from_counts(counts, M, M)
            return acc + C[0, 1], None
        s, _ = jax.lax.scan(body, jnp.float32(0), bb)
        return s

    t3 = timed(cont_full, beds)
    print(json.dumps({"probe": "contingency_full_decode",
                      "s_per_call": round(t3, 5),
                      "tops": round(flops / t3 / 1e12, 1)}), flush=True)

    # 4. dense level-1 sweep tile sensitivity
    vp = M + P + ((-(M + P)) % 128)
    A = rng.normal(size=(vp, 256)).astype(np.float32)

    @jax.jit
    def build_panel(Ad):
        C = Ad @ Ad.T
        d = jax.lax.rsqrt(jnp.diagonal(C))
        C = C * d[:, None] * d[None, :]
        return C, (jnp.abs(C) > 0.05) & ~jnp.eye(vp, dtype=bool)

    C_dev, G_dev = build_panel(jax.device_put(A))
    float(jnp.asarray(C_dev[0, 0]))
    sweep_flops = 4.0 * float(vp) ** 3
    for tile in (32, 128, 512):
        @jax.jit
        def sweep_only(C, G, tile=tile):
            def body(acc, _):
                r, _s = _level1_dense_padded(C + acc * 1e-30, G, tile)
                return acc + r[0, 0], None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return out
        t4 = timed(sweep_only, C_dev, G_dev)
        print(json.dumps({"probe": f"l1_sweep_tile{tile}",
                          "s_per_call": round(t4, 5),
                          "tflops": round(sweep_flops / t4 / 1e12, 2)}),
              flush=True)
    return 0


def bf16_variant():
    """Append-on probe: contingency via bf16 one-hot (exact: 0/1 operands,
    f32 accumulation; counts < 2^24) vs the int8 path."""
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops.corr import _kendall_from_counts
    from cigwas_tpu.ops.decode import geno_onehot, unpack_bed_codes

    rng = np.random.default_rng(0)
    beds = jax.device_put(
        rng.integers(0, 256, size=(K, M, N // 4), dtype=np.uint8)
    )

    def timed(fn, *args):
        float(jnp.asarray(fn(*args)))
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(jnp.asarray(fn(*args)))
        return (time.perf_counter() - t0) / REPS / K

    flops = 2.0 * (3 * M) ** 2 * N

    @jax.jit
    def cont_bf16(bb):
        def body(acc, b):
            codes = unpack_bed_codes(b)
            X = geno_onehot(codes, dtype=jnp.bfloat16).reshape(3 * M, -1)
            counts = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
            C = _kendall_from_counts(counts, M, M)
            return acc + C[0, 1], None
        s, _ = jax.lax.scan(body, jnp.float32(0), bb)
        return s

    t = timed(cont_bf16, beds)
    print(json.dumps({"probe": "contingency_bf16_decode",
                      "s_per_call": round(t, 5),
                      "tops": round(flops / t / 1e12, 1)}), flush=True)

    # exactness: bf16 counts == int8 counts on one block
    @jax.jit
    def counts_both(b):
        codes = unpack_bed_codes(b)
        Xi = geno_onehot(codes).reshape(3 * M, -1)
        Xb = geno_onehot(codes, dtype=jnp.bfloat16).reshape(3 * M, -1)
        ci = jnp.dot(Xi, Xi.T, preferred_element_type=jnp.int32)
        cb = jnp.dot(Xb, Xb.T, preferred_element_type=jnp.float32)
        return jnp.array_equal(ci.astype(jnp.float32), cb)

    print(json.dumps({"probe": "contingency_bf16_exact",
                      "equal": bool(np.asarray(counts_both(beds[0])))}),
          flush=True)


if __name__ == "__main__":
    if "--bf16" in sys.argv:
        bf16_variant()
    else:
        sys.exit(main())
