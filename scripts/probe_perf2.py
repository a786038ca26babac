#!/usr/bin/env python
"""Amortized TPU timings: K iterations inside one dispatch, one scalar fetch.

Separates real kernel cost from the ~22ms remote dispatch+fetch floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.ops.corr import _kendall_from_counts
from cigwas_tpu.ops.decode import geno_onehot, unpack_bed_codes

M, N = 1024, 16384
K = int(os.environ.get("K", 16))


def timed(name, make_fn, flops_per_iter=None):
    """make_fn(k) -> jitted fn over stacked input of k iters; times k=K vs k=1."""
    fn_k, arg_k = make_fn(K)
    fn_1, arg_1 = make_fn(1)
    float(np.asarray(fn_k(arg_k)).ravel()[0])
    float(np.asarray(fn_1(arg_1)).ravel()[0])
    ts_k, ts_1 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(fn_k(arg_k)).ravel()[0]); ts_k.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(fn_1(arg_1)).ravel()[0]); ts_1.append(time.perf_counter() - t0)
    per_iter = (min(ts_k) - min(ts_1)) / (K - 1)
    line = f"{name}: {per_iter*1e3:.2f} ms/iter (K-run {min(ts_k)*1e3:.1f} ms, 1-run {min(ts_1)*1e3:.1f} ms)"
    if flops_per_iter:
        line += f" -> {flops_per_iter/per_iter/1e12:.1f} TFLOP/s"
    print(line, flush=True)
    return per_iter


def stacked_beds(k):
    rng = np.random.default_rng(0)
    return jax.device_put(rng.integers(0, 256, size=(k, M, N // 4), dtype=np.uint8))


def main():
    print("device:", jax.devices()[0], f"K={K}")
    cflops = 2 * (3 * M) ** 2 * N

    def mk_counts(dtype, acc):
        def make(k):
            @jax.jit
            def run(beds):
                def body(c, bb):
                    X = geno_onehot(unpack_bed_codes(bb), dtype=dtype).reshape(3 * M, -1)
                    cnt = jnp.dot(X, X.T, preferred_element_type=acc)
                    return c + cnt.astype(jnp.float32).sum(), None
                s, _ = jax.lax.scan(body, jnp.float32(0), beds)
                return s.reshape(1)
            return run, stacked_beds(k)
        return make

    timed("counts bf16->f32", mk_counts(jnp.bfloat16, jnp.float32), cflops)
    timed("counts int8->int32", mk_counts(jnp.int8, jnp.int32), cflops)

    def mk_decode(k):
        @jax.jit
        def run(beds):
            def body(c, bb):
                X = geno_onehot(unpack_bed_codes(bb)).reshape(3 * M, -1)
                return c + X.astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), beds)
            return s.reshape(1)
        return run, stacked_beds(k)

    timed("decode+onehot only", mk_decode)

    def mk_kendall(k):
        @jax.jit
        def run(beds):
            def body(c, bb):
                X = geno_onehot(unpack_bed_codes(bb)).reshape(3 * M, -1)
                cnt = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
                C = _kendall_from_counts(cnt.reshape(M, 3, M, 3).transpose(0, 2, 1, 3))
                return c + C.sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), beds)
            return s.reshape(1)
        return run, stacked_beds(k)

    timed("counts+kendall", mk_kendall, cflops)

    # level-1 sweeps on (vp, vp) panel
    vp = 1152
    rng = np.random.default_rng(1)
    Cs = rng.normal(size=(K, vp, vp)).astype(np.float32) * 0.05
    Cs = (Cs + Cs.transpose(0, 2, 1)) / 2
    for i in range(K):
        np.fill_diagonal(Cs[i], 1.0)

    from cigwas_tpu.ops.pcorr import _level1_dense_padded

    def mk_l1(k):
        @jax.jit
        def run(cs):
            G = jnp.ones((vp, vp), dtype=bool)
            def body(c, Ci):
                rho, s = _level1_dense_padded(Ci, G, 128)
                return c + rho.sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), cs)
            return s.reshape(1)
        return run, jax.device_put(Cs[:k])

    t = timed("level1 XLA sweep", mk_l1)
    print(f"  level1 tests/s: {vp**3/t/1e9:.1f} e9", flush=True)

    from cigwas_tpu.ops.pallas.level1 import level1_min_rho_masked

    def mk_l1p(k):
        @jax.jit
        def run(cs):
            G = jnp.ones((vp, vp), dtype=bool)
            def body(c, Ci):
                rho, s = level1_min_rho_masked(Ci, G)
                return c + rho.sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), cs)
            return s.reshape(1)
        return run, jax.device_put(Cs[:k])

    try:
        t = timed("level1 pallas sweep", mk_l1p)
        print(f"  level1 pallas tests/s: {vp**3/t/1e9:.1f} e9", flush=True)
    except Exception as e:
        print("pallas failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
