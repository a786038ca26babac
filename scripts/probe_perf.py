#!/usr/bin/env python
"""Profile the fused bench step's components on the real TPU.

Times each piece separately by fetching an on-device scalar reduction
(block_until_ready does not synchronize on the remote platform).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.ops.corr import _kendall_from_counts
from cigwas_tpu.ops.decode import geno_onehot, geno_value_valid, unpack_bed_codes

M, N = 1024, 16384
REPS = 3


def timeit(name, fn, *args):
    fn(*args)[0].block_until_ready()
    # fetch forces sync
    float(np.asarray(fn(*args)[0]).ravel()[0])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    bed = jax.device_put(rng.integers(0, 256, size=(M, N // 4), dtype=np.uint8))
    print("device:", jax.devices()[0])

    # 1. decode + onehot + sum (forces full decode work)
    @jax.jit
    def f_decode(bb):
        X = geno_onehot(unpack_bed_codes(bb)).reshape(3 * M, -1)
        return (jnp.sum(X.astype(jnp.float32)).reshape(1),)

    timeit("decode+onehot(bf16)+sum", f_decode, bed)

    # 2. decode + counts matmul bf16 -> f32
    @jax.jit
    def f_counts_bf16(bb):
        X = geno_onehot(unpack_bed_codes(bb)).reshape(3 * M, -1)
        counts = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
        return (jnp.sum(counts).reshape(1),)

    t_bf16 = timeit("counts matmul bf16->f32", f_counts_bf16, bed)
    flops = 2 * (3 * M) ** 2 * N
    print(f"  bf16 matmul: {flops/t_bf16/1e12:.1f} TFLOP/s")

    # 3. same with int8 operands -> int32 accum
    @jax.jit
    def f_counts_int8(bb):
        X = geno_onehot(unpack_bed_codes(bb), dtype=jnp.int8).reshape(3 * M, -1)
        counts = jnp.dot(X, X.T, preferred_element_type=jnp.int32)
        return (jnp.sum(counts).reshape(1),)

    t_i8 = timeit("counts matmul int8->int32", f_counts_int8, bed)
    print(f"  int8 matmul: {flops/t_i8/1e12:.1f} TOP/s")

    # 4. counts + kendall map
    @jax.jit
    def f_kendall(bb):
        X = geno_onehot(unpack_bed_codes(bb)).reshape(3 * M, -1)
        counts = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
        C = _kendall_from_counts(counts.reshape(M, 3, M, 3).transpose(0, 2, 1, 3))
        return (jnp.sum(C).reshape(1),)

    timeit("counts+kendall", f_kendall, bed)

    # 4b. int8 counts + kendall map
    @jax.jit
    def f_kendall_i8(bb):
        X = geno_onehot(unpack_bed_codes(bb), dtype=jnp.int8).reshape(3 * M, -1)
        counts = jnp.dot(X, X.T, preferred_element_type=jnp.int32).astype(jnp.float32)
        C = _kendall_from_counts(counts.reshape(M, 3, M, 3).transpose(0, 2, 1, 3))
        return (jnp.sum(C).reshape(1),)

    timeit("counts(int8)+kendall", f_kendall_i8, bed)

    # 5. level-1 XLA tiled sweep on a (1032, 1032)-ish panel
    v = M + 8
    vp = v + (-v) % 128
    C_np = rng.normal(size=(vp, vp)).astype(np.float32) * 0.1
    C_np = (C_np + C_np.T) / 2
    np.fill_diagonal(C_np, 1.0)
    C_dev = jax.device_put(C_np)
    G_dev = jax.device_put(np.ones((vp, vp), dtype=bool))

    from cigwas_tpu.ops.pcorr import _level1_dense_padded

    @jax.jit
    def f_l1_xla(C, G):
        rho, s = _level1_dense_padded(C, G, 128)
        return (jnp.sum(rho).reshape(1),)

    t_l1 = timeit("level1 XLA tiled sweep", f_l1_xla, C_dev, G_dev)
    print(f"  tests/s: {vp*vp*vp/t_l1/1e9:.1f} e9")

    # 6. level-1 pallas sweep
    from cigwas_tpu.ops.pallas.level1 import level1_min_rho_masked

    @jax.jit
    def f_l1_pl(C, G):
        rho, s = level1_min_rho_masked(C, G)
        return (jnp.sum(rho).reshape(1),)

    try:
        t_pl = timeit("level1 pallas sweep", f_l1_pl, C_dev, G_dev)
        print(f"  tests/s: {vp*vp*vp/t_pl/1e9:.1f} e9")
    except Exception as e:
        print("pallas sweep failed:", e)

    # 7. dispatch+fetch floor: trivial kernel
    @jax.jit
    def f_nop(bb):
        return (jnp.sum(bb, dtype=jnp.int32).reshape(1).astype(jnp.float32),)

    timeit("dispatch+fetch floor (byte sum)", f_nop, bed)


if __name__ == "__main__":
    main()
