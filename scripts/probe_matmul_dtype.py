#!/usr/bin/env python
"""Probe MXU throughput for the contingency matmul at several operand dtypes.

Times X @ X.T for a one-hot (3m, n) panel with f32 / bf16 / int8 operands.
Counts are exact in every case (products are {0,1}; accumulation f32 or i32).
Run on the real TPU: timings fetch an on-device scalar (CLAUDE.md: the remote
platform only synchronizes on value fetch).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1024
N = 16384
K = 3 * M
FLOPS = 2.0 * K * N * K

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=(M, N), dtype=np.int32)
oh = np.stack([(codes == 3), (codes == 2), (codes == 0)], axis=1).reshape(K, N)


def bench(x, acc_dtype, label, reps=5):
    @jax.jit
    def f(a):
        c = jnp.dot(a, a.T, preferred_element_type=acc_dtype)
        return c.astype(jnp.float32).sum()

    float(f(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:10s} dt={dt*1e3:8.2f} ms  {FLOPS/dt/1e12:7.2f} TFLOP/s")
    return dt


print("device:", jax.devices()[0])
x_f32 = jax.device_put(oh.astype(np.float32))
x_bf16 = jax.device_put(oh.astype(jnp.bfloat16))
x_i8 = jax.device_put(oh.astype(np.int8))

bench(x_f32, jnp.float32, "f32")
bench(x_bf16, jnp.float32, "bf16->f32")
bench(x_i8, jnp.int32, "int8->i32")

# also check correctness parity int8 vs f32
c_f32 = np.asarray(jax.jit(lambda a: jnp.dot(a, a.T, preferred_element_type=jnp.float32))(x_f32))
c_i8 = np.asarray(jax.jit(lambda a: jnp.dot(a, a.T, preferred_element_type=jnp.int32))(x_i8))
print("int8 vs f32 exact:", np.array_equal(c_f32, c_i8.astype(np.float32)))
c_bf = np.asarray(jax.jit(lambda a: jnp.dot(a, a.T, preferred_element_type=jnp.float32))(x_bf16))
print("bf16 vs f32 exact:", np.array_equal(c_f32, c_bf))
