#!/usr/bin/env python
"""Amortized MXU probe: K serially-dependent matmuls inside one jit.

Each iteration writes the previous full-matrix sum into operand element
[0, 0], so XLA can neither hoist the dot out of the loop nor slice it down
(the full product feeds the next iteration).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1024
N = 16384
K = 3 * M
FLOPS = 2.0 * K * N * K
REPS_IN_JIT = 16

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=(M, N), dtype=np.int32)
oh = np.stack([(codes == 3), (codes == 2), (codes == 0)], axis=1).reshape(K, N)


@jax.jit
def floor_op(a):
    return a.astype(jnp.float32).sum()


def timeit(f, x, reps=5):
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


print("device:", jax.devices()[0])
x_f32 = jax.device_put(oh.astype(np.float32))
x_bf16 = jax.device_put(oh.astype(jnp.bfloat16))
x_i8 = jax.device_put(oh.astype(np.int8))

floor = timeit(floor_op, x_bf16)
print(f"dispatch floor: {floor*1e3:.2f} ms")


def make_loop(acc_dtype):
    @jax.jit
    def f(a):
        def body(i, carry):
            a, s = carry
            a = a.at[0, 0].set((s % 2).astype(a.dtype))
            c = jnp.dot(a, a.T, preferred_element_type=acc_dtype)
            return (a, c.astype(jnp.float32).sum())

        _, s = jax.lax.fori_loop(0, REPS_IN_JIT, body, (a, jnp.float32(0.0)))
        return s

    return f


for label, x, acc in [
    ("f32", x_f32, jnp.float32),
    ("bf16", x_bf16, jnp.float32),
    ("int8", x_i8, jnp.int32),
]:
    f = make_loop(acc)
    dt = timeit(f, x)
    per = (dt - floor) / REPS_IN_JIT
    print(f"{label}: total {dt*1e3:.2f} ms, per-matmul {per*1e3:.3f} ms, "
          f"{FLOPS/per/1e12:.1f} TFLOP/s")
