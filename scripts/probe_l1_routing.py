#!/usr/bin/env python
"""Compare the XLA tiled level-1 sweep vs the Pallas kernel at production
panel sizes (amortized over K iterations in one dispatch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.ops.pcorr import _level1_dense_padded
from cigwas_tpu.ops.pallas.level1 import level1_min_rho_masked

K = int(os.environ.get("K", 8))
VP = int(os.environ.get("VP", 2176))


def timed(name, fn_k, fn_1, arg_k, arg_1, tests):
    float(np.asarray(fn_k(arg_k)).ravel()[0])
    float(np.asarray(fn_1(arg_1)).ravel()[0])
    ts_k, ts_1 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(fn_k(arg_k)).ravel()[0]); ts_k.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(fn_1(arg_1)).ravel()[0]); ts_1.append(time.perf_counter() - t0)
    per = (min(ts_k) - min(ts_1)) / (K - 1)
    print(f"{name}: {per*1e3:.2f} ms/iter -> {tests/per/1e9:.1f} e9 tests/s", flush=True)


def main():
    print("device:", jax.devices()[0], f"K={K} VP={VP}")
    rng = np.random.default_rng(1)
    Cs = rng.normal(size=(K, VP, VP)).astype(np.float32) * 0.05
    Cs = (Cs + Cs.transpose(0, 2, 1)) / 2
    for i in range(K):
        np.fill_diagonal(Cs[i], 1.0)
    dev = jax.device_put(Cs)

    def mk(kern, k):
        @jax.jit
        def run(cs):
            G = jnp.ones((VP, VP), dtype=bool)
            def body(c, Ci):
                rho, s = kern(Ci, G)
                return c + rho.sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), cs)
            return s.reshape(1)
        return run

    for tile in (256, 128, 64):
        if VP % tile:
            continue
        kern = lambda Ci, G, t=tile: _level1_dense_padded(Ci, G, t)
        timed(f"xla tile={tile}", mk(kern, K), mk(kern, 1), dev, dev[:1], VP**3)
    timed("pallas", mk(level1_min_rho_masked, K), mk(level1_min_rho_masked, 1), dev, dev[:1], VP**3)


if __name__ == "__main__":
    main()
