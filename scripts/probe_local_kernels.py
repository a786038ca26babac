"""Microbench: dense local-panel level-2/3 sweep throughput on the TPU.

Sweeps (d_pad, ct, node_tile) and reports dense-slot and useful-test rates,
vs the combinatorial level_scan_minrho at the same degree.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.ops import pcorr as pcorr_ops

V = 2176
rng = np.random.default_rng(0)
A = rng.normal(size=(V, 400)).astype(np.float32)
C = np.corrcoef(A).astype(np.float32)
C_dev = jnp.asarray(C)


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


def bench_l2(d, nt, ct, n_nodes):
    nbrs = np.stack([rng.choice(V, size=d, replace=False) for _ in range(nt)])
    nbrs.sort(axis=1)
    node_ixs = rng.choice(V, size=nt, replace=False).astype(np.int32)
    deg = np.full(nt, d, np.int32)
    args = (C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs.astype(np.int32)),
            jnp.asarray(deg))
    r, p = pcorr_ops.level2_local_sweep(*args, ct)
    fetch(r.sum())
    launches = max(1, n_nodes // nt)
    t0 = time.perf_counter()
    outs = []
    for _ in range(launches):
        r, p = pcorr_ops.level2_local_sweep(*args, ct)
        outs.append(r)
    s = sum(o.sum() for o in outs)
    fetch(s)
    dt = time.perf_counter() - t0
    slots = launches * nt * (d * d / 2) * d
    tests = launches * nt * (d * (d - 1) / 2) * d
    print(f"l2 d={d:4d} nt={nt:4d} ct={ct:4d} x{launches:3d}: {dt*1e3:8.1f} ms  "
          f"slots/s {slots/dt:.3e}  tests/s {tests/dt:.3e}")
    return tests / dt


def bench_l3(d, nt, ct, n_nodes):
    nbrs = np.stack([rng.choice(V, size=d, replace=False) for _ in range(nt)])
    nbrs.sort(axis=1)
    node_ixs = rng.choice(V, size=nt, replace=False).astype(np.int32)
    deg = np.full(nt, d, np.int32)
    args = (C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs.astype(np.int32)),
            jnp.asarray(deg))
    r, p = pcorr_ops.level3_local_sweep(*args, ct)
    fetch(r.sum())
    launches = max(1, n_nodes // nt)
    t0 = time.perf_counter()
    outs = []
    for _ in range(launches):
        r, p = pcorr_ops.level3_local_sweep(*args, ct)
        outs.append(r)
    s = sum(o.sum() for o in outs)
    fetch(s)
    dt = time.perf_counter() - t0
    import math
    slots = launches * nt * (d ** 3 / 6) * d
    tests = launches * nt * math.comb(d, 3) * d
    print(f"l3 d={d:4d} nt={nt:4d} ct={ct:4d} x{launches:3d}: {dt*1e3:8.1f} ms  "
          f"slots/s {slots/dt:.3e}  tests/s {tests/dt:.3e}")
    return tests / dt


def main():
    print("=== level 2 ===")
    for d, nt, ct in [(64, 512, 64), (64, 2048, 64), (128, 128, 128),
                      (128, 512, 128), (256, 128, 256), (512, 32, 256)]:
        bench_l2(d, nt, ct, 2048)
    print("=== level 3 ===")
    for d, nt, ct in [(32, 512, 32), (64, 256, 64), (64, 1024, 64),
                      (128, 64, 128), (128, 256, 64)]:
        bench_l3(d, nt, ct, 2048)


if __name__ == "__main__":
    main()
