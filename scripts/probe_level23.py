"""Probe: dense local-panel levels 2/3 vs the combinatorial chunk scan.

Runs the bench's 2048-marker production block on the real TPU and reports
per-level wall + enumerated-test throughput for both routings.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cigwas_tpu.io.bed import encode_bed_values
from cigwas_tpu.ops.corr import corr_panel_device
import cigwas_tpu.skeleton.cupc as cupc
from cigwas_tpu.utils.stats import threshold_array


def build_block(m=2048, n=16384, p=8):
    rng = np.random.default_rng(0)
    G = np.empty((m, n), dtype=np.float32)
    prev = rng.normal(size=n)
    for i in range(m):
        prev = 0.92 * prev + np.sqrt(1 - 0.92**2) * rng.normal(size=n)
        pfreq = 1 / (1 + np.exp(-prev * 0.8))
        G[i] = (rng.random(n) < pfreq) + (rng.random(n) < pfreq)
    Y = rng.normal(size=(p, n)).astype(np.float32)
    for t in range(p):
        for k in rng.integers(0, m, 5):
            Y[t] += 0.2 * (G[k] - G[k].mean()) / G[k].std()
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    return encode_bed_values(G), Y, G.mean(axis=1), G.std(axis=1), n


def run(route, bb, Y, means, stds, n):
    th = threshold_array(n, 1e-4)
    orig = cupc._run_level_local
    if route == "combi":
        def combi(C_dev, G, l, rho_th, verbose=False, engine=None, stats=None):
            removed, rho_min, rank = cupc._run_level(
                C_dev, G, l, rho_th, cupc.DEFAULT_CHUNK, engine=engine, stats=stats)
            nn = G.shape[0]
            sep = np.zeros((nn, nn, l), np.int32)
            return removed, rho_min, sep
        cupc._run_level_local = combi
    try:
        stats = {}
        C_dev, v = corr_panel_device(bb, Y, means, stds, n)
        t0 = time.perf_counter()
        res = cupc.skeleton(C_dev, th, 3, n_var=v, stats=stats)
        wall = time.perf_counter() - t0
    finally:
        cupc._run_level_local = orig
    return res, stats, wall


def main():
    bb, Y, means, stds, n = build_block()
    for route in ("local", "combi"):
        # warmup (compile)
        run(route, bb, Y, means, stds, n)
        res, stats, wall = run(route, bb, Y, means, stds, n)
        deep = sum(w for l, w in stats.get("level_wall_s", {}).items() if l >= 2)
        print(f"[{route}] skeleton wall {wall:.2f}s  edges {int(res.G.sum())}  "
              f"levels {stats.get('level_wall_s')}")
        if stats.get("ci_tests"):
            print(f"[{route}] level>=2 tests {stats['ci_tests']:.3e}  "
                  f"deep wall {deep:.2f}s  rate {stats['ci_tests']/deep:.3e}/s")


if __name__ == "__main__":
    main()
