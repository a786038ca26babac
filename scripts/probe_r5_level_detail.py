#!/usr/bin/env python
"""Probe: where do the level >= 2 walls actually go? (r5, VERDICT ask #2)

Runs the bench's 2048-block and 11k-block workloads with the skeleton's
level_detail marks (host_alloc / dispatch / device_wait / fetch_scatter /
epilogue / gather_fallback) exposed per level, min-of-3, for both
want_pmax settings. The split decides whether the >= 5e9 deep-level
tests/s target needs a fused Pallas sweep (device-bound) or fewer/learner
launches (dispatch/fetch-bound).

Writes one JSON line per measurement (run with nohup, poll the log).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_data(m, n, p, seed=0):
    rng = np.random.default_rng(seed)
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
    return G, Y


def run_case(tag, m, n, p, want_pmax):
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device, corr_panel_device_tiled
    from cigwas_tpu.skeleton.cupc import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    G, Y = build_data(m, n, p)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    th = threshold_array(n, 1e-4)
    scratch = {}

    def run(stats=None):
        if m <= 4096:
            C_dev, v = corr_panel_device(bb, Y, means, stds, n)
        else:
            C_dev, v = corr_panel_device_tiled(bb, Y, means, stds, n)
        return skeleton(C_dev, th, 3, n_var=v, stats=stats,
                        want_pmax=want_pmax, scratch=scratch)

    run()  # compile
    best = None
    for _ in range(3):
        stats = {}
        t0 = time.perf_counter()
        run(stats=stats)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, stats)
    wall, stats = best
    out = {
        "tag": tag, "want_pmax": want_pmax, "wall_s": round(wall, 3),
        "level_wall_s": {
            str(k): round(v, 3)
            for k, v in stats.get("level_wall_s", {}).items()
        },
        "ci_tests": stats.get("ci_tests", 0),
        "level_detail": {
            str(l): {k: round(v, 4) if isinstance(v, float) else v
                     for k, v in d.items()}
            for l, d in stats.get("level_detail", {}).items()
        },
    }
    print(json.dumps(out), flush=True)


def main():
    run_case("b2048", 2048, 16384, 8, True)
    run_case("b2048", 2048, 16384, 8, False)
    run_case("b11k", 11000, 16384, 8, False)


if __name__ == "__main__":
    main()
