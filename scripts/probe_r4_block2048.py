#!/usr/bin/env python
"""Probe: bisect the r3 block2048 regression (8.29 s vs 2.66 s in r2).

Runs the EXACT `_phase_production_block` workload through four route
variants, min-of-3 each, with per-phase stats marks:

  A dev    : current default — device-resident levels 1..3
  B devnp  : device-resident, want_pmax=False (production cusk setting)
  C lanes  : DEV_RESIDENT_MAX=0 -> host loop, level-1 lanes local sweep
  D dense  : DEV_RESIDENT_MAX=0, L1_LOCAL_MAX_WIDTH=0 -> r2's route
             (pre-dispatched dense level-1 overlapping the C fetch)
  E densenp: route D with want_pmax=False

Writes one JSON line per measurement to stdout (run with nohup, poll log).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_data():
    rng = np.random.default_rng(0)
    m, n, p = 2048, 16384, 8
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
    return G, Y, m, n, p


def main():
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.skeleton.cupc import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    G, Y, m, n, p = build_data()
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    th = threshold_array(n, 1e-4)

    def run_block(want_pmax, stats=None):
        C_dev, v = corr_panel_device(bb, Y, means, stds, n)
        return skeleton(C_dev, th, 3, n_var=v, stats=stats,
                        want_pmax=want_pmax)

    variants = [
        ("A_dev", 4096, 128, True),
        ("B_devnp", 4096, 128, False),
        ("C_lanes", 0, 128, True),
        ("D_dense", 0, 0, True),
        ("E_densenp", 0, 0, False),
    ]
    for name, drm, l1w, wp in variants:
        cupc.DEV_RESIDENT_MAX = drm
        cupc.L1_LOCAL_MAX_WIDTH = l1w
        run_block(wp)  # warmup/compile this route
        walls, all_stats = [], []
        for rep in range(3):
            stats = {}
            t0 = time.perf_counter()
            run_block(wp, stats=stats)
            walls.append(round(time.perf_counter() - t0, 3))
            stats["level_wall_s"] = {
                str(k): round(v, 3) for k, v in stats.get("level_wall_s", {}).items()
            }
            all_stats.append({k: (round(v, 3) if isinstance(v, float) else v)
                              for k, v in stats.items() if k != "ci_tests"})
        print(json.dumps({"variant": name, "walls": walls,
                          "min_wall": min(walls), "stats": all_stats}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
