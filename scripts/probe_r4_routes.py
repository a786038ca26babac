#!/usr/bin/env python
"""Probe: level-routing gates by block size (production want_pmax=False).

For m in {512, 1024, 4096}: min-of-3 walls + per-level walls through
  B_devnp : device-resident levels 1..3 (DEV_RESIDENT_MAX=inf)
  E_densenp: host loop, dense level-1 (r2 route)
  C_lanesnp: host loop, lanes level-1
(2048 was measured by probe_r4_block2048.py: E 1.93 < B 2.35 < C ~2.4.)

One JSON line per (size, variant). Run with nohup; poll the log.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_data(m, n=16384, p=8, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=(m, n)).astype(np.float32)
    ar, scale = 0.92, np.sqrt(1 - 0.92**2)
    G = np.empty((m, n), dtype=np.float32)
    acc = noise[0]
    for i in range(m):
        acc = ar * acc + scale * noise[i] if i else acc
        pfreq = 1 / (1 + np.exp(-acc * 0.8))
        G[i] = (rng.random(n) < pfreq) + (rng.random(n) < pfreq)
    Y = rng.normal(size=(p, n)).astype(np.float32)
    for t in range(p):
        for k in rng.integers(0, m, 5):
            Y[t] += 0.2 * (G[k] - G[k].mean()) / G[k].std()
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    return G, Y, n


def main():
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.skeleton.cupc import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    variants = [
        ("B_devnp", 1 << 30, 128),
        ("E_densenp", 0, 0),
        ("C_lanesnp", 0, 128),
    ]
    for m in (512, 1024, 4096):
        G, Y, n = build_data(m)
        bb = encode_bed_values(G)
        means, stds = G.mean(axis=1), G.std(axis=1)
        th = threshold_array(n, 1e-4)

        def run_block(stats=None):
            C_dev, v = corr_panel_device(bb, Y, means, stds, n)
            return skeleton(C_dev, th, 3, n_var=v, stats=stats,
                            want_pmax=False)

        for name, drm, l1w in variants:
            cupc.DEV_RESIDENT_MAX = drm
            cupc.L1_LOCAL_MAX_WIDTH = l1w
            run_block()  # warmup/compile this route
            walls, all_stats = [], []
            for _ in range(3):
                stats = {}
                t0 = time.perf_counter()
                run_block(stats=stats)
                walls.append(round(time.perf_counter() - t0, 3))
                stats["level_wall_s"] = {
                    str(k): round(v, 3)
                    for k, v in stats.get("level_wall_s", {}).items()
                }
                all_stats.append({
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in stats.items() if k != "ci_tests"
                })
            print(json.dumps({"m": m, "variant": name, "walls": walls,
                              "min_wall": min(walls), "stats": all_stats}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
