#!/usr/bin/env python
"""Probe: the bench's 11k block with the Pallas gather off vs on.

Exact `_phase_block11k` stage-1 workload (corr panel + 3-level skeleton,
want_pmax=False), min-of-2 per route, per-level walls + l0/fetch marks,
byte-identity assert. One JSON line per route.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device_tiled
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.skeleton.cupc import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    m, n, p = 11000, 16384, 8
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(m, n)).astype(np.float32)
    ar, scale = 0.92, np.sqrt(1 - 0.92**2)
    prev = np.empty((m, n), dtype=np.float32)
    acc = noise[0]
    prev[0] = acc
    for i in range(1, m):
        acc = ar * acc + scale * noise[i]
        prev[i] = acc
    pfreq = 1 / (1 + np.exp(-prev * 0.8))
    u1 = rng.random((m, n)).astype(np.float32)
    u2 = rng.random((m, n)).astype(np.float32)
    G = (u1 < pfreq).astype(np.float32) + (u2 < pfreq)
    Y = rng.normal(size=(p, n)).astype(np.float32)
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    th = threshold_array(n, 1e-4)

    scratch: dict = {}

    def run(stats=None):
        C_dev, v = corr_panel_device_tiled(bb, Y, means, stds, n, stats=stats)
        return skeleton(
            C_dev, th, 3, C_dev=C_dev, n_var=v, want_pmax=False, stats=stats,
            scratch=scratch,
        )

    outs = {}
    for flag, l1w in (("0", 128), ("1", 128)):
        cupc.PALLAS_GATHER = flag
        cupc.L1_LOCAL_MAX_WIDTH = l1w
        res_warm = run()  # warmup/compile + output capture
        outs[(flag, l1w)] = res_warm.G  # adjacency only (full results hoard GBs)
        del res_warm
        walls, infos = [], []
        for _ in range(2):
            stats = {}
            t0 = time.perf_counter()
            run(stats=stats)
            walls.append(round(time.perf_counter() - t0, 2))
            infos.append({
                "panel": {k: round(stats[k], 2) for k in list(stats)
                          if k.startswith("panel_")},
                "l0": round(stats.get("l0_wall_s", 0), 2),
                "preamble": round(stats.get("preamble_s", 0), 2),
                "pre_l1": round(stats.get("pre_l1_dispatch_s", 0), 2),
                "sep_alloc": round(stats.get("sepset_alloc_s", 0), 2),
                "skel_wall": round(stats.get("skeleton_wall_s", 0), 2),
                "levels": {str(k): round(v_, 2)
                           for k, v_ in stats.get("level_wall_s", {}).items()},
                "detail": {
                    str(k): {kk: round(vv, 2) for kk, vv in d_.items()}
                    for k, d_ in stats.get("level_detail", {}).items()
                },
                "ci_tests": stats.get("ci_tests", 0),
            })
        print(json.dumps({"probe": "block11k", "pallas": flag,
                          "l1_width": l1w,
                          "walls": walls, "min": min(walls),
                          "info": infos}), flush=True)
    base = outs[("0", 128)]
    same = all(np.array_equal(base, o) for o in outs.values())
    print(json.dumps({"probe": "block11k", "byte_identical": bool(same)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
