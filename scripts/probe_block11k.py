"""Probe: the reference's DEFAULT operating point — an ~11k-marker block.

Default max_block_size is 11000 (`/root/reference/ci-gwas.py:75`); the bench
has so far only measured 1024/2048-marker blocks, which take different code
routes (fused panel, dense L1). This runs the production two-stage cusk flow
(`pipelines/cusk.py:_run_block`, >4096 branch) on a synthetic AR(1)-LD block
and reports per-stage + per-level walls, degree distributions, and
enumerated-test rates, so the level >= 2 optimization targets the real
workload.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M = int(os.environ.get("PROBE_M", 11000))
N = int(os.environ.get("PROBE_N", 16384))
P = 8
AR = float(os.environ.get("PROBE_AR", 0.92))


def build_block(m, n, p):
    rng = np.random.default_rng(0)
    G = np.empty((m, n), dtype=np.float32)
    prev = rng.normal(size=n)
    for i in range(m):
        prev = AR * prev + np.sqrt(1 - AR**2) * rng.normal(size=n)
        pfreq = 1 / (1 + np.exp(-prev * 0.8))
        G[i] = (rng.random(n) < pfreq) + (rng.random(n) < pfreq)
    Y = rng.normal(size=(p, n)).astype(np.float32)
    for t in range(p):
        for k in rng.integers(0, m, 5):
            Y[t] += 0.2 * (G[k] - G[k].mean()) / G[k].std()
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    return G, Y


def main():
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.constants import ML
    from cigwas_tpu.ops.corr import corr_panel_device_tiled
    from cigwas_tpu.skeleton import reduce_gcs, skeleton, subset_variables
    from cigwas_tpu.utils.stats import threshold_array

    t0 = time.perf_counter()
    G, Y = build_block(M, N, P)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    print(f"[build] {time.perf_counter() - t0:.1f}s  block {M}x{N}")

    th = threshold_array(N, 1e-4)

    def two_stage(stats):
        # mirrors pipelines/cusk._run_block's >4096 device-resident branch
        t = time.perf_counter()
        C_dev, v_panel = corr_panel_device_tiled(bb, Y, means, stds, N)
        # axon: only a value fetch truly synchronizes (CLAUDE.md)
        float(np.asarray(C_dev[0, 0]))
        stats["corr_wall_s"] = time.perf_counter() - t
        t = time.perf_counter()
        res1 = skeleton(
            C_dev, th, 3, C_dev=C_dev, n_var=v_panel, want_pmax=False,
            stats=stats,
        )
        stats["stage1_wall_s"] = time.perf_counter() - t
        deg = res1.G.sum(axis=1)
        stats["stage1_deg"] = (
            int(deg.max()), float(deg.mean()), int(np.median(deg))
        )
        t = time.perf_counter()
        keep = subset_variables(res1.G, M + P, M, 1)
        gcs = reduce_gcs(res1.G, C_dev, res1.sepset, keep, M + P, P, 3)
        s2stats = {}
        res2 = skeleton(gcs.C, th, ML, stats=s2stats, want_pmax=False)
        stats["stage2_wall_s"] = time.perf_counter() - t
        stats["stage2_nvar"] = gcs.num_var
        stats["stage2_levels"] = s2stats.get("level_wall_s")
        return res1

    for rep in range(2):
        stats = {}
        t = time.perf_counter()
        res = two_stage(stats)
        wall = time.perf_counter() - t
        lvl = stats.get("level_wall_s", {})
        deep = sum(w for l, w in lvl.items() if l >= 2)
        print(f"[rep {rep}] total {wall:.1f}s  corr {stats['corr_wall_s']:.1f}s  "
              f"stage1 {stats['stage1_wall_s']:.1f}s  stage2 {stats['stage2_wall_s']:.1f}s")
        print(f"  stage1 levels: { {k: round(v,2) for k,v in lvl.items()} }")
        print(f"  stage1 deg after (max/mean/med): {stats['stage1_deg']}")
        print(f"  stage2 nvar {stats['stage2_nvar']}  levels "
              f"{stats['stage2_levels']}")
        if stats.get("ci_tests") and deep > 0:
            print(f"  level>=2 tests {stats['ci_tests']:.3e}  deep wall {deep:.2f}s  "
                  f"rate {stats['ci_tests']/deep:.3e}/s")
    # degree profile entering each level (from a fresh level-0/1 pass)
    return 0


if __name__ == "__main__":
    sys.exit(main())
