#!/usr/bin/env python
"""Probe: per-launch element budget at the 11k block (launch-bound levels).

The 11k levels run ~22 launches each at budget 2^26 (node_tile 512 at
d_pad 128); relay dispatch overhead ~0.3-0.5 s/launch dominates the level
walls. Sweep LOCAL_ELEM_BUDGET over {26, 27, 28} with the Pallas gather
route on, min-of-2 per setting, level walls + launch counts (verbose).
One JSON line per setting.
"""

import io
import json
import re
import sys
import time
from contextlib import redirect_stdout

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
    G = (rng.random((m, n)) < pfreq).astype(np.float32) + (
        rng.random((m, n)) < pfreq
    )
    Y = rng.normal(size=(p, n)).astype(np.float32)
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    th = threshold_array(n, 1e-4)
    cupc.PALLAS_GATHER = "1"

    def run(stats=None, verbose=False):
        C_dev, v = corr_panel_device_tiled(bb, Y, means, stds, n)
        return skeleton(
            C_dev, th, 3, C_dev=C_dev, n_var=v, want_pmax=False,
            stats=stats, verbose=verbose,
        )

    ref = None
    for log2 in (26, 27, 28):
        cupc.LOCAL_ELEM_BUDGET = 1 << log2
        buf = io.StringIO()
        with redirect_stdout(buf):
            out = run(verbose=True)  # warmup/compile + launch counts
        launches = re.findall(r"\[(?:level|hetcor level) \d\].*launches: (\d+)",
                              buf.getvalue())
        if ref is None:
            ref = out
        walls, lv = [], []
        for _ in range(2):
            stats = {}
            t0 = time.perf_counter()
            run(stats=stats)
            walls.append(round(time.perf_counter() - t0, 2))
            lv.append({str(k): round(v_, 2)
                       for k, v_ in stats.get("level_wall_s", {}).items()})
        print(json.dumps({"probe": "budget", "log2": log2, "walls": walls,
                          "min": min(walls), "levels": lv,
                          "launches": launches,
                          "byte_identical": bool(np.array_equal(ref.G, out.G))}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
