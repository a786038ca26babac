#!/usr/bin/env python
"""Probe: Pallas DMA panel gather vs XLA element gather on the real TPU.

1. micro: (vp=11264, d=128, nt=512) gather walls, min-of-5, bit-identity
2. macro: the 2048-block production skeleton with PALLAS_GATHER=0 vs 1
   (host-loop route: DEV_RESIDENT_MAX=0), byte-identity + level walls

One JSON line per measurement. Run with nohup; poll the log.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fetch(x):
    return np.asarray(x)  # remote TPU: only a fetch synchronizes


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from cigwas_tpu.ops.pallas.panel_gather import gather_local_panels
    from cigwas_tpu.ops import pcorr as pcorr_ops

    from cigwas_tpu.ops.pallas.panel_gather import plan_window

    rng = np.random.default_rng(0)
    vp, d, nt, span = 11264, 128, 512, 400  # LD-like clustered neighbours
    # build the big panel ON DEVICE (a >50 MB host upload can stall the
    # relay indefinitely — CLAUDE.md); upload only a (vp, 64) factor
    A = rng.normal(size=(vp, 64)).astype(np.float32)

    @jax.jit
    def build_panel(Ad):
        Cd = jnp.dot(Ad, Ad.T, preferred_element_type=jnp.float32)
        dg = jax.lax.rsqrt(jnp.diagonal(Cd))
        Cd = Cd * dg[:, None] * dg[None, :]
        # sparse NaNs to exercise the NaN-count path
        key = jax.random.PRNGKey(0)
        mask = jax.random.uniform(key, Cd.shape) < 0.001
        return jnp.where(mask, jnp.nan, Cd)

    C_dev = build_panel(jax.device_put(A))
    centers = rng.integers(0, vp, nt)
    lo = np.clip(centers - span // 2, 0, vp - span)
    nbrs = (lo[:, None] + rng.integers(0, span, (nt, d))).astype(np.int32)
    nbrs.sort(axis=1)
    node_ixs = np.clip(centers, lo, lo + span - 1).astype(np.int32)
    deg = np.full(nt, d, np.int32)
    nb_dev = jnp.asarray(nbrs)
    nx_dev = jnp.asarray(node_ixs)

    @jax.jit
    def xla_gather(Cd, nx, nb):
        Cb = Cd[nb[:, :, None], nb[:, None, :]]
        qb = Cd[nx[:, None], nb]
        return Cb, qb

    W = plan_window(node_ixs, nbrs, deg, vp)[1]

    # warmup + bit-identity (compared ON DEVICE; fetching the 33 MB local
    # panels over the relay would dominate the probe)
    Cb_x, qb_x = xla_gather(C_dev, nx_dev, nb_dev)
    Cb_p, qb_p = gather_local_panels(C_dev, node_ixs, nbrs, deg)

    @jax.jit
    def same(a, b, qa, qc):
        eq = jnp.array_equal(jnp.nan_to_num(a), jnp.nan_to_num(b))
        eqn = jnp.array_equal(jnp.isnan(a), jnp.isnan(b))
        eqq = jnp.array_equal(jnp.nan_to_num(qa), jnp.nan_to_num(qc))
        return eq & eqn & eqq

    biteq = bool(fetch(same(Cb_x, Cb_p, qb_x, qb_p)))

    def timeit(fn, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            a, b = fn()
            # sync via tiny fetches
            fetch(jnp.sum(jnp.nan_to_num(a)) + jnp.sum(jnp.nan_to_num(b)))
            walls.append(round(time.perf_counter() - t0, 4))
        return walls

    wx = timeit(lambda: xla_gather(C_dev, nx_dev, nb_dev))
    wp = timeit(lambda: gather_local_panels(C_dev, node_ixs, nbrs, deg))
    bytes_needed = nt * d * d * 4
    print(json.dumps({
        "phase": "micro", "vp": vp, "d": d, "nt": nt, "window": W,
        "bit_identical": biteq,
        "xla_walls": wx, "pallas_walls": wp,
        "xla_gbps_effective": round(bytes_needed / min(wx) / 1e9, 2),
        "pallas_gbps_effective": round(bytes_needed / min(wp) / 1e9, 2),
        "speedup": round(min(wx) / min(wp), 2),
    }), flush=True)

    # --- macro: production 2048 block through both routes ----------------
    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device
    from cigwas_tpu.skeleton import cupc
    from cigwas_tpu.skeleton.cupc import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    m, n, p = 2048, 16384, 8
    G = np.empty((m, n), dtype=np.float32)
    prev = rng.normal(size=n)
    for i in range(m):
        prev = 0.92 * prev + np.sqrt(1 - 0.92**2) * rng.normal(size=n)
        pfreq = 1 / (1 + np.exp(-prev * 0.8))
        G[i] = (rng.random(n) < pfreq) + (rng.random(n) < pfreq)
    Y = rng.normal(size=(p, n)).astype(np.float32)
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)
    bb = encode_bed_values(G)
    means, stds = G.mean(axis=1), G.std(axis=1)
    th = threshold_array(n, 1e-4)
    cupc.DEV_RESIDENT_MAX = 0  # host loop so the gather route is live

    def run_block(stats=None):
        Cd, v = corr_panel_device(bb, Y, means, stds, n)
        return skeleton(Cd, th, 3, n_var=v, stats=stats, want_pmax=False)

    outs = {}
    for flag in ("0", "1"):
        cupc.PALLAS_GATHER = flag
        outs[flag] = run_block()  # warmup + output capture
        walls, lv = [], []
        for _ in range(3):
            stats = {}
            t0 = time.perf_counter()
            run_block(stats=stats)
            walls.append(round(time.perf_counter() - t0, 3))
            lv.append({str(k): round(v_, 3)
                       for k, v_ in stats.get("level_wall_s", {}).items()})
        print(json.dumps({"phase": "macro2048", "pallas": flag,
                          "walls": walls, "min_wall": min(walls),
                          "level_walls": lv}), flush=True)
    same = (
        np.array_equal(outs["0"].G, outs["1"].G)
        and np.array_equal(outs["0"].sepset, outs["1"].sepset)
    )
    print(json.dumps({"phase": "macro2048", "byte_identical": same}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
