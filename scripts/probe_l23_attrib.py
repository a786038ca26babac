"""Attribute level-2/3 wall on the bench's 2048-marker block: per-bucket
gather vs sweep vs host scatter, plus slot utilization (useful tests /
dense slots). Run on the TPU."""
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.io.bed import encode_bed_values
from cigwas_tpu.ops.corr import corr_panel_device
from cigwas_tpu.ops import pcorr as pcorr_ops
from cigwas_tpu.skeleton import cupc
from cigwas_tpu.skeleton.cupc import _compact_neighbors, _next_pow2
from cigwas_tpu.utils.stats import threshold_array

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
bb = encode_bed_values(G)
means, stds = G.mean(axis=1), G.std(axis=1)
th = threshold_array(n, 1e-4)

C_dev, v = corr_panel_device(bb, Y, means, stds, n)
C_host = np.asarray(C_dev)


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


# run skeleton up to entry of level 2 to get the real adjacency
from cigwas_tpu.skeleton import skeleton

res = skeleton(C_dev, th, 3, n_var=v)
# recompute per-level adjacency: run with max level 1 to get G before level 2
res1 = skeleton(C_dev, th, 1, n_var=v)
Gb1 = res1.G.astype(bool)
res2cap = skeleton(C_dev, th, 2, n_var=v)
Gb2 = res2cap.G.astype(bool)

rho_th = float(np.tanh(th[2]))

for l, Gb in ((2, Gb1), (3, Gb2)):
    deg_all = Gb.sum(axis=1)
    active = np.where(deg_all >= l + 1)[0]
    buckets = {}
    for x in active:
        d_pad = max(8, -(-int(deg_all[x]) // 8) * 8)
        buckets.setdefault(d_pad, []).append(int(x))
    useful = sum(math.comb(int(deg_all[x]), l) * int(deg_all[x]) for x in active)
    slots = 0
    for d_pad, nodes in buckets.items():
        if l == 2:
            slots += len(nodes) * d_pad**3
        else:
            slots += len(nodes) * d_pad**4
    print(f"\n=== level {l}: active={len(active)} useful={useful:.3e} "
          f"dense_slots={slots:.3e} util={useful/slots:.3f}")
    print("bucket histogram:", {d: len(nn) for d, nn in sorted(buckets.items())})

    sweep = {2: pcorr_ops.level2_local_sweep, 3: pcorr_ops.level3_local_sweep}[l]
    pre = {2: pcorr_ops.level2_local_sweep_pre, 3: pcorr_ops.level3_local_sweep_pre}[l]

    @jax.jit
    def gather_only(C, node_ixs, nbrs):
        C_x = C[nbrs[:, :, None], nbrs[:, None, :]]
        c_row = C[node_ixs[:, None], nbrs]
        return C_x.sum() + c_row.sum()

    # mimic the production tiling; TIME only the dominant buckets (each new
    # (shape, kernel) pair costs a ~60s first compile on the remote TPU)
    bucket_cost = {
        d: len(nn) * d ** (l + 1) for d, nn in buckets.items()
    }
    top = set(sorted(bucket_cost, key=bucket_cost.get, reverse=True)[:3])
    total_wall = 0.0
    gather_wall = 0.0
    sweep_wall = 0.0
    timed_useful = 0
    for d_pad in sorted(top):
        nodes = np.array(buckets[d_pad], dtype=np.int32)
        ct_cap = max(8, cupc.LOCAL_ELEM_BUDGET // (d_pad * d_pad))
        ct = 8
        for c in range(d_pad, 7, -8):
            if d_pad % c == 0 and c <= ct_cap:
                ct = c
                break
        node_tile = max(1, cupc.LOCAL_ELEM_BUDGET // (ct * d_pad * d_pad))
        if node_tile > 1:
            node_tile = 1 << (node_tile.bit_length() - 1)
        node_tile = min(node_tile, _next_pow2(len(nodes)))
        n_launch = 0
        for s0 in range(0, len(nodes), node_tile):
            tile = nodes[s0 : s0 + node_tile]
            pad = node_tile - len(tile)
            tile_p = np.concatenate([tile, np.full(pad, tile[-1], np.int32)]) if pad else tile
            nbrs, deg = _compact_neighbors(Gb, tile_p, d_pad)
            args = (C_dev, jnp.asarray(tile_p), jnp.asarray(nbrs), jnp.asarray(deg))
            # warm all three
            r, _ = sweep(*args, ct)
            fetch(r)
            fetch(gather_only(C_dev, args[1], args[2]))
            C_x = C_dev[args[2][:, :, None], args[2][:, None, :]]
            c_row = C_dev[args[1][:, None], args[2]]
            rp, _ = pre(C_x, c_row, args[3], ct=ct)
            fetch(rp)
            # timed
            t0 = time.perf_counter(); r, _ = sweep(*args, ct); fetch(r)
            total_wall += time.perf_counter() - t0
            t0 = time.perf_counter(); fetch(gather_only(C_dev, args[1], args[2]))
            gather_wall += time.perf_counter() - t0
            t0 = time.perf_counter(); rp, _ = pre(C_x, c_row, args[3], ct=ct); fetch(rp)
            sweep_wall += time.perf_counter() - t0
            n_launch += 1
        timed_useful += sum(
            math.comb(int(deg_all[x]), l) * int(deg_all[x]) for x in nodes
        )
        print(f"  d_pad={d_pad:4d} nodes={len(nodes):5d} ct={ct:4d} "
              f"node_tile={node_tile:5d} launches={n_launch}")
    print(f"level {l} (top buckets, {timed_useful/useful:.0%} of useful): "
          f"full={total_wall*1e3:.0f} ms  gather={gather_wall*1e3:.0f} ms "
          f"sweep_pre={sweep_wall*1e3:.0f} ms  useful/s={timed_useful/total_wall:.3e}")
