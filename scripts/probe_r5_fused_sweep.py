#!/usr/bin/env python
"""Probe: compile + parity + speed of the fused gather+sweep Pallas kernel
on the real TPU (r5). Compares sweep_apply against the XLA local-sweep
route on an LD-like panel, then times a production-scale bucket.

One JSON line per check (run with nohup, poll the log).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def clustered(vp, nt, d, span, seed=0):
    rng = np.random.default_rng(seed)
    C = (0.5 * rng.normal(size=(vp, vp))).astype(np.float32)
    C = ((C + C.T) / 2).astype(np.float32)
    np.fill_diagonal(C, 1.0)
    centers = rng.integers(0, vp - span, nt)
    nbrs = (centers[:, None] + rng.integers(0, span, (nt, d))).astype(np.int32)
    nbrs.sort(axis=1)
    node_ixs = np.clip(centers + span // 2, 0, vp - 1).astype(np.int32)
    deg = rng.integers(max(4, d // 2), d + 1, nt).astype(np.int32)
    # pad slots -> 0 like _compact_neighbors
    sl = np.arange(d)[None, :]
    nbrs = np.where(sl < deg[:, None], nbrs, 0)
    return C, node_ixs, nbrs, deg


def main():
    import jax.numpy as jnp

    from cigwas_tpu.ops import pcorr as pcorr_ops
    from cigwas_tpu.ops.pallas.panel_gather import sweep_apply

    # parity at a modest size (compiled, real TPU)
    vp, nt, d = 2176, 64, 128
    C, node_ixs, nbrs, deg = clustered(vp, nt, d, span=400)
    C_dev = jnp.asarray(C)
    for l in (1, 2, 3):
        ct = 32 if l == 2 else 8
        t0 = time.perf_counter()
        got = sweep_apply(C_dev, node_ixs, nbrs, deg, l, ct,
                          0.5, True)
        assert got is not None
        packed = np.asarray(got)
        compile_s = time.perf_counter() - t0
        rho_k = packed[:, :, 0]
        pos_k = packed[:, :, 1:].astype(np.int32)
        if l == 1:
            rho_x, pos_x = pcorr_ops.level1_local_sweep(
                C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs),
                jnp.asarray(deg))
            pos_x = np.asarray(pos_x)[:, :, None]
        elif l == 2:
            rho_x, pos_x = pcorr_ops.level2_local_sweep(
                C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs),
                jnp.asarray(deg), ct)
        else:
            rho_x, pos_x = pcorr_ops.level3_local_sweep(
                C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs),
                jnp.asarray(deg), ct)
        rho_x = np.asarray(rho_x)
        pos_x = np.asarray(pos_x).reshape(nt, d, l)
        valid = np.arange(d)[None, :] < deg[:, None]
        rho_ok = np.array_equal(rho_k[valid], rho_x[valid])
        pos_ok = np.array_equal(pos_k[valid], pos_x[valid])
        max_abs = float(np.abs(np.where(valid, rho_k - rho_x, 0)).max())
        print(json.dumps({
            "probe": f"parity_l{l}", "rho_biteq": bool(rho_ok),
            "pos_eq": bool(pos_ok), "max_abs_diff": max_abs,
            "compile_s": round(compile_s, 1),
        }), flush=True)

    # speed at a production-scale bucket: 8192 nodes, d=128, spans ~ 400
    vp, nt, d = 11264, 8192, 128
    C, node_ixs, nbrs, deg = clustered(vp, nt, d, span=400, seed=1)
    C_dev = jnp.asarray(C)
    for l, ct in ((1, 8), (2, 32), (3, 8)):
        got = sweep_apply(C_dev, node_ixs, nbrs, deg, l, ct, 0.02, False)
        assert got is not None
        for h in got:
            np.asarray(h)  # sync after compile
        t0 = time.perf_counter()
        got = sweep_apply(C_dev, node_ixs, nbrs, deg, l, ct, 0.02, False)
        for h in got:
            np.asarray(h)
        wall = time.perf_counter() - t0
        tests = int((deg.astype(np.int64) ** (l + 1)).sum())  # ~ slots
        print(json.dumps({
            "probe": f"speed_l{l}", "nt": nt, "d": d,
            "wall_s": round(wall, 3),
            "approx_slots_per_s": round(tests / wall / 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
