#!/usr/bin/env python
"""Probe: can the row-DMA gather+sweep serve the 2048-class block?

The fused WINDOWED sweep regressed the 2048 block (0.39 -> 0.85 s at
level 1) because at vp=2048 the window is the whole panel — a 16 MB DMA
per node. The row kernel moves only (d+8) rows (~1-2 MB at d<=256), so
it may win where the windowed kernel lost. Measure levels 1-3 at the
2048 block's realistic shapes (AR(1) LD, degrees from a real level-0
screen) for the XLA local sweeps vs rowsweep_apply.

One JSON line per (level, route). Run with nohup; poll the log.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def fetch(x):
    return np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops import pcorr as pcorr_ops
    from cigwas_tpu.ops.pallas.panel_gather import rowsweep_apply

    rng = np.random.default_rng(0)
    vp = 2048
    # AR(1) correlation panel like the bench's 2048 block
    A = rng.normal(size=(vp, 96)).astype(np.float32)

    @jax.jit
    def build_panel(Ad):
        Cd = jnp.dot(Ad, Ad.T, preferred_element_type=jnp.float32)
        dg = jax.lax.rsqrt(jnp.diagonal(Cd))
        return Cd * dg[:, None] * dg[None, :]

    C_dev = build_panel(jax.device_put(A))
    # realistic local neighbour lists: threshold the panel like level 0
    C_h = fetch(C_dev)
    th0 = 0.072  # ~alpha 1e-4 at n=16384
    G = (np.abs(C_h) > th0) & ~np.eye(vp, dtype=bool)
    deg_all = G.sum(1)
    for d in (64, 128, 256):
        nodes = np.where((deg_all >= d // 2) & (deg_all <= d))[0][:512]
        if nodes.size < 32:
            continue
        nt = 1 << (int(nodes.size) - 1).bit_length()
        nodes = np.concatenate([nodes, np.full(nt - len(nodes), nodes[-1])])
        nbrs = np.zeros((nt, d), np.int32)
        deg = np.zeros(nt, np.int32)
        for k, x in enumerate(nodes):
            nb = np.where(G[x])[0][:d]
            nbrs[k, : len(nb)] = nb
            deg[k] = len(nb)
        nb_dev, nx_dev, dg_dev = (
            jnp.asarray(nbrs), jnp.asarray(nodes.astype(np.int32)),
            jnp.asarray(deg),
        )
        for l in (1, 2, 3):
            ct = 16 if l >= 2 else 8
            if l == 1:
                xla = lambda: pcorr_ops.level1_local_sweep(
                    C_dev, nx_dev, nb_dev, dg_dev)
            elif l == 2:
                xla = lambda: pcorr_ops.level2_local_sweep(
                    C_dev, nx_dev, nb_dev, dg_dev, 16)
            else:
                xla = lambda: pcorr_ops.level3_local_sweep(
                    C_dev, nx_dev, nb_dev, dg_dev, 16)

            def pallas():
                return rowsweep_apply(
                    C_dev, nodes.astype(np.int32), nbrs, deg, l, ct, 0.07,
                    True,
                )

            def timeit(fn, reps=5):
                walls = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    out = fn()
                    out = out[0] if isinstance(out, tuple) else out
                    fetch(jnp.sum(jnp.nan_to_num(out[:, :1])))
                    walls.append(round(time.perf_counter() - t0, 4))
                return walls

            try:
                xla()
                pallas()  # compile
                wx, wp = timeit(xla), timeit(pallas)
                print(json.dumps({
                    "phase": f"d{d}_l{l}", "nt": int(nt),
                    "xla": min(wx), "rowsweep": min(wp),
                    "speedup": round(min(wx) / min(wp), 2),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "phase": f"d{d}_l{l}",
                    "error": str(e).splitlines()[0][:160],
                }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
