#!/usr/bin/env python
"""Probe: row-DMA gather+sweep kernel vs the XLA local sweeps on the TPU.

SCATTERED neighbours (full-panel spans — the case the windowed kernel
cannot serve and where the XLA element gather runs at ~0.3 GB/s):
(vp=11264, d=128, nt=512), levels 1-3.

1. bit-identity of rho and positions vs level{1,2,3}_local_sweep,
   compared ON DEVICE (fetching the panels would dominate),
2. min-of-5 walls for both routes + effective tests/s.

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

    from cigwas_tpu.ops import pcorr as pcorr_ops
    from cigwas_tpu.ops.pallas.panel_gather import (
        plan_window, rowsweep_apply,
    )

    rng = np.random.default_rng(0)
    vp, d, nt = 11264, 128, 512
    # build the big panel ON DEVICE (>50 MB host uploads stall the relay)
    A = rng.normal(size=(vp, 64)).astype(np.float32)

    @jax.jit
    def build_panel(Ad):
        Cd = jnp.dot(Ad, Ad.T, preferred_element_type=jnp.float32)
        dg = jax.lax.rsqrt(jnp.diagonal(Cd))
        Cd = Cd * dg[:, None] * dg[None, :]
        key = jax.random.PRNGKey(0)
        mask = jax.random.uniform(key, Cd.shape) < 0.001
        return jnp.where(mask, jnp.nan, Cd)

    C_dev = build_panel(jax.device_put(A))
    # scattered: neighbours uniform over the WHOLE panel, varied degrees
    nbrs = np.sort(rng.choice(vp, size=(nt, d), replace=True), axis=1)
    nbrs = nbrs.astype(np.int32)
    node_ixs = rng.integers(0, vp, nt).astype(np.int32)
    deg = rng.integers(d // 2, d + 1, nt).astype(np.int32)
    sl = np.arange(d)[None, :]
    nbrs = np.where(sl < deg[:, None], nbrs, 0)
    assert plan_window(node_ixs, nbrs, deg, vp) is None
    nb_dev = jnp.asarray(nbrs)
    nx_dev = jnp.asarray(node_ixs)
    dg_dev = jnp.asarray(deg)
    valid_dev = jnp.asarray(sl < deg[:, None])

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
            return rowsweep_apply(C_dev, node_ixs, nbrs, deg, l, ct,
                                  0.5, True)

        # warmup + identity
        rho_x, pos_x = xla()
        packed = pallas()

        @jax.jit
        def same(packed_, rho_, pos_):
            rho_k = packed_[:, :, 0]
            pos_k = packed_[:, :, 1:].astype(jnp.int32)
            pos_r = jnp.reshape(pos_, (nt, d, l)) if l > 1 else (
                pos_[:, :, None]
            )
            eq_r = jnp.where(valid_dev, rho_k == rho_, True)
            eq_p = jnp.where(valid_dev[:, :, None], pos_k == pos_r, True)
            return jnp.all(eq_r) & jnp.all(eq_p)

        biteq = bool(fetch(same(packed, rho_x, pos_x)))

        def timeit(fn, reps=5):
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                out = out[0] if isinstance(out, tuple) else out
                fetch(jnp.sum(jnp.nan_to_num(out[:, :1])))
                walls.append(round(time.perf_counter() - t0, 4))
            return walls

        wx = timeit(xla)
        wp = timeit(pallas)
        # CI tests executed: per node, C(deg, l) * deg (sweep slots give
        # an upper-ish proxy: deg^(l+1) slots); report slot throughput
        slots = int((deg.astype(np.int64) ** (l + 1)).sum())
        print(json.dumps({
            "phase": f"rowsweep_l{l}", "vp": vp, "d": d, "nt": nt,
            "bit_identical": biteq,
            "xla_walls": wx, "rowsweep_walls": wp,
            "speedup": round(min(wx) / min(wp), 2),
            "rowsweep_slots_per_sec": round(slots / min(wp), 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
