#!/usr/bin/env python
"""Benchmark: conditional-independence test throughput on one chip.

Runs the fused flagship step on a synthetic LD block: 2-bit decode ->
Kendall-npn contingency panel (MXU) -> level-0 Fisher screen -> dense
level-1 CI sweep (all pairs x all single conditioning sets). The headline
metric is CI tests per second per chip (the driver's BASELINE.json metric);
the reference repo publishes no numbers (BASELINE.md), so vs_baseline is
reported as 1.0 by definition.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

M = int(os.environ.get("CIGWAS_BENCH_M", 1024))  # markers
N = int(os.environ.get("CIGWAS_BENCH_N", 16384))  # individuals
P = 8  # traits
REPS = int(os.environ.get("CIGWAS_BENCH_REPS", 3))
SWEEP_IMPL = os.environ.get("CIGWAS_BENCH_SWEEP", "xla")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cigwas_tpu.ops.corr import _kendall_from_counts
    from cigwas_tpu.ops.pallas.level1 import level1_min_rho
    from cigwas_tpu.ops.decode import geno_onehot, geno_value_valid, unpack_bed_codes
    from cigwas_tpu.utils.stats import threshold_array

    th = threshold_array(N, 1e-4)
    th0, th1 = float(th[0]), float(th[1])
    m, p = M, P

    @jax.jit
    def step(bed_bytes, phen):
        codes = unpack_bed_codes(bed_bytes)
        X = geno_onehot(codes).reshape(3 * m, -1)
        counts = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
        C_mm = _kendall_from_counts(counts.reshape(m, 3, m, 3).transpose(0, 2, 1, 3))
        vals, valid = geno_value_valid(codes)
        n_val = valid.sum(axis=1, keepdims=True)
        mean = (vals * valid).sum(axis=1, keepdims=True) / n_val
        std = jnp.sqrt(((vals - mean) ** 2 * valid).sum(axis=1, keepdims=True) / n_val)
        C_mp = (jnp.dot(vals * valid, phen.T) - mean * jnp.dot(valid, phen.T)) / (
            n_val * std
        )
        C_pp = jnp.dot(phen, phen.T) / phen.shape[1]
        C = jnp.concatenate(
            [
                jnp.concatenate([C_mm, C_mp], axis=1),
                jnp.concatenate([C_mp.T, C_pp], axis=1),
            ],
            axis=0,
        )
        v = C.shape[0]
        C = jnp.where(jnp.eye(v, dtype=bool), 1.0, C)
        z0 = jnp.abs(0.5 * jnp.log(jnp.abs((1 + C) / (1 - C))))
        G0 = (z0 >= th0) & ~jnp.eye(v, dtype=bool)
        # dense level-1 sweep; |atanh(rho)| < th  <=>  |rho| < tanh(th) so
        # the inner loop is transcendental-free. Two implementations:
        # CIGWAS_BENCH_SWEEP=pallas uses the fused VMEM kernel, default is
        # the XLA row-tiled form (currently slightly faster on v5e).
        rho_th1 = jnp.tanh(jnp.float32(th1))
        if SWEEP_IMPL == "pallas":
            rho_min = level1_min_rho(C)
            G = G0 & (rho_min >= rho_th1)
            return G.astype(jnp.int8)
        TILE = 128

        def tile_body(t, G):
            rows = jax.lax.dynamic_slice(C, (t * TILE, 0), (TILE, v))
            cxs = rows[:, None, :]
            cys = C[None, :, :]
            rho = jnp.abs(rows[:, :, None] - cxs * cys) * jax.lax.rsqrt(
                jnp.abs((1 - cxs**2) * (1 - cys**2))
            )
            s_ix = jnp.arange(v)
            x_ix = t * TILE + jnp.arange(TILE)
            mask = (s_ix[None, None, :] == x_ix[:, None, None]) | (
                s_ix[None, None, :] == s_ix[None, :, None]
            )
            rho = jnp.where(mask | ~jnp.isfinite(rho), jnp.float32(2.0), rho)
            keep = jnp.min(rho, axis=2) >= rho_th1
            return jax.lax.dynamic_update_slice(
                G, jax.lax.dynamic_slice(G, (t * TILE, 0), (TILE, v)) & keep, (t * TILE, 0)
            )

        G = jax.lax.fori_loop(0, v // TILE, tile_body, G0)
        return G.astype(jnp.int8)

    # reduce the output to one scalar on-device so the timed fetch carries
    # negligible transfer; on the remote platform block_until_ready() does
    # not synchronize — only a value fetch does
    @jax.jit
    def step_sum(bed_bytes, phen):
        return step(bed_bytes, phen).astype(jnp.int32).sum()

    rng = np.random.default_rng(0)
    phen = rng.normal(size=(p, N)).astype(np.float32)
    phen_d = jax.device_put(phen)
    beds = [
        jax.device_put(rng.integers(0, 256, size=(m, N // 4), dtype=np.uint8))
        for _ in range(REPS + 1)
    ]

    # warmup/compile (fetch to force completion)
    int(step_sum(beds[0], phen_d))

    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        int(step_sum(beds[r + 1], phen_d))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    v = m + p
    # level-0 tests (v^2) + level-1 sweep tests (v pairs^2 x v sets)
    swept_rows = v if SWEEP_IMPL == "pallas" else (v // 128) * 128
    ci_tests = v * v + swept_rows * v * v
    tests_per_sec = ci_tests / dt

    result = {
        "metric": "ci_tests_per_sec_per_chip",
        "value": round(tests_per_sec, 1),
        "unit": "CI tests/s (level-0+1 partial-corr tests, fused step)",
        "vs_baseline": 1.0,
        "block_markers": m,
        "individuals": N,
        "step_seconds": round(dt, 4),
        "device": str(jax.devices()[0]),
    }

    # phase 2 (optional): wall-time of the production cusk skeleton on a
    # synthetic 2048-marker LD block (corr panel + 3-level PC-stable search)
    if os.environ.get("CIGWAS_BENCH_FULL", "1") != "0":
        result["block2048_wall_s"] = round(_production_block_seconds(), 2)

    print(json.dumps(result))
    return 0


def _production_block_seconds() -> float:
    """Warm wall time of corr panel + 3-level skeleton for a 2048-marker
    block with banded LD structure (fixed seed: stable shapes, cached)."""
    import numpy as np

    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import corr_panel_device
    from cigwas_tpu.skeleton import skeleton
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
    means = G.mean(axis=1)
    stds = G.std(axis=1)
    th = threshold_array(n, 1e-4)

    def run_block():
        C_dev, v = corr_panel_device(bb, Y, means, stds, n)
        return skeleton(C_dev, th, 3, n_var=v)

    run_block()  # warmup/compile
    t0 = time.perf_counter()
    run_block()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
