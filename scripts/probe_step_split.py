#!/usr/bin/env python
"""Amortized split of the bench fused step: which stage owns the ~19 ms."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cigwas_tpu.ops.corr import _kendall_from_counts
from cigwas_tpu.ops.decode import (
    contingency_counts, geno_onehot, geno_value_valid, unpack_bed_codes,
)
from cigwas_tpu.ops.pcorr import _level1_dense_padded

M, N, P, K = 1024, 16384, 8, 8


def timed(name, step):
    def mk(k):
        @jax.jit
        def run(beds, phen):
            def body(acc, bb):
                return acc + step(bb, phen), None
            s, _ = jax.lax.scan(body, jnp.float32(0), beds)
            return s
        return run
    rng = np.random.default_rng(0)
    phen_d = jax.device_put(rng.normal(size=(P, N)).astype(np.float32))
    beds_k = jax.device_put(rng.integers(0, 256, size=(K, M, N // 4), dtype=np.uint8))
    rk, r1 = mk(K), mk(1)
    float(rk(beds_k, phen_d)); float(r1(beds_k[:1], phen_d))
    tk, t1 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(rk(beds_k, phen_d)); tk.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r1(beds_k[:1], phen_d)); t1.append(time.perf_counter() - t0)
    per = (min(tk) - min(t1)) / (K - 1)
    print(f"{name}: {per*1e3:.2f} ms/step", flush=True)


def upto_counts(bb, phen):
    codes = unpack_bed_codes(bb)
    X = geno_onehot(codes).reshape(3 * M, -1)
    counts = contingency_counts(X, X).astype(jnp.float32)
    return counts.sum()


def build_panel(bb, phen):
    codes = unpack_bed_codes(bb)
    X = geno_onehot(codes).reshape(3 * M, -1)
    counts = contingency_counts(X, X).astype(jnp.float32)
    C_mm = _kendall_from_counts(counts.reshape(M, 3, M, 3).transpose(0, 2, 1, 3))
    vals, valid = geno_value_valid(codes)
    n_val = valid.sum(axis=1, keepdims=True)
    mean = (vals * valid).sum(axis=1, keepdims=True) / n_val
    std = jnp.sqrt(((vals - mean) ** 2 * valid).sum(axis=1, keepdims=True) / n_val)
    C_mp = (jnp.dot(vals * valid, phen.T) - mean * jnp.dot(valid, phen.T)) / (n_val * std)
    C_pp = jnp.dot(phen, phen.T) / phen.shape[1]
    C = jnp.concatenate([
        jnp.concatenate([C_mm, C_mp], axis=1),
        jnp.concatenate([C_mp.T, C_pp], axis=1),
    ], axis=0)
    v = C.shape[0]
    return jnp.where(jnp.eye(v, dtype=bool), 1.0, C)


def panel_sum(bb, phen):
    return build_panel(bb, phen).sum()


def panel_l0(bb, phen):
    C = build_panel(bb, phen)
    v = C.shape[0]
    z0 = jnp.abs(0.5 * jnp.log(jnp.abs((1 + C) / (1 - C))))
    G0 = (z0 >= 0.03) & ~jnp.eye(v, dtype=bool)
    return G0.astype(jnp.int32).sum().astype(jnp.float32)


def full(bb, phen):
    C = build_panel(bb, phen)
    v = C.shape[0]
    z0 = jnp.abs(0.5 * jnp.log(jnp.abs((1 + C) / (1 - C))))
    G0 = (z0 >= 0.03) & ~jnp.eye(v, dtype=bool)
    pad = (-v) % 128
    Cp = jnp.pad(C, ((0, pad), (0, pad)))
    Gp = jnp.pad(G0, ((0, pad), (0, pad)))
    rho_min, _ = _level1_dense_padded(Cp, Gp, 128)
    G = G0 & (rho_min[:v, :v] >= 0.02)
    return G.astype(jnp.int32).sum().astype(jnp.float32)


def main():
    print("device:", jax.devices()[0])
    timed("decode+counts", upto_counts)
    timed("+kendall+mp panel", panel_sum)
    timed("+level0", panel_l0)
    timed("full step", full)


if __name__ == "__main__":
    main()
