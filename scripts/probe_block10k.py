#!/usr/bin/env python
"""North-star probe: wall time of ONE production cusk block at the
reference's default operating point (max_block_size=11000,
`/root/reference/ci-gwas.py:68-148`), on the real TPU.

Builds an 11,000-marker AR-LD block with polygenic traits on disk, runs the
production `cusk` twice (cold incl. compile, then warm), and prints the warm
wall plus per-level timing. n=16384 individuals keeps host generation
tractable; marker count is the cost driver (panel work is O(m^2..m^3)).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M = int(os.environ.get("M", 11000))
N = int(os.environ.get("N", 16384))
P = 8
WORKDIR = os.environ.get("WORKDIR", "/tmp/block10k")


def build_dataset(stem):
    from cigwas_tpu.constants import BED_PREFIX_COL_MAJ
    from cigwas_tpu.io.bed import encode_bed_values

    rng = np.random.default_rng(0)
    G = np.empty((M, N), dtype=np.float32)
    prev = rng.normal(size=N)
    for i in range(M):
        prev = 0.92 * prev + np.sqrt(1 - 0.92**2) * rng.normal(size=N)
        pfreq = 1 / (1 + np.exp(-prev * 0.8))
        G[i] = (rng.random(N) < pfreq) + (rng.random(N) < pfreq)
    causal = np.arange(M // 40 // 2, M, M // 40)
    Y = rng.normal(size=(P, N)).astype(np.float32)
    for t in range(P):
        for k in causal[t::P]:
            Y[t] += 0.15 * (G[k] - G[k].mean()) / G[k].std()
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)

    with open(stem + ".bed", "wb") as f:
        f.write(BED_PREFIX_COL_MAJ)
        f.write(encode_bed_values(G).tobytes())
    with open(stem + ".bim", "w") as f:
        for i in range(M):
            f.write(f"1\trs{i}\t0\t{1000 * i}\tA\tG\n")
    with open(stem + ".fam", "w") as f:
        for i in range(N):
            f.write(f"F{i} I{i} 0 0 0 -9\n")
    with open(stem + ".phen", "w") as f:
        f.write("FID\tIID\t" + "\t".join(f"T{t}" for t in range(P)) + "\n")
        for i in range(N):
            f.write(f"F{i}\tI{i}\t" + "\t".join(f"{v:.6f}" for v in Y[:, i]) + "\n")
    with open(stem + ".blocks", "w") as f:
        f.write(f"1\t0\t{M - 1}\n")


def main():
    import jax

    print("device:", jax.devices()[0], f"M={M} N={N}")
    os.makedirs(WORKDIR, exist_ok=True)
    stem = os.path.join(WORKDIR, "big")
    if not os.path.exists(stem + ".blocks"):
        t0 = time.perf_counter()
        build_dataset(stem)
        print(f"dataset built in {time.perf_counter() - t0:.1f}s", flush=True)

    from cigwas_tpu.prep import prep_bed
    from cigwas_tpu.pipelines.cusk import CuskContext

    if not os.path.exists(stem + ".means"):
        t0 = time.perf_counter()
        prep_bed(stem)
        print(f"prep in {time.perf_counter() - t0:.1f}s", flush=True)

    outdir = os.path.join(WORKDIR, "out")
    os.makedirs(outdir, exist_ok=True)
    ctx = CuskContext(
        stem + ".phen", stem, stem + ".blocks", 1e-4, 3, 14, 1, outdir,
        verbose=True,
    )

    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        prep = ctx.prepare(0)
        t_prep = time.perf_counter() - t0
        res = ctx.finish(prep)
        wall = time.perf_counter() - t0
        print(f"{label}: block wall {wall:.2f}s (host prep {t_prep:.2f}s), "
              f"retained {res.num_markers() if res else 0} markers", flush=True)


if __name__ == "__main__":
    main()
