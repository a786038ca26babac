"""Multi-chip production skeleton: byte-identical to the single-device path.

Runs on the 8 virtual CPU devices (tests/conftest.py). The sharded engine
must change WHERE rows/nodes are computed, never their values — so every
block-output file is compared byte-for-byte against the plain run (the
stronger form of the BASELINE parity target: adjacency exact AND sepsets
identical, since the deterministic min-reduction removes the reference's
atomicCAS tie-break, `cuPC-S.cu:570-577`).
"""

import hashlib
import os
import re

import numpy as np
import pytest

from cigwas_tpu.cli import main as cli_main
from cigwas_tpu.constants import BED_PREFIX_COL_MAJ
from cigwas_tpu.io.bed import encode_bed_values
from cigwas_tpu.parallel.sharded import ShardedEngine


@pytest.fixture(scope="module")
def sharded_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sharded")
    rng = np.random.default_rng(21)
    n, m = 3000, 96
    maf = rng.uniform(0.1, 0.5, m)
    G = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )

    def std(v):
        return (v - v.mean()) / v.std()

    y0 = sum(0.4 * std(G[i]) for i in (8, 18, 28)) + rng.normal(size=n)
    y1 = sum(0.4 * std(G[i]) for i in (40, 55)) + 0.5 * y0 + rng.normal(size=n)
    y2 = 0.4 * std(G[28]) + 0.3 * y0 + rng.normal(size=n)
    Y = np.stack([y0, y1, y2])
    Y = (Y - Y.mean(1, keepdims=True)) / Y.std(1, keepdims=True)

    stem = str(tmp / "sim")
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
        f.write("FID\tIID\tT0\tT1\tT2\n")
        for i in range(n):
            f.write(f"F{i}\tI{i}\t" + "\t".join(f"{v:.6f}" for v in Y[:, i]) + "\n")

    cli_main(["prep-bed", stem])
    cli_main(["block", stem, "48", "10", "16"])
    return tmp, stem, stem + "_m48.blocks", n


def _run_blocks(stem, blockfile, outdir, mesh=None):
    from cigwas_tpu.pipelines.cusk import CuskContext

    os.makedirs(outdir, exist_ok=True)
    ctx = CuskContext(
        stem + ".phen", stem, blockfile, 0.001, 3, 14, 1, str(outdir),
        verbose=False, mesh=mesh,
    )
    for bi in range(len(ctx.blocks)):
        ctx.finish(ctx.prepare(bi))


def _hashes(outdir):
    out = {}
    for f in sorted(os.listdir(outdir)):
        if re.match(r"^\d+_\d+_\d+\.(adj|corr|ixs|sep|mdim)$", f):
            out[f] = hashlib.md5(open(os.path.join(outdir, f), "rb").read()).hexdigest()
    return out


def test_sharded_two_stage_cusk_byte_identical(sharded_dataset):
    """The FULL two-stage cusk on an 8-device mesh reproduces the plain
    single-device block outputs byte-for-byte."""
    import jax
    from jax.sharding import Mesh

    tmp, stem, blockfile, n = sharded_dataset
    _run_blocks(stem, blockfile, tmp / "out_plain")

    mesh = Mesh(np.array(jax.devices()), ("marker",))
    _run_blocks(stem, blockfile, tmp / "out_sharded", mesh=mesh)

    plain = _hashes(tmp / "out_plain")
    sharded = _hashes(tmp / "out_sharded")
    assert plain, "no block outputs produced"
    assert set(plain) == set(sharded)
    for f in plain:
        assert plain[f] == sharded[f], f"{f} differs between plain and sharded runs"


def test_sharded_engine_levels_match_plain(sharded_dataset):
    """Direct kernel-level check at degrees that force level >= 2 work:
    sharded skeleton() on a dense random panel equals the plain one."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.skeleton import skeleton
    from cigwas_tpu.utils.stats import threshold_array

    rng = np.random.default_rng(5)
    n_var, n = 48, 20000
    X = np.zeros((n_var, n))
    X[0] = rng.normal(size=n)
    for i in range(1, n_var):
        parents = rng.choice(i, size=min(i, 2), replace=False)
        X[i] = sum(0.5 * X[p] for p in parents) + rng.normal(size=n)
    C = np.corrcoef(X).astype(np.float32)
    th = threshold_array(n, 0.01)

    plain = skeleton(C, th, 4)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    shard = skeleton(C, th, 4, engine=ShardedEngine(mesh, "marker"))

    assert np.array_equal(plain.G, shard.G)
    assert np.array_equal(plain.sepset, shard.sepset)
    assert np.array_equal(plain.pmax, shard.pmax)
    assert plain.final_level == shard.final_level


def test_sharded_hetcor_matches_plain(n10_fixture):
    """hetcor_skeleton with the sharded engine equals the plain path (and
    the N10 golden adjacency)."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.skeleton import hetcor_skeleton
    from cigwas_tpu.utils.stats import hetcor_threshold

    C, A, alpha, n = n10_fixture
    N = np.full_like(C, float(n))
    th = hetcor_threshold(alpha)
    plain = hetcor_skeleton(C, np.ones_like(A), N, th, 14)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    shard = hetcor_skeleton(
        C, np.ones_like(A), N, th, 14, engine=ShardedEngine(mesh, "marker")
    )
    assert np.array_equal(plain.G, shard.G)
    assert np.array_equal(shard.G, A)


@pytest.mark.parametrize("m", [384, 370])
def test_sharded_banded_corr_byte_identical(m):
    """The mesh-sharded banded `block`-stage correlation (marker rows split
    over devices, leading rows exchanged with a ring ppermute) equals the
    single-device tiled path bit-for-bit when the single-device row tile
    matches the shard length (SURVEY §2.4 row 5; the multi-device form of
    `corr_host.cu:1199-1319`)."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.ops.corr import kendall_npn_corr_banded

    rng = np.random.default_rng(m)
    n, width = 600, 16
    maf = rng.uniform(0.1, 0.5, m)
    G = (rng.random((m, n)) < maf[:, None]).astype(np.float32) + (
        rng.random((m, n)) < maf[:, None]
    )
    G[5] = 0.0  # monomorphic row -> NaN band entries must zero identically
    bb = encode_bed_values(G)

    ndev = 8
    mloc = -(-m // ndev)
    ref = kendall_npn_corr_banded(bb, n, width, row_tile=mloc)

    mesh = Mesh(np.array(jax.devices()), ("marker",))
    from cigwas_tpu.parallel.sharded import ShardedEngine

    eng = ShardedEngine(mesh, "marker")
    got = eng.kendall_npn_corr_banded(bb, n, width)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_sharded_banded_corr_rejects_thin_shards():
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.io.bed import encode_bed_values
    from cigwas_tpu.parallel.sharded import ShardedEngine

    rng = np.random.default_rng(0)
    G = (rng.random((40, 200)) < 0.3).astype(np.float32)
    bb = encode_bed_values(G)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    eng = ShardedEngine(mesh, "marker")
    with pytest.raises(ValueError, match="corr_width"):
        eng.kendall_npn_corr_banded(bb, 200, 16)


def test_rowsharded_two_stage_cusk_byte_identical(sharded_dataset):
    """The FULL two-stage cusk with the ROW-SHARDED (non-replicated) panel
    reproduces the plain single-device block outputs byte-for-byte. No
    device materializes the (vp, vp) panel: each holds a (vp/D, vp) stripe
    and the level kernels consume it through the ring pass."""
    import jax
    from jax.sharding import Mesh

    tmp, stem, blockfile, n = sharded_dataset
    out_plain = tmp / "out_plain_rs"
    _run_blocks(stem, blockfile, out_plain)

    from cigwas_tpu.pipelines.cusk import CuskContext

    mesh = Mesh(np.array(jax.devices()), ("marker",))
    outdir = tmp / "out_rowsharded"
    os.makedirs(outdir, exist_ok=True)
    ctx = CuskContext(
        stem + ".phen", stem, blockfile, 0.001, 3, 14, 1, str(outdir),
        verbose=False, mesh=mesh, panel_mode="rowsharded",
    )
    for bi in range(len(ctx.blocks)):
        ctx.finish(ctx.prepare(bi))

    plain = _hashes(out_plain)
    got = _hashes(outdir)
    assert plain, "no block outputs produced"
    assert set(plain) == set(got)
    for f in plain:
        assert plain[f] == got[f], f"{f} differs between plain and rowsharded"


def test_rowsharded_panel_is_actually_sharded(sharded_dataset):
    """The row-sharded panel's device shards are (vp/D, vp) stripes."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.parallel.sharded import RowShardedEngine
    from cigwas_tpu.io.bed import encode_bed_values

    rng = np.random.default_rng(0)
    m, n, p = 100, 500, 2
    G = (rng.random((m, n)) < 0.3).astype(np.float32) + (
        rng.random((m, n)) < 0.3
    )
    Y = rng.normal(size=(p, n)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    eng = RowShardedEngine(mesh, "marker")
    C, v = eng.corr_panel_device(
        encode_bed_values(G), Y, G.mean(1), G.std(1), n
    )
    vp = C.shape[0]
    shard_shapes = {s.data.shape for s in C.addressable_shards}
    assert shard_shapes == {(vp // 8, vp)}


def test_rowsharded_hetcor_matches_plain(n10_fixture):
    """hetcor_skeleton with the ROW-SHARDED engine (panel + per-pair N in
    (vp/D, vp) stripes, ring-pass level kernels) equals the plain path and
    the N10 golden adjacency."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.parallel.sharded import RowShardedEngine
    from cigwas_tpu.skeleton import hetcor_skeleton
    from cigwas_tpu.utils.stats import hetcor_threshold

    C, A, alpha, n = n10_fixture
    N = np.full_like(C, float(n))
    th = hetcor_threshold(alpha)
    plain = hetcor_skeleton(C, np.ones_like(A), N, th, 14)
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    shard = hetcor_skeleton(
        C, np.ones_like(A), N, th, 14, engine=RowShardedEngine(mesh, "marker")
    )
    assert np.array_equal(plain.G, shard.G)
    assert np.array_equal(shard.G, A)


@pytest.mark.parametrize("ess_mode", ["reference", "float"])
def test_rowsharded_hetcor_heterogeneous(ess_mode):
    """Row-sharded hetcor with heterogeneous per-pair N incl. NaNs and time
    indices is byte-identical to the plain path through level >= 4 (both
    `ess_mode`s; exercises hetcor1 ring, hetcor2/3 ring local sweeps and the
    ring combinatorial scan)."""
    import jax
    from jax.sharding import Mesh

    from cigwas_tpu.parallel.sharded import RowShardedEngine
    from cigwas_tpu.skeleton import hetcor_skeleton
    from cigwas_tpu.utils.stats import hetcor_threshold

    rng = np.random.default_rng(3)
    v = 60
    C = np.corrcoef(rng.normal(size=(v, 2 * v))).astype(np.float32)
    N = rng.uniform(50, 500, (v, v)).astype(np.float32)
    N = (N + N.T) / 2
    N[rng.random((v, v)) < 0.05] = np.nan
    N = np.where(np.isnan(N.T), np.nan, N)
    t_ix = rng.integers(0, 3, v)
    th = hetcor_threshold(1e-2)
    plain = hetcor_skeleton(
        C, np.ones((v, v), np.int32), N, th, 14, time_index=t_ix,
        ess_mode=ess_mode,
    )
    mesh = Mesh(np.array(jax.devices()), ("marker",))
    shard = hetcor_skeleton(
        C, np.ones((v, v), np.int32), N, th, 14, time_index=t_ix,
        ess_mode=ess_mode, engine=RowShardedEngine(mesh, "marker"),
    )
    if ess_mode == "float":
        assert plain.final_level >= 4  # the combinatorial ring scan must run
    assert plain.final_level == shard.final_level
    assert np.array_equal(plain.G, shard.G)
