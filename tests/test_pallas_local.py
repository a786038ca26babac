"""Pallas local-sweep kernels (interpret mode on CPU): parity with the XLA
level-2/3 local sweeps — identical minimizing positions, matching rho — and
the colex tie-break contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from cigwas_tpu.ops import pcorr
from cigwas_tpu.ops.pallas.local_sweep import (
    level2_local_sweep_pallas,
    level3_local_sweep_pallas,
)

XLA = {2: pcorr.level2_local_sweep, 3: pcorr.level3_local_sweep}
PAL = {2: level2_local_sweep_pallas, 3: level3_local_sweep_pallas}


@pytest.mark.parametrize("level", [2, 3])
@pytest.mark.parametrize("d", [8, 16])
def test_pallas_matches_xla_local_sweep(level, d):
    rng = np.random.default_rng(level * 10 + d)
    V, nt = 64, 6
    A = rng.normal(size=(V, 300)).astype(np.float32)
    C = np.corrcoef(A).astype(np.float32)
    nbrs = np.stack(
        [np.sort(rng.choice(V, size=d, replace=False)) for _ in range(nt)]
    ).astype(np.int32)
    node_ixs = rng.choice(V, size=nt, replace=False).astype(np.int32)
    deg = rng.integers(level + 2, d + 1, nt).astype(np.int32)
    C_dev = jnp.asarray(C)

    r_x, p_x = XLA[level](
        C_dev, jnp.asarray(node_ixs), jnp.asarray(nbrs), jnp.asarray(deg),
        min(8, d),
    )
    r_p, p_p = PAL[level](C_dev, node_ixs, nbrs, deg, interpret=True)
    valid = np.arange(d)[None, :] < deg[:, None]
    np.testing.assert_allclose(
        np.asarray(r_x)[valid], np.asarray(r_p)[valid], rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(p_x)[valid], np.asarray(p_p)[valid]
    )


@pytest.mark.parametrize("level", [2, 3])
def test_pallas_local_sweep_colex_tie_break(level):
    """Bit-identical duplicate variables force exact ties; the kernel must
    resolve them to the lowest colex rank (same contract as
    tests/test_skeleton.py::test_local_sweep_colex_tie_break)."""
    rng = np.random.default_rng(11)
    nv, n = 18, 4000
    X = rng.normal(size=(nv, n))
    for i in range(2, nv):
        X[i] += 0.5 * X[rng.integers(0, i)]
    X[9] = X[1]  # exact duplicate
    C = np.corrcoef(X).astype(np.float32)

    d = 16
    nodes = np.array([10, 12, 14], dtype=np.int32)
    nbrs = np.zeros((len(nodes), d), dtype=np.int32)
    for r, node in enumerate(nodes):
        row = sorted(set(range(nv)) - {int(node), 17})[:d]
        nbrs[r] = np.array(row, dtype=np.int32)
    deg = np.full(len(nodes), d, dtype=np.int32)

    rho, pos = PAL[level](C, nodes, nbrs, deg, interpret=True)
    rho, pos = np.asarray(rho), np.asarray(pos)
    for r in range(len(nodes)):
        slot1 = int(np.where(nbrs[r] == 1)[0][0])
        slot9 = int(np.where(nbrs[r] == 9)[0][0])
        ys = [y for y in range(d) if y not in (slot1, slot9)]
        live = rho[r][ys] < 2.0
        assert live.any()
        p = pos[r][ys][live]
        assert not (p[:, 0] == slot9).any()
        bad = (p[:, 1] == slot9) & (p[:, 0] < slot1)
        assert not bad.any()
