"""Simulation module tests + skeleton recovery on ground-truth DAGs.

Miniature version of the reference's accuracy evaluation
(`simulate_dag.R` at n=16000, 1600 SNPs; here scaled down for CI).
"""

import numpy as np
import pytest

from cigwas_tpu.sim import gen_rand_dag, write_simulation_artifacts
from cigwas_tpu.skeleton import skeleton
from cigwas_tpu.utils.stats import threshold_array


@pytest.fixture(scope="module")
def dag():
    return gen_rand_dag(
        n=8000,
        num_snp=60,
        num_trait=6,
        num_latent=1,
        deg=3,
        prob_pleio=0.2,
        lo_mp=0.1,
        hi_mp=0.3,
        lo_pp=0.1,
        hi_pp=0.4,
        seed=7,
    )


def test_dag_is_topological(dag):
    # edges only from lower to higher index (acyclic by construction)
    assert np.all(np.tril(dag.G) == 0)
    assert np.all((dag.A != 0) <= (dag.G != 0))


def test_sem_unit_variance(dag):
    # each variable has ~unit variance by construction
    v = dag.x.var(axis=0)
    assert np.all(np.abs(v - 1.0) < 0.25)


def test_true_effects_shape(dag):
    te = dag.true_trait_effects()
    assert te.shape == (dag.num_trait, dag.num_trait)
    assert np.all(te[np.tril_indices_from(te)] == 0)


def test_artifacts_roundtrip(dag, tmp_path):
    from scipy.io import mmread

    paths = write_simulation_artifacts(dag, str(tmp_path))
    adj = mmread(paths["true_adj"]).toarray()
    assert np.allclose(adj, dag.A)
    corr = mmread(paths["corr"]).toarray()
    assert corr.shape[0] == dag.pq - dag.num_latent


def test_skeleton_recovery_on_simulated_dag(dag):
    """Skeleton on the observed correlation panel recovers most true edges.

    Uses the reference's simulation-based validation strategy: F1 of the
    estimated skeleton vs the moralized true graph restricted to observed
    variables must be high.
    """
    obs = dag.observed()
    n = obs.shape[0]
    C = np.corrcoef(obs, rowvar=False).astype(np.float32)
    res = skeleton(C, threshold_array(n, 1e-3), 14)

    keep = np.r_[
        np.arange(dag.num_snp), np.arange(dag.num_snp + dag.num_latent, dag.pq)
    ]
    true_dir = dag.G[np.ix_(keep, keep)] != 0
    true_skel = true_dir | true_dir.T
    est = res.G.astype(bool)

    iu = np.triu_indices(len(keep), 1)
    tp = np.sum(est[iu] & true_skel[iu])
    fn = np.sum(~est[iu] & true_skel[iu])
    recall = tp / max(tp + fn, 1)
    # with effect sizes >= 0.1 and n=8000, nearly every true edge is
    # detectable; allow some slack for latent-confounded extra edges
    assert recall > 0.8, f"recall {recall}"


def test_simulate_genotype_dataset(tmp_path):
    from cigwas_tpu.io.bed import BfilesBase, decode_bed_values
    from cigwas_tpu.io.phen import load_phen
    from cigwas_tpu.sim import simulate_genotype_dataset

    stem = simulate_genotype_dataset(
        str(tmp_path), num_samples=200, num_markers=30, missing_rate=0.05, seed=1
    )
    assert BfilesBase(stem).has_valid_bed_prefix()
    ph = load_phen(stem + ".phen")
    assert ph.num_phen == 3
    assert ph.num_samples == 200
