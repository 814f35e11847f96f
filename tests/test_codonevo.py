"""CodonEvo unit tests (reference src/codonevo.cc semantics)."""

import numpy as np

from augustus_tpu.cgp.codonevo import (CodonEvo, codon_rate_matrix,
                                       estimate_pi, fitch_substitutions,
                                       omega_grid, omega_prior)
from augustus_tpu.cgp.phylo import PhyloTree, parse_newick


def test_omega_grid_matches_reference_examples():
    """The documented examples in CodonEvo::setOmegas (codonevo.cc:34)."""
    assert np.allclose(omega_grid(5), [0.5, 0.75, 1, 4 / 3.0, 2])
    g10 = omega_grid(10)
    assert np.allclose(
        np.round(g10, 2), [0.29, 0.43, 0.57, 0.71, 0.86, 1, 1.17,
                           1.4, 1.75, 2.33], atol=0.005)
    assert omega_grid(2).tolist() == [1 - 1 / 3.0, 1.0]


def test_rate_matrix_properties():
    pi = estimate_pi(["atggctgctaaagctgcttggtctcat" * 4])
    Q = codon_rate_matrix(pi, 0.7, 4.0)
    # rows sum to zero; normalized to one expected mutation per time unit
    assert np.abs(Q.sum(axis=1)).max() < 1e-12
    assert abs(-(np.diag(Q) * pi).sum() - 1.0) < 1e-12
    # stop-codon rows are zero (pi == 0 there)
    taa = 3 * 16 + 0 * 4 + 0
    assert np.abs(Q[taa]).max() == 0.0
    # detailed balance: pi_i q_ij == pi_j q_ji (reversibility)
    bal = pi[:, None] * Q - (pi[:, None] * Q).T
    assert np.abs(bal).max() < 1e-12


def test_probability_matrices_and_omega_estimation():
    pi = estimate_pi(["atggctgctaaagctgcttggtctcatccc" * 5])
    tree = PhyloTree(parse_newick("((a:0.1,b:0.1):0.05,c:0.2);"))
    ce = CodonEvo(pi, [0.1, 0.1, 0.05, 0.2], k=8, m=10)
    pos = pi > 0
    # P(t) rows are stochastic on the support of pi
    for v in (0, ce.times.shape[0] - 1):
        P = ce.P[0, v]
        assert np.abs(P[pos].sum(axis=1) - 1).max() < 1e-9
    # identical tuples: no substitutions, purifying omega preferred
    tup = np.full((8, 3), 10, dtype=np.int64)
    w, subst, post = ce.est_omega(tree, tup)
    assert subst == 0
    assert w <= 1.0 and post < 1.0
    # heavily diverged random tuples: substitutions counted
    rng = np.random.RandomState(1)
    tup2 = rng.randint(0, 64, (12, 3))
    _, s2, _ = ce.est_omega(tree, tup2)
    assert s2 > 10


def test_fitch_counts():
    tree = PhyloTree(parse_newick("((a:1,b:1):1,c:1);"))
    # one column where a==b != c -> 1 substitution; one where all equal -> 0
    tuples = np.array([[5, 5, 9], [7, 7, 7]])
    assert fitch_substitutions(tree, tuples) == 1
    # missing codon (64) matches anything
    tuples = np.array([[5, 64, 9]])
    assert fitch_substitutions(tree, tuples) == 1
