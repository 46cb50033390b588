"""JAX Gaussian HMM + HMM cut strategy."""

import numpy as np

from hic_genome_assembler_tpu.cluster import hmm_cuts
from hic_genome_assembler_tpu.ops.gaussian_hmm import GaussianHMM2


def two_segment_obs(seed=0, t1=40, t2=40, d=6, sep=4.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(0.0, 1.0, (t1, d))
    b = rng.normal(sep, 1.0, (t2, d))
    return np.vstack([a, b])


def test_hmm_segments_two_states():
    X = two_segment_obs()
    model = GaussianHMM2(seed=0).fit(X)
    states = model.predict(X)
    # one contiguous switch, segments pure
    assert len(set(states[:40])) == 1
    assert len(set(states[40:])) == 1
    assert states[0] != states[-1]


def test_hmm_transmat_reestimated():
    X = two_segment_obs(seed=1)
    model = GaussianHMM2(seed=0).fit(X)
    assert model.transmat_.shape == (2, 2)
    np.testing.assert_allclose(model.transmat_.sum(axis=1), [1.0, 1.0], rtol=1e-9)
    # startprob stays uniform (the reference's startmat_ typo behavior)
    np.testing.assert_allclose(model.startprob, [0.5, 0.5])


def test_identify_boundary():
    states = np.array([0] * 20 + [1] * 20)
    cut = hmm_cuts.identify_boundary(states, [0], switch_count=5)
    assert cut == 20
    # offset by previous cut
    cut = hmm_cuts.identify_boundary(states, [0, 100], switch_count=5)
    assert cut == 120
    # no sustained switch -> 0
    noisy = np.array([0, 1] * 20)
    assert hmm_cuts.identify_boundary(noisy, [0], switch_count=5) == 0


def test_hmm_cut_strategy_on_blocks():
    """Two-chromosome log-similarity structure -> boundary recovered."""
    rng = np.random.default_rng(3)
    sizes = (35, 30)
    n = sum(sizes)
    labels = np.repeat(np.arange(2), sizes)
    same = labels[:, None] == labels[None, :]
    dist = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    m = np.where(same, 2.0 - np.log10(1.0 + dist), 0.0) + rng.random((n, n)) * 0.01
    m = np.triu(m) + np.triu(m, 1).T

    cuts = hmm_cuts.identify_chromosome_groups_hmm(
        m, None, min_size=5, modularity=0.05, convergence_rounds=5, look_ahead=False
    )
    assert any(abs(c - 35) <= 2 for c in cuts), cuts
