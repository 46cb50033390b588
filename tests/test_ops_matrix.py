"""Device matrix kernels vs float64 numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from hic_genome_assembler_tpu.ops import matrix as dev
from hic_genome_assembler_tpu.ops import oracle


@pytest.fixture(scope="module")
def mat(genome):
    return genome.matrix


def test_distance_matches_oracle(mat):
    got = np.asarray(dev.to_distance(jnp.asarray(mat)))
    want = oracle.to_distance(mat)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.min() >= 1.0 and got.max() <= 2.0


def test_similarity_inverts_distance(mat):
    row_sums = mat.sum(axis=1)
    dist = oracle.to_distance(mat)
    got = np.asarray(dev.to_similarity(jnp.asarray(dist), jnp.asarray(row_sums)))
    np.testing.assert_allclose(got, mat, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("plus_one", [True, False])
def test_log_transform_roundtrip(mat, plus_one):
    m = jnp.asarray(mat)
    fwd = dev.log_transform(m, plus_one=plus_one)
    np.testing.assert_allclose(
        np.asarray(fwd), oracle.log_transform(mat, plus_one=plus_one), rtol=1e-12
    )
    back = dev.log_transform(fwd, reverse=True, plus_one=plus_one)
    # roundtrip matches the oracle's roundtrip exactly (note: the no-+1
    # part2 variant genuinely loses entries whose value is 1.0 — log=0
    # hits the zero-guard, same as the reference, orderGenome.py:169-170)
    want = oracle.log_transform(
        oracle.log_transform(mat, plus_one=plus_one), reverse=True, plus_one=plus_one
    )
    np.testing.assert_allclose(np.asarray(back), want, rtol=1e-9, atol=1e-12)
    if plus_one:
        np.testing.assert_allclose(np.asarray(back), mat, rtol=1e-6, atol=1e-9)
    assert np.all(np.asarray(fwd)[mat == 0.0] == 0.0)


def test_reorder_symmetric(mat):
    rng = np.random.default_rng(0)
    order = rng.permutation(mat.shape[0])
    got = np.asarray(dev.reorder(jnp.asarray(mat), jnp.asarray(order)))
    want = mat[order][:, order]
    np.testing.assert_allclose(got, want)


def test_rank_matrix_sorted_desc(mat):
    ranks = np.asarray(dev.rank_matrix_desc(jnp.asarray(mat)))
    # each row's rank order must actually sort the row descending
    for i in range(0, mat.shape[0], 7):
        vals = mat[i, ranks[i]]
        assert np.all(np.diff(vals) <= 1e-12)
    # oracle (reference tie behavior) sorts identically by value
    oranks = oracle.rank_matrix_desc(mat)
    for i in range(0, mat.shape[0], 7):
        np.testing.assert_allclose(mat[i, ranks[i]], mat[i, oranks[i]])


@pytest.mark.parametrize("start", [0, 3, 17])
def test_growing_window_counts(mat, start):
    ranks = oracle.rank_matrix_desc(mat).astype(np.int32)
    got = np.asarray(dev.growing_window_counts(jnp.asarray(ranks), jnp.int32(start)))
    want = oracle.growing_window_counts(ranks, start)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("start,cut", [(0, 5), (4, 20), (10, 30)])
def test_fixed_window_counts(mat, start, cut):
    ranks = oracle.rank_matrix_desc(mat).astype(np.int32)
    got = np.asarray(dev.fixed_window_counts(jnp.asarray(ranks), jnp.int32(start), jnp.int32(cut)))
    want = oracle.fixed_window_counts(ranks, start, cut)
    np.testing.assert_array_equal(got, want)


def test_condensed_upper_matches_scipy(mat):
    import scipy.spatial.distance as ssd

    got = dev.condensed_upper(mat)
    want = ssd.squareform(mat, checks=False)
    np.testing.assert_allclose(got, want)


def test_mesh_sharded_transform_runs():
    """Full distance transform under an 8-device mesh sharding."""
    import jax
    from hic_genome_assembler_tpu.parallel import mesh as pm

    mesh = pm.make_mesh((8, 1))
    n = 64
    rng = np.random.default_rng(1)
    m = rng.random((n, n))
    m = m + m.T
    sharded = jax.device_put(jnp.asarray(m), pm.matrix_sharding(mesh))
    out = dev.to_distance(sharded)
    np.testing.assert_allclose(np.asarray(out), oracle.to_distance(m), rtol=1e-12)
    assert len(out.sharding.device_set) == 8


def test_fixed_window_counts_many_matches_single():
    """Batched (start, cut) counts == per-call kernel == oracle."""
    import jax.numpy as jnp
    import numpy as np

    from hic_genome_assembler_tpu.ops import matrix as dev
    from hic_genome_assembler_tpu.ops import oracle

    rng = np.random.default_rng(11)
    n = 60
    m = rng.random((n, n))
    rank = oracle.rank_matrix_desc(m)
    params = np.array([[0, 10], [3, 25], [7, 59], [0, 0]], dtype=np.int32)
    batched = np.asarray(
        dev.fixed_window_counts_many(jnp.asarray(rank), jnp.asarray(params))
    )
    for k, (s, c) in enumerate(params):
        want = oracle.fixed_window_counts(rank, int(s), int(c))
        np.testing.assert_array_equal(batched[k], want)


def test_native_distance_transform_bit_identical():
    """The fused threaded native kernel feeding UPGMA
    (native/distance_transform.cpp) must be BIT-identical to the numpy
    expression at every shape — the dendrogram is a byte-equality target
    (SURVEY §7 "bit-identical UPGMA"); also covers the in-place numpy
    fallback inside oracle.to_distance."""
    from hic_genome_assembler_tpu.io import native

    rng = np.random.default_rng(11)
    for n in (5, 127, 1030):  # odd sizes, one above the 1-thread cutoff
        m = rng.random((n, n)) * 50
        m = np.triu(m) + np.triu(m, 1).T
        rs = m.sum(axis=1, keepdims=True)
        want = (1.0 - m / rs) + 1.0
        assert np.array_equal(oracle.to_distance(m), want)
        if native.available():
            assert np.array_equal(native.distance_transform_f64(m, rs), want)


def test_rank_matrix_accel_paths_bit_identical():
    """Both rank-build fast paths must reproduce numpy's default argsort
    tie order bit-for-bit: the thread-parallel path by construction
    (same numpy kernel per row), the native introsort clone only where
    its probe passes on this numpy build (AVX-512 dispatch changes tie
    order).  Wide 16K-ish rows are covered by the probe itself
    (oracle._native_argsort_matches_numpy probes 2048 AND 16384)."""
    rng = np.random.default_rng(4)
    m = rng.integers(0, 5, (257, 1031)).astype(np.float64)  # tie-heavy
    want = np.argsort(m, axis=1)[:, ::-1]
    assert np.array_equal(oracle._thread_argsort_desc(m, workers=2), want)
    if oracle._native_argsort_matches_numpy():
        from hic_genome_assembler_tpu.io import native

        assert np.array_equal(native.argsort_rows_f64(m), want)


def test_device_rank_matrix_reference_tie_rule():
    """Device rank_matrix_desc must use the reference's tie rule —
    stable ascending argsort REVERSED (ties resolve by descending
    index), not stable-descending (ascending ties).  A fixture where
    ties dominate makes the difference visible."""
    m = np.zeros((4, 6), dtype=np.float32)
    m[0, 2] = 1.0
    got = np.asarray(dev.rank_matrix_desc(jnp.asarray(m)))
    want = np.argsort(m.astype(np.float64), axis=1, kind="stable")[:, ::-1]
    assert np.array_equal(got, want)


def test_permute_symmetric_matches_np_ix():
    """Native threaded permute/subset gather is bit-identical to
    matrix[np.ix_(order, order)] for permutations, index subsets and
    boolean masks (pure data movement)."""
    rng = np.random.default_rng(9)
    n = 1200  # above the native-path size floor
    m = rng.random((n, n))
    cases = [
        rng.permutation(n),
        np.sort(rng.choice(n, size=n - 77, replace=False)),
        rng.random(n) > 0.4,
    ]
    for order in cases:
        got = oracle.permute_symmetric(m, order)
        assert np.array_equal(got, m[np.ix_(order, order)])


def test_thread_rowmap_bit_identical_and_fallback():
    rng = np.random.default_rng(10)
    m = rng.random((257, 129))
    out = oracle._thread_rowmap(m, lambda b: b * 2.0 + 1.0)
    assert out is not None
    assert np.array_equal(out, m * 2.0 + 1.0)
    # a failing transform returns None (callers then go serial)
    def boom(_b):
        raise RuntimeError("x")
    assert oracle._thread_rowmap(m, boom) is None


def test_hostmem_tune_idempotent():
    from hic_genome_assembler_tpu.utils import hostmem

    first = hostmem.tune()
    assert hostmem.tune() == first  # second call is a cached no-op
