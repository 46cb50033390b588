"""Pallas kernel equality vs the XLA/numpy formulations (interpret mode
on the CPU test mesh; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hic_genome_assembler_tpu.ops import matrix as dev
from hic_genome_assembler_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def rank_mat():
    rng = np.random.default_rng(0)
    n = 603  # deliberately not a tile multiple
    m = rng.random((n, n))
    return np.argsort(-m, axis=1).astype(np.int32)


@pytest.mark.parametrize("start", [0, 1, 7, 300, 601])
def test_growing_counts_match_xla(rank_mat, start):
    want = np.asarray(
        dev.growing_window_counts(jnp.asarray(rank_mat), jnp.int32(start))
    )
    got = np.asarray(
        pk.growing_window_counts(jnp.asarray(rank_mat), start, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("start,cut", [(0, 5), (3, 77), (100, 400), (0, 602)])
def test_fixed_counts_match_xla(rank_mat, start, cut):
    want = np.asarray(
        dev.fixed_window_counts(
            jnp.asarray(rank_mat), jnp.int32(start), jnp.int32(cut)
        )
    )
    got = np.asarray(
        pk.fixed_window_counts(jnp.asarray(rank_mat), start, cut, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_prepadded_paths_match_unpadded(rank_mat):
    """RankCounts pads the rank matrix ONCE and passes n=; the
    pre-padded entry points must agree with the pad-per-call ones."""
    n = rank_mat.shape[0]
    padded = pk.pad_rank(jnp.asarray(rank_mat, dtype=jnp.int32))
    assert padded.shape[0] % pk._TILE_R == 0
    assert padded.shape[1] % pk._TILE_C == 0

    for start in (0, 7, 300):
        want = np.asarray(
            pk.growing_window_counts(jnp.asarray(rank_mat), start, interpret=True)
        )
        got = np.asarray(
            pk.growing_window_counts(padded, start, interpret=True, n=n)
        )
        np.testing.assert_array_equal(got, want)

    want = np.asarray(
        pk.fixed_window_counts(jnp.asarray(rank_mat), 3, 77, interpret=True)
    )
    got = np.asarray(pk.fixed_window_counts(padded, 3, 77, interpret=True, n=n))
    np.testing.assert_array_equal(got, want)

    pairs = [(0, 5), (3, 77), (100, 400)]
    want = pk.fixed_window_counts_many(jnp.asarray(rank_mat), pairs, interpret=True)
    got = pk.fixed_window_counts_many(padded, pairs, interpret=True, n=n)
    np.testing.assert_array_equal(got, want)


def test_rankcounts_host_pad_layout():
    """The host-side one-shot pad in RankCounts matches pad_rank."""
    from hic_genome_assembler_tpu.cluster import breakpoints

    rng = np.random.default_rng(1)
    n = 130
    rank = np.argsort(-rng.random((n, n)), axis=1).astype(np.int32)
    t_r = -n % pk._TILE_R
    t_c = -n % pk._TILE_C
    host = np.full((n + t_r, n + t_c), -1, dtype=np.int32)
    host[:n, :n] = rank
    want = np.asarray(pk.pad_rank(jnp.asarray(rank, dtype=jnp.int32)))
    np.testing.assert_array_equal(host, want)


def test_counts_call_column_sliced_rectangular():
    """prefetch_fixed_pairs dispatches fixed windows on column-sliced
    (rectangular) views of the padded rank matrix — counts must equal
    the full-matrix scan for every window narrower than the slice."""
    rng = np.random.default_rng(5)
    n = 3000  # pads to 4096 cols, so the 2048-col slice is genuinely
    #           rectangular (a 700-bin matrix pads to exactly 2048 and
    #           would make this test compare the matrix to itself)
    rank = np.argsort(-rng.random((n, n)), axis=1).astype(np.int32)
    padded = pk.pad_rank(jnp.asarray(rank))
    b = 2048  # _TILE_C-aligned slice (the smallest bucket)
    assert padded.shape[1] > b
    sliced = padded[:, :b]
    for start, cut in ((0, 5), (3, 77), (100, 640), (900, 2500), (2940, 2999)):
        params = jnp.asarray(np.array([start, cut, 0], dtype=np.int32))
        full = np.asarray(pk._counts_call(padded, params, interpret=True))[:n]
        part = np.asarray(pk._counts_call(sliced, params, interpret=True))[:n]
        np.testing.assert_array_equal(part, full, err_msg=f"{start},{cut}")
