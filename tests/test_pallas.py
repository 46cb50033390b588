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
