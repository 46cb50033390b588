"""ops.hypergeom decision parity vs scipy — the exact oracle.

The breakpoint machinery consumes hypergeometric p-values only through
the strict decision ``sf(x-1, M, n, N) < psig`` (reference hyper_geom,
scaffoldToChromosomes.py:352-368).  ge_significant must be
decision-identical to scipy for EVERY element, including scipy's nan
behavior on invalid parameters (the dynamic world-size shrink makes
curr > M, scaffoldToChromosomes.py:457-459) and exact boundary scans.
"""

import numpy as np
import pytest

from hic_genome_assembler_tpu.ops import hypergeom as hg


def ref(x, M, n, N, psig):
    return hg._scipy_ge(x, M, n, N, psig)


def test_boundary_scan_all_x_nn_case():
    """Every x across the full support for the n == N == k row-scan case."""
    for M in (1, 2, 7, 50, 137, 1000):
        for k in range(0, M + 1, max(1, M // 23)):
            xs = np.arange(-1, k + 3)
            got = hg.ge_significant(xs, M, k, k, 0.05)
            want = ref(xs, M, k, k, 0.05)
            np.testing.assert_array_equal(got, want, err_msg=f"M={M} k={k}")


def test_general_parameters_random():
    rng = np.random.default_rng(42)
    bad = 0
    for _ in range(1500):
        M = int(rng.integers(1, 3000))
        n = int(rng.integers(0, int(M * 1.2)))  # includes invalid n > M
        N = int(rng.integers(0, int(M * 1.2)))
        psig = float(rng.choice([0.05, 0.01, 0.5, 1e-6, 0.3]))
        xs = np.arange(max(0, n + N - M) - 1, min(n, N) + 2)
        bad += int((hg.ge_significant(xs, M, n, N, psig) != ref(xs, M, n, N, psig)).sum())
    assert bad == 0


def test_invalid_params_match_scipy_nan_behavior():
    # scipy yields nan -> (nan < psig) is False; the shrunken-M quirk path
    xs = np.array([0, 3, 10])
    for M, n, N in [(10, 15, 15), (10, 5, 15), (10, 15, 5), (0, 0, 0), (-3, 1, 1)]:
        got = hg.ge_significant(xs, M, n, N, 0.05)
        assert not got.any()


def test_vectorized_mixed_validity():
    rng = np.random.default_rng(3)
    M = 500
    n = rng.integers(0, 700, size=4000)
    N = rng.integers(0, 700, size=4000)
    x = rng.integers(-2, 500, size=4000)
    got = hg.ge_significant(x, M, n, N, 0.05)
    want = ref(x, M, n, N, 0.05)
    np.testing.assert_array_equal(got, want)


def test_growing_sweep_shape_16k_slice():
    """The hot call shape: k = 1..n-1 with x near mu (noise rows) plus
    strongly significant rows (in-chromosome)."""
    rng = np.random.default_rng(0)
    M = 4096
    k = np.arange(1, M)
    mu = k * k / M
    x = np.clip(
        (mu + rng.normal(0, np.sqrt(np.maximum(k, 1)) * 0.5)).astype(np.int64), 0, k
    )
    x[::3] = (k[::3] * 0.9).astype(np.int64)
    got = hg.ge_significant(x, M, k, k, 0.05)
    want = ref(x, M, k, k, 0.05)
    np.testing.assert_array_equal(got, want)


def test_near_tie_psig_exactly_achievable():
    """psig set exactly to an achievable sf value: strict < must hold.

    sf values are exactly representable ratios only rarely; instead set
    psig to the scipy-computed sf at a point and check both sides.
    """
    import scipy.stats

    M, k = 200, 40
    for x in range(3, 20):
        pv = float(scipy.stats.hypergeom.sf(x - 1, M, k, k))
        if not (0 < pv < 1):
            continue
        xs = np.array([x])
        # psig == pv: strict < is False at x, True at x+1 (pv decreasing)
        assert not hg.ge_significant(xs, M, k, k, pv)[0]
        assert hg.ge_significant(xs + 1, M, k, k, pv)[0] == ref(xs + 1, M, k, k, pv)[0]
        # psig infinitesimally above pv
        assert hg.ge_significant(xs, M, k, k, np.nextafter(pv, 1.0))[0]


def test_dedup_fast_path_matches():
    """Constant-parameter vector call (the filter's row sweep shape)."""
    rng = np.random.default_rng(9)
    M, k = 8192, 700
    x = rng.integers(0, k + 1, size=8192)
    got = hg.ge_significant(x, M, k, k, 0.05)
    want = ref(x, M, k, k, 0.05)
    np.testing.assert_array_equal(got, want)


def test_fallback_is_rare_and_counted():
    hg.stats.update(calls=0, rows=0, fallback_rows=0)
    rng = np.random.default_rng(1)
    M = 2048
    k = np.arange(1, M)
    x = np.clip((k * k / M).astype(np.int64) + rng.integers(-40, 40, size=k.size), 0, k)
    hg.ge_significant(x, M, k, k, 0.05)
    assert hg.stats["rows"] == k.size
    # windows + Chernoff bounds should decide essentially everything
    assert hg.stats["fallback_rows"] <= k.size * 0.01


@pytest.mark.parametrize("psig", [1e-9, 1e-3, 0.05, 0.25, 0.75, 0.999])
def test_psig_sweep(psig):
    rng = np.random.default_rng(int(psig * 1e6) % 2**31)
    M = 777
    k = np.arange(0, M + 1, 3)
    x = rng.integers(0, np.maximum(k, 1) + 1)
    got = hg.ge_significant(x, M, k, k, psig)
    want = ref(x, M, k, k, psig)
    np.testing.assert_array_equal(got, want)
