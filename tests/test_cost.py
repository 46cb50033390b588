"""Permutation scoring engine vs the reference cost oracle."""

import numpy as np
import pytest

from hic_genome_assembler_tpu.ops import cost, oracle, perms


def random_block_problem(seed=0, sizes=(4, 3, 2, 1)):
    rng = np.random.default_rng(seed)
    C = sum(sizes)
    m = rng.random((C, C)) * 10
    m = np.triu(m, 1)
    m = m + m.T + np.diag(rng.random(C))
    return m, list(sizes)


def test_harmonic_weight_identity():
    """cost == sum_d trace_d * w_d must equal the reference loop."""
    m, _ = random_block_problem(1, (5, 5))
    C = m.shape[0]
    total = cost.upper_triangle_total(m)
    w = cost.harmonic_weights(C, total)
    direct = sum(
        float(np.trace(m, offset=d)) * w[d] for d in range(1, C)
    )
    assert direct == pytest.approx(oracle.cost_function(m, total), rel=1e-12)


def test_block_scorer_exhaustive_matches_oracle():
    """Every (order, orientation) candidate of a 4-scaffold brute force
    must score identically to the reference formula."""
    m, sizes = random_block_problem(4)
    scorer = cost.BlockScorer(m, sizes, dtype=np.float64)
    orders = perms.order_batch(len(sizes))
    orients = perms.orient_batch(len(sizes))
    got = scorer.score_batch(orders, orients)
    idx = 0
    for o in orders:
        for r in orients:
            bo = cost.bin_order_of_block(o, r, sizes)
            want = oracle.cost_function(m[np.ix_(bo, bo)], scorer.total)
            assert got[idx] == pytest.approx(want, rel=1e-9), (o, r)
            # host path: reference-exact
            assert scorer.score_host(o, r) == want
            idx += 1
    # total candidates = N!/2 * 2^N
    assert idx == perms.calc_possible_perms(len(sizes))
    assert idx == len(orders) * len(orients)


def test_block_scorer_single_bin_scaffolds():
    m, sizes = random_block_problem(5, (1, 1, 1, 2))
    scorer = cost.BlockScorer(m, sizes, dtype=np.float64)
    orders = perms.order_batch(4)
    orients = perms.orient_batch(4)
    got = scorer.score_batch(orders, orients)
    o, r = orders[7], orients[3]
    bo = cost.bin_order_of_block(o, r, sizes)
    want = oracle.cost_function(m[np.ix_(bo, bo)], scorer.total)
    assert got[7 * len(orients) + 3] == pytest.approx(want, rel=1e-9)


def test_degenerate_zero_total():
    sizes = [2, 1]
    m = np.zeros((3, 3))
    scorer = cost.BlockScorer(m, sizes)
    out = scorer.score_batch(perms.order_batch(2), perms.orient_batch(2))
    assert np.all(out == 0.0)


def test_argmax_reference_ties():
    costs = np.array([1.0, 3.0, 3.0, 2.0])
    idx, best = cost.argmax_reference_ties(costs)
    assert idx == 1 and best == 3.0
    # rescoring can reorder: candidate 2 is actually best in f64
    idx, best = cost.argmax_reference_ties(
        costs, rescore=lambda i: [1.0, 3.0, 3.5, 2.0][i], k=4
    )
    assert idx == 2 and best == 3.5


# ---- enumeration order parity -------------------------------------------

def test_permutation_order_reference():
    got = perms.permutations_swap_order(["a", "b", "c"])
    assert got == [
        ["a", "b", "c"], ["a", "c", "b"], ["b", "a", "c"],
        ["b", "c", "a"], ["c", "b", "a"], ["c", "a", "b"],
    ]


def test_reverse_dedup_keeps_earliest():
    got = perms.remove_reverse_duplicates(perms.permutations_swap_order(list("abc")))
    assert got == [["a", "b", "c"], ["a", "c", "b"], ["b", "a", "c"]]
    for n in (2, 3, 4, 5):
        kept = perms.remove_reverse_duplicates(
            perms.permutations_swap_order(list(range(n)))
        )
        import math

        assert len(kept) == math.factorial(n) // 2


def test_plus_minus_perm_order():
    got = perms.plus_minus_perms(3)
    assert got == [
        ["+", "+", "+"], ["-", "-", "-"],
        ["+", "-", "-"], ["-", "+", "-"], ["-", "-", "+"],
        ["+", "+", "-"], ["+", "-", "+"], ["-", "+", "+"],
    ]
    for n in (1, 2, 3, 4, 6):
        assert len(perms.plus_minus_perms(n)) == 2 ** n


def test_calc_possible_perms():
    assert perms.calc_possible_perms(6) == 23040
    assert perms.calc_possible_perms(8) == 5160960


def test_pair_profile_build_matches_definition_oracle():
    """The device pair-profile build must equal the definition: h[(s*Sp
    + t)*4 + e, m] = sum of cross-scaffold entries M[a, b] whose
    orientation-specific offset maps to m (cost.py build formulas)."""
    rng = np.random.default_rng(7)
    cases = [
        [5, 4, 3, 3, 2, 1],
        [1, 1, 1],
        [7],
        [4, 4, 4, 4],
        [6, 1],
        [9, 7, 5, 5, 4, 3, 3, 2, 2, 2, 1, 1, 1],
    ]
    for sizes in cases:
        sizes_arr = np.asarray(sizes, dtype=np.int64)
        S, C = len(sizes), int(sizes_arr.sum())
        m = rng.random((C, C))
        m = (m + m.T).astype(np.float64)
        scorer = cost.ChromosomeScorer(m, sizes, dtype=np.float64)
        # the scorer buckets (Sp, L, shift) for executable sharing; the
        # oracle uses its reported values
        Sp, L = scorer.Sp, scorer.L
        shift = scorer.cmax - 1
        offsets = np.concatenate([[0], np.cumsum(sizes_arr)[:-1]])
        want = np.zeros((4 * Sp * Sp, L))
        for s in range(S):
            for t in range(S):
                if s == t:
                    continue
                cs, ct = sizes_arr[s], sizes_arr[t]
                for a in range(cs):
                    for b in range(ct):
                        v = m[offsets[s] + a, offsets[t] + b]
                        for e, mm in enumerate(
                            (
                                (b - a) + shift,
                                (ct - 1 - (a + b)) + shift,
                                ((a + b) - cs + 1) + shift,
                                ((ct - cs) - (b - a)) + shift,
                            )
                        ):
                            want[(s * Sp + t) * 4 + e, np.clip(mm, 0, L - 1)] += v
        got = np.asarray(scorer._h)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_combo_topk_matches_block_scores():
    """The combo-factorized brute-force path must score every candidate
    identically (f64 CPU) to the dense block path, and its top-k must
    contain the global argmax with the same candidate indexing."""
    rng = np.random.default_rng(11)
    for sizes in ([5, 4, 3, 2], [3, 3, 2, 2, 1], [4, 2], [2, 2, 2, 2, 2, 2]):
        S, C = len(sizes), sum(sizes)
        m = rng.random((C, C))
        m = (m + m.T).astype(np.float64)
        sc = cost.BlockScorer(m, sizes, dtype=np.float64)
        orders = perms.order_batch(S)
        orients = perms.orient_batch(S)
        full = sc.score_batch(orders, orients)  # chunked dense path
        handles, finish = sc._score_topk_combo_async(
            orders,
            orients,
            _e_onehot(orders.shape[1], orients, np.float64),
            k=16,
        )
        idx, vals, _floor = finish([np.asarray(h) for h in handles])
        np.testing.assert_allclose(vals, full[idx], rtol=1e-12)
        assert int(np.argmax(full)) in set(idx.tolist())


def _e_onehot(S, orients, dtype):
    pi, pj = np.triu_indices(S, k=1)
    P = len(pi)
    R = orients.shape[0]
    e_pair = (orients[:, pi] * 2 + orients[:, pj]).astype(np.int32)
    e = np.zeros((P * 4, R), dtype=dtype)
    for r in range(R):
        e[np.arange(P) * 4 + e_pair[r], r] = 1.0
    return e
