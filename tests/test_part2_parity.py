"""Decision parity: device search == serial f64 reference semantics.

An independent, fully-host reimplementation of the reference's Part 2
search (orderGenome.py:432-549: brute force -> greedy insertion ->
sliding window, every candidate scored with the exact f64 cost on the
gathered dense submatrix, strict ``>`` updates) is run side by side
with the production device path (ChromosomeScorer factorization).  The
two must make IDENTICAL decisions — order and orientation — on noisy
random problems where near-ties are common.
"""

import numpy as np
import pytest

from hic_genome_assembler_tpu.models import part2_order
from hic_genome_assembler_tpu.ops import oracle, perms


def _bin_order(order, orients, sizes):
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    out = []
    for s, e in zip(order, orients):
        bins = list(range(offsets[s], offsets[s] + sizes[s]))
        out.extend(bins[::-1] if e else bins)
    return np.asarray(out, dtype=np.int64)


def _score(matrix, order, orients, sizes, include):
    bo = _bin_order(order, orients, sizes)
    sub = matrix[np.ix_(bo, bo)]
    total = oracle.upper_triangle_total(sub)
    if total == 0.0:
        return 0.0, True
    return oracle.cost_function(sub, total), False


def _reference_search(matrix, sizes, n_scaffolds, scan_scaffolds):
    """Serial reference-semantics search over scaffold ids 0..S-1
    (size-descending layout assumed, as in the canonical matrix)."""
    S = len(sizes)
    n = min(n_scaffolds, S)

    # stage 1: brute force (strict > update, enumeration order)
    orders = perms.order_batch(n)
    orients = perms.orient_batch(n)
    best, best_o, best_r = None, list(orders[0]), list(orients[0])
    for o in orders:
        for r in orients:
            c, degen = _score(matrix, o, r, sizes, list(o))
            if degen:
                continue
            if best is None or c > best:
                best, best_o, best_r = c, list(o), list(r)
    order_ids, flags = list(map(int, best_o)), list(map(int, best_r))

    # stage 2: greedy insertion incl. final self-reinsertion
    remaining = list(range(n, S))
    best_cost = 0.0
    while True:
        if remaining:
            new, state = remaining.pop(0), 0
        else:
            new = order_ids.pop(-1)
            state = flags.pop(-1)
        best_c, best_slot, best_e = None, None, None
        st = state
        for slot in range(len(order_ids) + 1):
            for e in (st, 1 - st):
                o = order_ids[:slot] + [new] + order_ids[slot:]
                r = flags[:slot] + [e] + flags[slot:]
                c, degen = _score(matrix, o, r, sizes, o)
                if degen:
                    continue
                if best_c is None or c > best_c:
                    best_c, best_slot, best_e = c, slot, e
            st = 1 - st
        if best_c is None or best_c <= 0.0:
            best_slot, best_e, best_cost = 0, 0, 0.0
        else:
            best_cost = best_c
        order_ids.insert(best_slot, new)
        flags.insert(best_slot, best_e)
        if not remaining:
            break

    # stage 3: sliding window.  Reference semantics (scanOrdering,
    # orderGenome.py:514-543): all candidates of a window are built from
    # the ordering FIXED at window start; the running best (strict >,
    # immediate bestCost update) is adopted after the window's loops.
    if S > n_scaffolds:
        w = min(scan_scaffolds, n_scaffolds)
        orders_w = perms.order_batch(w)
        orients_w = perms.orient_batch(w)
        while True:
            improved = False
            for i in range(0, S - w + 1):
                start_o = list(order_ids)
                start_f = list(flags)
                best_o, best_f = order_ids, flags
                for o in orders_w:
                    for r in orients_w:
                        fo = list(start_o)
                        fr = list(start_f)
                        fo[i : i + w] = [start_o[i + k] for k in o]
                        fr[i : i + w] = list(map(int, r))
                        c, degen = _score(matrix, fo, fr, sizes, fo)
                        if degen:
                            continue
                        if c > best_cost:
                            best_cost = c
                            best_o, best_f = fo, fr
                            improved = True
                order_ids, flags = best_o, best_f
            if not improved:
                break
    return order_ids, flags


def _random_problem(seed, sizes):
    rng = np.random.default_rng(seed)
    C = sum(sizes)
    pos = np.arange(C)
    m = 10.0 / (1.0 + np.abs(pos[:, None] - pos[None, :]))
    m += rng.random((C, C)) * 2.0  # strong noise -> contested decisions
    m = np.triu(m, 1)
    m = m + m.T
    return m


@pytest.mark.parametrize(
    "seed,sizes,n_scaffolds,scan",
    [
        (0, [5, 4, 3, 3, 2, 2, 1, 1], 4, 3),
        (1, [6, 5, 4, 2, 2, 1], 3, 3),
        (2, [4, 4, 3, 3, 2, 2, 2, 1, 1], 5, 4),
        (3, [3, 3, 3, 3], 4, 4),  # pure brute force
        (4, [7, 1, 1, 1, 1, 1], 3, 2),  # many single-bin scaffolds
    ],
)
def test_device_search_matches_serial_reference(seed, sizes, n_scaffolds, scan):
    m = _random_problem(seed, sizes)
    names = [f"scaf_{i}" for i in range(len(sizes))]
    bins = []
    bid = 0
    group = []
    for name, c in zip(names, sizes):
        for _ in range(c):
            group.append([bid, name])
            bins.append(part2_order.hicpro.Bin(bid, name, 0, 0, 1.0, 0.0))
            bid += 1
    ctx = part2_order._ChromosomeContext(m, bins)
    got = part2_order.order_chromosome(
        group, ctx, n_scaffolds=n_scaffolds, scan_scaffolds=scan
    )
    got_ids = [names.index(s.name) for s in got]
    got_flags = [0 if s.orientation == "+" else 1 for s in got]

    want_ids, want_flags = _reference_search(m, sizes, n_scaffolds, scan)
    assert got_ids == want_ids, (got_ids, want_ids)
    # orientations of single-bin scaffolds are scoring-neutral; compare
    # them too — the enumeration tie rule should still pin them.
    assert got_flags == want_flags, (got_flags, want_flags)
