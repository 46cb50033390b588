"""Part 3 orientation deciders + validPairs streaming (Python and native)."""

import numpy as np
import pytest

from hic_genome_assembler_tpu.io import filebus
from hic_genome_assembler_tpu.models import part3_orient as p3
from hic_genome_assembler_tpu.utils import fixtures


def make_scaff(name, orientation="+", size=10000.0, coords=(), resolution=1000):
    s = p3.RestrictionScaffold(name, orientation, size, list(coords))
    s.get_bin_count(resolution)
    return s


def test_res_counts_floor_and_split():
    s = make_scaff("a", size=10000, coords=[100, 200, 9900])
    s.get_res_counts(500)
    assert s.resLeft == 2 and s.resRight == 1
    s.get_res_counts(50)  # nothing in range -> floors at 1
    assert s.resLeft == 1 and s.resRight == 1


def test_bin_count_ceil():
    s = p3.RestrictionScaffold("a", "+", 25001.0, [])
    s.get_bin_count(10000)
    assert s.binCount == 3
    s2 = p3.RestrictionScaffold("b", "+", 9999.0, [])
    s2.get_bin_count(10000)
    assert s2.binCount == 1


def test_pull_triplets_edges():
    res = 10000
    small = lambda n: make_scaff(n, size=5000, resolution=res)  # noqa: E731
    big = lambda n: make_scaff(n, size=50000, resolution=res)  # noqa: E731
    # middle triplet
    lst = [big("a"), small("b"), big("c")]
    trips = p3.pull_triplets(lst)
    assert [[s.name for s in t] for t in trips] == [["a", "b", "c"]]
    # left edge: 2-tuple (self, right)
    lst = [small("b"), big("c")]
    assert [[s.name for s in t] for t in p3.pull_triplets(lst)] == [["b", "c"]]
    # right edge: 2-tuple (left, self)
    lst = [big("a"), small("b")]
    assert [[s.name for s in t] for t in p3.pull_triplets(lst)] == [["a", "b"]]


def test_read_pair_keys():
    res = 10000
    trip = [make_scaff("a", size=50000, resolution=res),
            make_scaff("b", size=5000, resolution=res),
            make_scaff("c", size=50000, resolution=res)]
    keys = p3.produce_read_pair_keys([[trip]])
    assert set(keys) == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def _write_pairs(path, rows):
    with open(path, "w") as out:
        for i, (s1, p1, s2, p2) in enumerate(rows):
            out.write(f"r{i}\t{s1}\t{p1}\t+\t{s2}\t{p2}\t-\t42\tF1\tF2\t60\t60\n")


def test_stream_python_vs_native(tmp_path):
    rows = [
        ("a", 100, "b", 200),
        ("x", 1, "y", 2),          # not in keys
        ("b", 300, "a", 400),
        ("a", 55, "b", 66),
    ]
    path = tmp_path / "pairs.txt"
    _write_pairs(path, rows)
    keys = {("a", "b"): [], ("b", "a"): []}

    import copy
    py = copy.deepcopy(keys)
    examined = 0
    with open(path) as handle:  # inline python reference path
        for line in handle:
            cols = line.strip("\r").strip("\n").split("\t")
            if (cols[1], cols[4]) in py:
                py[(cols[1], cols[4])].append([cols[1], cols[4], int(cols[2]), int(cols[5])])

    from hic_genome_assembler_tpu.io import native

    if native.available():
        nat = native.scan_validpairs(str(path), copy.deepcopy(keys))
        assert nat == py
    got = p3.read_valid_pair_file(str(path), copy.deepcopy(keys))
    assert got == py
    assert got[("a", "b")] == [["a", "b", 100, 200], ["a", "b", 55, 66]]


def test_orient_true_triplet_decision():
    """Hand-computed p/m per the reference rules
    (orientSmallScaffolds.py:179-241)."""
    L = 1000.0
    s0 = make_scaff("s0", "+", 10000, coords=[100, 9950])
    s1 = make_scaff("s1", "+", 500, coords=[250])
    s2 = make_scaff("s2", "+", 10000, coords=[50, 9990])
    trip = [s0, s1, s2]
    pairs = {k: [] for k in [("s0", "s1"), ("s1", "s0"), ("s1", "s2"), ("s2", "s1")]}
    # 3 pairs with s2 coord <= L (counted for p), 1 beyond
    pairs[("s1", "s2")] = [["s1", "s2", 10, 500], ["s1", "s2", 20, 900], ["s1", "s2", 30, 999], ["s1", "s2", 40, 5000]]
    # 1 pair with s0 near its right end (size - coord <= L)
    pairs[("s0", "s1")] = [["s0", "s1", 9500, 10]]
    name, orient = p3.orient_true_triplet(trip, pairs, L)
    # p = 3 / (resRight(s1)=1 + resLeft(s2)=1) = 1.5
    # m = 1 / (resRight(s1)=1 + resRight(s0)=1) = 0.5  -> "+"
    assert (name, orient) == ("s1", "+")

    # flip the balance: many pairs to the left neighbor
    pairs[("s0", "s1")] = [["s0", "s1", 9500 + i, 10] for i in range(8)]
    name, orient = p3.orient_true_triplet(trip, pairs, L)
    assert (name, orient) == ("s1", "-")


def test_orient_tie_prefers_plus():
    L = 1000.0
    s0 = make_scaff("s0", "+", 10000)
    s1 = make_scaff("s1", "+", 500)
    s2 = make_scaff("s2", "+", 10000)
    pairs = {k: [] for k in [("s0", "s1"), ("s1", "s0"), ("s1", "s2"), ("s2", "s1")]}
    name, orient = p3.orient_true_triplet([s0, s1, s2], pairs, L)
    assert orient == "+"  # p == m == 0 -> ">=" tie-break


def test_left_edge_case_decision():
    L = 1000.0
    left = make_scaff("lft", "+", 2000, coords=[500, 1500])
    right = make_scaff("rgt", "+", 10000, coords=[100])
    pairs = {("lft", "rgt"): [], ("rgt", "lft"): []}
    # left-coord in right half (>=1000) + right-coord near right's left edge -> p
    pairs[("lft", "rgt")] = [["lft", "rgt", 1500, 200], ["lft", "rgt", 100, 300]]
    name, orient = p3.orient_left_edge_case(left, right, pairs, L)
    # p = 1/(resRight(left)=1 + resLeft(right)=1); m = 1/(resLeft(left)=1+1) -> tie -> "+"
    assert (name, orient) == ("lft", "+")
    # now both pairs from left half -> m wins
    pairs[("lft", "rgt")] = [["lft", "rgt", 100, 200], ["lft", "rgt", 200, 300]]
    name, orient = p3.orient_left_edge_case(left, right, pairs, L)
    assert (name, orient) == ("lft", "-")


def test_part3_pipeline_smoke(tmp_path):
    g = fixtures.make_genome(
        chrom_scaffold_bins=((6, 1, 5), (1, 4)),
        seed=17,
        flip_strands=False,
    )
    paths = fixtures.write_hicpro_files(g, str(tmp_path / "d"))
    order_file = tmp_path / "order.txt"
    orders = [g.true_order(c) for c in sorted(g.true_groups())]
    filebus.write_scaffold_orderings(orders, str(order_file))
    final = tmp_path / "final.txt"
    p3.run_pipeline(
        str(order_file), paths["sizes"], paths["restriction"], paths["validpairs"],
        str(final), length_cutoff=500_000, resolution=g.resolution,
    )
    out = filebus.read_chromosome_ordering(str(final))
    # order preserved; every scaffold present with a +/- orientation
    for group, truth in zip(out, orders):
        assert [row[0] for row in group] == [t[0] for t in truth]
        assert all(row[1] in "+-" for row in group)
    # multi-bin scaffolds keep their part2 orientation
    for group, truth in zip(out, orders):
        for (name, orient), (tname, torient) in zip(group, truth):
            if g.scaffold(name).n_bins > 1:
                assert orient == torient