"""Part 2 search recovers planted orderings on synthetic fixtures."""

import numpy as np
import pytest

from hic_genome_assembler_tpu.io import filebus, hicpro
from hic_genome_assembler_tpu.models import part2_order
from hic_genome_assembler_tpu.utils import fixtures


def _truth_bins(genome):
    bins = [
        hicpro.Bin(bid, s.name, 0, 0, 1.0, 0.0)
        for s in genome.scaffolds
        for bid in s.bin_ids
    ]
    return bins


def _chrom_groups_from_truth(genome):
    groups = []
    for c, names in sorted(genome.true_groups().items()):
        group = []
        for name in names:
            s = genome.scaffold(name)
            group.extend([bid, name] for bid in s.bin_ids)
        groups.append(group)
    return groups


def _matches_truth(recovered, truth):
    """Recovered (name, orient) list equals truth or its strand-flipped
    reverse (the cost is invariant under whole-chromosome reversal)."""
    rec = [(s.name, s.orientation) for s in recovered]
    fwd = list(truth)
    rev = [(n, "-" if o == "+" else "+") for n, o in reversed(truth)]

    def ok(cand, target):
        if [c[0] for c in cand] != [t[0] for t in target]:
            return False
        for (cn, co), (tn, to) in zip(cand, target):
            # single-bin scaffolds carry no orientation signal in part2
            if len(next(s for s in recovered if s.name == cn).bins_asc) > 1:
                if co != to:
                    return False
        return True

    return ok(rec, fwd) or ok(rec, rev)


@pytest.fixture(scope="module")
def ordered_genome():
    return fixtures.make_genome(
        chrom_scaffold_bins=((10, 7, 5, 3, 2), (8, 6, 4)),
        seed=5,
        noise=0.002,
        cross_noise_frac=0.0,
    )


def test_order_chromosome_recovers_truth(ordered_genome):
    g = ordered_genome
    ctx = part2_order._ChromosomeContext(g.matrix, _truth_bins(g))
    groups = _chrom_groups_from_truth(g)
    for c, group in enumerate(groups):
        recovered = part2_order.order_chromosome(group, ctx, n_scaffolds=3, scan_scaffolds=3)
        assert _matches_truth(recovered, g.true_order(c)), (
            [(s.name, s.orientation) for s in recovered],
            g.true_order(c),
        )


def test_order_chromosome_bruteforce_only(ordered_genome):
    """All scaffolds within nScaffolds -> pure brute force path."""
    g = ordered_genome
    ctx = part2_order._ChromosomeContext(g.matrix, _truth_bins(g))
    group = _chrom_groups_from_truth(g)[1]  # 3 scaffolds
    recovered = part2_order.order_chromosome(group, ctx, n_scaffolds=6, scan_scaffolds=5)
    assert _matches_truth(recovered, g.true_order(1))


def test_degenerate_chromosome_warns_not_crashes():
    g = fixtures.make_genome(
        chrom_scaffold_bins=((2, 2),),
        seed=9,
        noise=0.0,
        cross_noise_frac=0.0,
    )
    m = np.zeros_like(g.matrix)  # zero contacts everywhere
    ctx = part2_order._ChromosomeContext(m, _truth_bins(g))
    group = _chrom_groups_from_truth(g)[0]
    recovered = part2_order.order_chromosome(group, ctx, n_scaffolds=6, scan_scaffolds=5)
    assert len(recovered) == 2  # arbitrary but complete ordering


def test_part2_pipeline_end_to_end(tmp_path, ordered_genome):
    g = ordered_genome
    paths = fixtures.write_hicpro_files(g, str(tmp_path / "hicpro"))
    sizes = {s.name: s.size_bp for s in g.scaffolds}
    group_file = tmp_path / "chromgroups.txt"
    chrom_groups = [
        [(bid, name) for bid, name in grp] for grp in _chrom_groups_from_truth(g)
    ]
    filebus.write_chromosome_groupings(chrom_groups, sizes, str(group_file))

    plots = tmp_path / "plots"
    plots.mkdir()
    order_file = tmp_path / "order.txt"
    part2_order.run_pipeline(
        paths["bed"],
        paths["bias"],
        paths["matrix"],
        str(group_file),
        str(order_file),
        str(plots),
        " test",
        str(tmp_path / "full.png"),
        "full genome",
        str(tmp_path / "plotorder.txt"),
        n_scaffolds=4,
        scan_scaffolds=3,
        resolution=g.resolution,
    )
    ordering = filebus.read_chromosome_ordering(str(order_file))
    # group file is size-sorted: chromosome 0 (27 bins) is Chr_1
    by_size = sorted(
        sorted(g.true_groups()),
        key=lambda c: sum(g.scaffold(n).size_bp for n in g.true_groups()[c]),
        reverse=True,
    )
    for chr_idx, c in enumerate(by_size):
        truth = g.true_order(c)
        rec_names = [row[0] for row in ordering[chr_idx]]
        fwd = [t[0] for t in truth]
        assert rec_names in (fwd, fwd[::-1])
    assert (plots / "Chr_1.png").exists()
    assert (tmp_path / "full.png").exists()
    # binID ordering file header
    assert (tmp_path / "plotorder.txt").read_text().startswith("#ScaffoldID\tHiCPro-BinID")


def test_scheduler_window_invariance(ordered_genome, monkeypatch):
    """The interleaved scheduler with the global cross-chromosome drain
    must produce IDENTICAL orderings for any live-window size: window=1
    is the fully serial schedule, the default overlaps up to 6
    chromosomes — decisions may never depend on the schedule (each
    coroutine only ever sees its own readbacks, in its own order)."""
    genome = ordered_genome
    bins = _truth_bins(genome)
    groups = _chrom_groups_from_truth(genome)

    def run(window):
        monkeypatch.setenv("HIC_INTERLEAVE_WINDOW", str(window))
        out = part2_order.order_genome(
            genome.matrix, groups, bins, genome.resolution,
            n_scaffolds=4, scan_scaffolds=3, plot_chrom=False,
        )
        return [[(s.name, s.orientation) for s in g] for g in out]

    serial = run(1)
    assert run(6) == serial
    assert run(64) == serial
