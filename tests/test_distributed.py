"""Chromosome-level task sharding (EP): a 2-process sharded part-2 run
merged over the file bus must equal the single-process run."""

import os

import numpy as np

from hic_genome_assembler_tpu.io import hicpro
from hic_genome_assembler_tpu.models import part2_order
from hic_genome_assembler_tpu.parallel import distributed
from hic_genome_assembler_tpu.utils import fixtures


def _setup():
    g = fixtures.make_genome(
        chrom_scaffold_bins=((9, 7, 5, 3), (8, 6, 4), (7, 5, 4, 2)),
        seed=41,
        noise=0.004,
        cross_noise_frac=0.0,
    )
    bins = [
        hicpro.Bin(bid, s.name, 0, 0, 1.0, 0.0)
        for s in g.scaffolds
        for bid in s.bin_ids
    ]
    chrom_list = []
    for c in sorted(g.true_groups()):
        group = []
        for name in g.true_groups()[c]:
            s = g.scaffold(name)
            group.extend([bid, name] for bid in s.bin_ids)
        chrom_list.append(group)
    return g, bins, chrom_list


def test_shard_assignment_round_robin():
    assert distributed.shard_chromosomes(5, 0, 2) == [0, 2, 4]
    assert distributed.shard_chromosomes(5, 1, 2) == [1, 3]
    assert distributed.shard_chromosomes(3, 0, 1) == [0, 1, 2]


def test_sharded_ordering_merges_to_single_process_result(tmp_path):
    g, bins, chrom_list = _setup()

    full = part2_order.order_genome(
        g.matrix, chrom_list, bins, g.resolution,
        n_scaffolds=3, scan_scaffolds=3, plot_chrom=False,
    )
    want = [[(s.name, s.orientation) for s in group] for group in full]

    shard_files = []
    for proc in range(2):
        mine = distributed.shard_chromosomes(len(chrom_list), proc, 2)
        part = part2_order.order_genome(
            g.matrix, chrom_list, bins, g.resolution,
            n_scaffolds=3, scan_scaffolds=3, plot_chrom=False,
            chrom_indices=mine,
        )
        shard = {
            i + 1: [(s.name, s.orientation) for s in group]
            for i, group in enumerate(part)
            if group is not None
        }
        assert sorted(shard) == [i + 1 for i in mine]
        path = str(tmp_path / f"order.shard{proc}")
        distributed.write_shard_orderings(shard, path)
        shard_files.append(path)

    out = str(tmp_path / "order.txt")
    distributed.merge_shard_orderings(shard_files, len(chrom_list), out)

    from hic_genome_assembler_tpu.io import filebus

    got = [
        [(name, orient) for name, orient in chrom]
        for chrom in filebus.read_chromosome_ordering(out)
    ]
    assert got == want
