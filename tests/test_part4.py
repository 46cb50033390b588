"""Part 4 byte-format contract (vs writeAssembledFasta.py:76-128)."""

from hic_genome_assembler_tpu.io import fasta
from hic_genome_assembler_tpu.models import part4_fasta


def test_write_new_fasta_bytes(tmp_path):
    old = {
        "s1": "A" * 60,
        "s2": "ACGT",
        "s3": "GGGG",         # "-" in group -> revcomp CCCC
        "passthru": "T" * 55,
    }
    groups = [[["s1", "+"], ["s3", "-"]], [["s2", "+"]]]
    out = tmp_path / "asm.fasta"
    stats = part4_fasta.write_new_fasta(groups, old, str(out))

    text = out.read_text()
    lines = text.splitlines()
    assert lines[0] == ">Chr_1"
    # 60 A + 100 N + 4 C = 164 chars -> 50/50/50/14 wrapping
    assert lines[1] == "A" * 50
    assert lines[2] == "A" * 10 + "N" * 40
    assert lines[3] == "N" * 50
    assert lines[4] == "N" * 10 + "CCCC"
    assert lines[5] == ">Chr_2"
    assert lines[6] == "ACGT"
    # ungrouped scaffold passes through under its own name
    assert lines[7] == ">passthru"
    assert lines[8] == "T" * 50
    assert lines[9] == "T" * 5
    assert stats["gaps"] == 1
    assert stats["ungrouped_scaffolds"] == 1
    assert stats["grouped_length"] == 60 + 4 + 4


def test_exact_multiple_no_blank_line(tmp_path):
    old = {"s1": "C" * 100}
    out = tmp_path / "a.fasta"
    part4_fasta.write_new_fasta([[["s1", "+"]]], old, str(out))
    lines = out.read_text().split("\n")
    # '>Chr_1', 50C, 50C, '' (from final newline) and nothing else
    assert lines == [">Chr_1", "C" * 50, "C" * 50, ""]


def test_part4_pipeline_runs(tmp_path, hicpro_dir, genome):
    # build a trivial ordering file covering two scaffolds
    from hic_genome_assembler_tpu.io import filebus

    names = [s.name for s in genome.scaffolds[:2]]
    order_path = tmp_path / "order.txt"
    filebus.write_scaffold_orderings([[(names[0], "+"), (names[1], "-")]], str(order_path))
    out = tmp_path / "assembled.fasta"
    part4_fasta.run_pipeline(hicpro_dir["fasta"], str(order_path), str(out))
    seqs = fasta.read_fasta(str(out))
    assert "Chr_1" in seqs
    original = fasta.read_fasta(hicpro_dir["fasta"])
    expected = original[names[0]] + "N" * 100 + fasta.reverse_complement(original[names[1]])
    assert seqs["Chr_1"] == expected
    # all other scaffolds pass through
    for s in genome.scaffolds[2:]:
        assert seqs[s.name] == original[s.name]
