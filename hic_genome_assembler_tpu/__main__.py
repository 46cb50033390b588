from hic_genome_assembler_tpu.cli import main

main()
