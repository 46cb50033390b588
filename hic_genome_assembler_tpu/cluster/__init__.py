"""Part 1 algorithm layer: UPGMA, breakpoint detection, Louvain, HMM."""
