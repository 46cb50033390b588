"""Working-example-scale golden parity (VERDICT r1 item 4).

The reference's shipped proof point is the A. marmorata config at
~3,200 bins (hicAssembler_config_workingExample.txt:32-41); the small
parity fixtures never make the cut-noise filter's convergence loops or
the Louvain tail do real work.  This module runs the byte-equality
chain against the actual reference at that scale:

* ~3,000 bins, 25 planted chromosomes, enough noise that
  filter_noisy_breakpoints genuinely removes aggressive cuts (asserted);
* modularity > 0, so the reference's Louvain tail resolver
  (scaffoldToChromosomes.py:263-349) actually runs.  python-louvain is
  not installed, so a deterministic ``community`` shim backed by this
  framework's dense Louvain is injected into the reference — the shim
  is stateful (call i uses seed+i) to mirror modularity_rounds' seeded
  restarts, isolating the reference's graph-build / group-ordering /
  cut-bookkeeping logic for comparison;
* SURVEY §4(c) membership-set comparison on top of byte equality.

This is the one deliberately multi-second-scale case in the suite (the
reference side's pure-Python O(N^2) loops dominate the runtime).
"""

import contextlib
import io
import os
import sys
import types

import numpy as np
import pytest

from hic_genome_assembler_tpu.cluster import louvain as our_louvain
from hic_genome_assembler_tpu.io import filebus
from hic_genome_assembler_tpu.models import part1_cluster
from hic_genome_assembler_tpu.utils import fixtures

REFERENCE_DIR = "/root/reference/HIC_ASSEMBLER"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not mounted"
)

P = dict(min_size=5, modularity=0.05, louvain_rounds=2, psig=0.05,
         convergence_rounds=5, look_ahead=0.2)


class _CommunityShim:
    """python-louvain stand-in over networkx graphs, backed by the
    framework's dense Louvain.  Node order = graph insertion order =
    the reference's tail row order, so shim communities index exactly
    like the dense-path communities."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.calls = 0

    @staticmethod
    def _dense(graph):
        nodes = list(graph.nodes())
        idx = {n: i for i, n in enumerate(nodes)}
        m = np.zeros((len(nodes), len(nodes)))
        for a, b, d in graph.edges(data=True):
            w = d.get("weight", 1.0)
            m[idx[a], idx[b]] = w
            m[idx[b], idx[a]] = w
        return nodes, m

    def best_partition(self, graph, randomize=True):
        nodes, m = self._dense(graph)
        part = our_louvain.best_partition(m, seed=self.seed + self.calls)
        self.calls += 1
        return {n: part[i] for i, n in enumerate(nodes)}

    def modularity(self, partition, graph):
        nodes, m = self._dense(graph)
        labels = np.asarray([partition[n] for n in nodes])
        return our_louvain.modularity(labels, m)


@pytest.fixture(scope="module")
def scale_run(tmp_path_factory):
    """Run reference and framework part 1 side by side at ~3,000 bins;
    yields (theirs_dir, ours_dir, captured our-side stdout)."""
    import importlib.util

    def _stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REFERENCE_DIR, name + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    rng = np.random.default_rng(42)
    layout = []
    for _ in range(25):
        k = int(rng.integers(4, 8))
        sizes = np.maximum((rng.pareto(2.0, k) * 15 + 7).astype(int), 3)
        layout.append(tuple(int(s) for s in sizes))
    genome = fixtures.make_genome(
        chrom_scaffold_bins=tuple(layout), seed=42,
        noise=0.02, cross_noise_frac=0.004,
    )
    assert genome.n_bins >= 2500, genome.n_bins

    root = tmp_path_factory.mktemp("scaleparity")
    paths = fixtures.write_hicpro_files(genome, str(root / "hicpro"))
    theirs, ours = root / "theirs", root / "ours"
    theirs.mkdir(), ours.mkdir()

    saved = {k: sys.modules.get(k)
             for k in ("numba", "hmmlearn", "community", "plotContactMaps")}
    shim = _CommunityShim()
    _stub("numba", jit=lambda *a, **k: (a[0] if a and callable(a[0])
                                        else (lambda fn: fn)))
    _stub("hmmlearn", hmm=types.SimpleNamespace(GaussianHMM=None))
    _stub("community", best_partition=shim.best_partition,
          modularity=shim.modularity)
    _stub("plotContactMaps", plotContactMap=lambda *a, **k: None)
    try:
        ref1 = _load("scaffoldToChromosomes")
        ref1.runPipeline(
            paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
            str(theirs / "dendro.txt"), "/dev/null", "/dev/null",
            str(theirs / "bingroups.txt"), str(theirs / "assessment.txt"),
            str(theirs / "chromgroups.txt"),
            True, False, P["min_size"], P["modularity"], P["louvain_rounds"],
            P["psig"], P["convergence_rounds"], P["look_ahead"],
            genome.resolution,
        )
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        sys.modules.pop("scaffoldToChromosomes", None)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        part1_cluster.run_pipeline(
            paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
            str(ours / "dendro.txt"), "", "",
            str(ours / "bingroups.txt"), str(ours / "assessment.txt"),
            str(ours / "chromgroups.txt"),
            hyper_geom=True, hmm=False, min_size=P["min_size"],
            modularity=P["modularity"], louvain_rounds=P["louvain_rounds"],
            psig=P["psig"], convergence_rounds=P["convergence_rounds"],
            look_ahead=P["look_ahead"], resolution=genome.resolution,
        )
    return theirs, ours, buf.getvalue()


def test_scale_part1_files_byte_equal(scale_run):
    theirs, ours, _out = scale_run
    for name in ("dendro.txt", "bingroups.txt", "assessment.txt",
                 "chromgroups.txt"):
        a = (theirs / name).read_bytes()
        b = (ours / name).read_bytes()
        assert a == b, f"scale parity: {name} differs"


def test_scale_membership_sets_equal(scale_run):
    """SURVEY §4(c): compare group MEMBERSHIP SETS (robust to discovery
    order) under the deterministic size-descending rename."""
    theirs, ours, _out = scale_run
    def sets(path):
        groups = filebus.read_chroms_from_file(str(path / "chromgroups.txt"))
        return sorted(frozenset(name for _b, name in grp) for grp in groups)
    assert sets(theirs) == sets(ours)


def test_scale_noise_filter_iterated(scale_run):
    """The fixture must actually exercise the cut-noise filter: the
    aggressive pass finds MORE cuts than survive filtering."""
    _theirs, _ours, out = scale_run
    orig = next(l for l in out.splitlines() if l.startswith("- Original cut indices"))
    filt = next(l for l in out.splitlines() if l.startswith("- Filtered cut indices"))
    n_orig = len(eval(orig.split("indices ")[1]))
    n_filt = len(eval(filt.split("indices ")[1]))
    assert n_orig > n_filt, (n_orig, n_filt)


def test_scale_louvain_tail_resolved_groups(scale_run):
    """The modularity tail must resolve at least one group (the Louvain
    path is real work at this scale, not a no-op)."""
    _theirs, _ours, out = scale_run
    line = next(l for l in out.splitlines()
                if "via modularity maximization" in l)
    assert int(line.rsplit("=", 1)[1]) >= 1, line
