"""Golden parity vs the ACTUAL reference implementation.

The north-star target (BASELINE.md / SURVEY.md §6) is "identical
chromosome groups + byte-equal assembled FASTA" vs the reference.  These
tests load the reference modules straight from /root/reference (read
only) and run them side by side with this framework on the same
synthetic HiC-Pro fixture, comparing every file on the file bus
byte-for-byte, part by part:

  part1: dendrogram order, bin groups, assessment, chromosome groups
  part2: scaffold order/orientation file, binID plot-order file
  part3: final orientation file
  part4: assembled FASTA bytes

Reference deps not present in this image are shimmed with inert stand-ins:
  numba      -> pass-through @jit (the kernel runs as pure Python f64,
                which is the exact arithmetic the reference computes)
  plotContactMaps -> no-op plotting (xarray isn't installed; plots are
                not part of the parity surface)
  hmmlearn / community -> import-time placeholders; the fixture run uses
                the hyperGeom branch with modularity=0, so neither is
                ever called (scaffoldToChromosomes.py:1138,1150-1152 are
                not reached), and the stubs raise if they ever are.

The fixture uses modularity=0 so the reference's UNSEEDED Louvain
(scaffoldToChromosomes.py:253, nondeterministic run-to-run — SURVEY.md
§4) never runs and byte equality is well-defined.
"""

import importlib.util
import os
import sys
import types

import pytest

from hic_genome_assembler_tpu.models import (
    part1_cluster,
    part2_order,
    part3_orient,
    part4_fasta,
)
from hic_genome_assembler_tpu.utils import fixtures

REFERENCE_DIR = "/root/reference/HIC_ASSEMBLER"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not mounted"
)


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


def _never(*_a, **_k):
    raise AssertionError("stubbed reference dependency was called")


def _load_ref(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_DIR, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref():
    """Reference modules, imported with inert shims for absent deps."""
    saved = {
        k: sys.modules.get(k)
        for k in ("numba", "hmmlearn", "community", "plotContactMaps")
    }

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    _stub_module("numba", jit=jit)
    _stub_module("hmmlearn", hmm=types.SimpleNamespace(GaussianHMM=_never))
    _stub_module("community", best_partition=_never)
    _stub_module("plotContactMaps", plotContactMap=lambda *a, **k: None)

    mods = types.SimpleNamespace(
        part1=_load_ref("scaffoldToChromosomes"),
        part2=_load_ref("orderGenome"),
        part3=_load_ref("orientSmallScaffolds"),
        part4=_load_ref("writeAssembledFasta"),
    )
    yield mods
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    for k in ("scaffoldToChromosomes", "orderGenome", "orientSmallScaffolds",
              "writeAssembledFasta"):
        sys.modules.pop(k, None)


@pytest.fixture(scope="session")
def parity_dirs(tmp_path_factory):
    g = fixtures.make_genome(
        chrom_scaffold_bins=((14, 12, 10, 8, 6), (12, 11, 9, 8), (10, 9, 8, 6)),
        seed=13,
        noise=0.005,
        cross_noise_frac=0.001,
    )
    root = tmp_path_factory.mktemp("refparity")
    paths = fixtures.write_hicpro_files(g, str(root / "hicpro"))
    (root / "theirs").mkdir()
    (root / "ours").mkdir()
    return g, root, paths


def _same_bytes(a, b, label):
    wa, wb = open(a, "rb").read(), open(b, "rb").read()
    assert wa == wb, f"{label}: reference and framework outputs differ"


P1 = dict(minSize=5, modularity=0, louvainRounds=3, psig=0.05,
          convergenceRounds=5, lookAhead=0.2)


@pytest.fixture(scope="session")
def part1_outputs(ref, parity_dirs):
    g, root, paths = parity_dirs
    theirs, ours = root / "theirs", root / "ours"
    ref.part1.runPipeline(
        paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
        str(theirs / "dendro.txt"), "/dev/null", "/dev/null",
        str(theirs / "bingroups.txt"), str(theirs / "assessment.txt"),
        str(theirs / "chromgroups.txt"),
        True, False, P1["minSize"], P1["modularity"], P1["louvainRounds"],
        P1["psig"], P1["convergenceRounds"], P1["lookAhead"], g.resolution,
    )
    part1_cluster.run_pipeline(
        paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
        str(ours / "dendro.txt"), "", "",
        str(ours / "bingroups.txt"), str(ours / "assessment.txt"),
        str(ours / "chromgroups.txt"),
        hyper_geom=True, hmm=False, min_size=P1["minSize"],
        modularity=P1["modularity"], louvain_rounds=P1["louvainRounds"],
        psig=P1["psig"], convergence_rounds=P1["convergenceRounds"],
        look_ahead=P1["lookAhead"], resolution=g.resolution,
    )
    return theirs, ours


def test_part1_files_byte_equal(part1_outputs):
    theirs, ours = part1_outputs
    for name in ("dendro.txt", "bingroups.txt", "assessment.txt",
                 "chromgroups.txt"):
        _same_bytes(theirs / name, ours / name, f"part1 {name}")


@pytest.fixture(scope="session")
def part2_outputs(ref, parity_dirs, part1_outputs):
    """Both part2 runs consume the REFERENCE part1 grouping, isolating
    part2 decision parity from part1."""
    g, root, paths = parity_dirs
    theirs, ours = part1_outputs
    groups = str(theirs / "chromgroups.txt")
    ref.part2.runPipeline(
        paths["bed"], paths["bias"], paths["matrix"], groups,
        str(theirs / "chromorder.txt"), str(root / "theirs"), "",
        "/dev/null", "parity", str(theirs / "plotorder.txt"),
        6, 4, g.resolution,
    )
    part2_order.run_pipeline(
        paths["bed"], paths["bias"], paths["matrix"], groups,
        str(ours / "chromorder.txt"), "", "", "", "parity",
        str(ours / "plotorder.txt"),
        n_scaffolds=6, scan_scaffolds=4, resolution=g.resolution,
    )
    return theirs, ours


def test_part2_files_byte_equal(part2_outputs):
    theirs, ours = part2_outputs
    for name in ("chromorder.txt", "plotorder.txt"):
        _same_bytes(theirs / name, ours / name, f"part2 {name}")


@pytest.fixture(scope="session")
def part3_outputs(ref, parity_dirs, part2_outputs):
    g, root, paths = parity_dirs
    theirs, ours = part2_outputs
    order = str(theirs / "chromorder.txt")
    ref.part3.runPipeline(
        order, paths["sizes"], paths["restriction"], paths["validpairs"],
        str(theirs / "finalorder.txt"), 20000, g.resolution,
    )
    part3_orient.run_pipeline(
        order, paths["sizes"], paths["restriction"], paths["validpairs"],
        str(ours / "finalorder.txt"), length_cutoff=20000,
        resolution=g.resolution,
    )
    return theirs, ours


def test_part3_files_byte_equal(part3_outputs):
    theirs, ours = part3_outputs
    _same_bytes(theirs / "finalorder.txt", ours / "finalorder.txt",
                "part3 finalorder.txt")


def test_part4_fasta_byte_equal(ref, parity_dirs, part3_outputs):
    g, root, paths = parity_dirs
    theirs, ours = part3_outputs
    order = str(theirs / "finalorder.txt")
    ref.part4.runPipeline(paths["fasta"], order, str(theirs / "assembled.fasta"))
    part4_fasta.run_pipeline(paths["fasta"], order, str(ours / "assembled.fasta"))
    _same_bytes(theirs / "assembled.fasta", ours / "assembled.fasta",
                "part4 assembled.fasta (north-star byte equality)")


class _ShimGaussianHMM:
    """hmmlearn.hmm.GaussianHMM stand-in backed by this framework's
    GaussianHMM2, injected into the REFERENCE so both sides run the
    exact same deterministic EM/Viterbi — isolating the outer-loop /
    boundary logic (scaffoldToChromosomes.py:730-942) for comparison.

    Mirrors the reference's usage exactly: constructed per round with
    init_params="cm", params="cmt"; ``startmat_`` assigned (the typo —
    startprob_ stays uniform); ``transmat_`` assigned pre-fit as the
    initial transition matrix (re-estimated during fit)."""

    def __init__(self, n_components=2, covariance_type="diag",
                 n_iter=1000, init_params="cm", params="cmt"):
        assert n_components == 2 and covariance_type == "diag"
        self._n_iter = n_iter
        self.transmat_ = ((0.9, 0.1), (1e-4, 0.9999))
        self._inner = None

    def fit(self, X):
        import numpy as np

        from hic_genome_assembler_tpu.ops.gaussian_hmm import GaussianHMM2

        self._inner = GaussianHMM2(
            n_iter=self._n_iter, seed=0,
            transmat=np.asarray(self.transmat_, dtype=np.float64),
        ).fit(np.asarray(X, dtype=np.float64))
        self.transmat_ = self._inner.transmat_
        return self

    def predict(self, X):
        import numpy as np

        return self._inner.predict(np.asarray(X, dtype=np.float64))


def test_part1_hmm_branch_files_byte_equal(ref, tmp_path_factory):
    """Golden parity for the HMM cut branch (hmm=True,
    scaffoldToChromosomes.py:1138-1141 + 730-942): both sides run the
    same deterministic Gaussian HMM, so any divergence in the iterative
    boundary search, look-ahead windowing, convergence accounting,
    NA/terminal-cut handling, or file emission shows up as a byte diff."""
    import types as _types

    g = fixtures.make_genome(
        chrom_scaffold_bins=((7, 6, 4, 3), (6, 5, 5), (4, 4, 2, 2)),
        seed=7,
        noise=0.004,
        cross_noise_frac=0.001,
        decay_alpha=0.0,
    )
    root = tmp_path_factory.mktemp("hmmparity")
    paths = fixtures.write_hicpro_files(g, str(root / "hicpro"))
    theirs, ours = root / "theirs", root / "ours"
    theirs.mkdir(), ours.mkdir()

    saved_hmm = ref.part1.hmm
    ref.part1.hmm = _types.SimpleNamespace(GaussianHMM=_ShimGaussianHMM)
    try:
        ref.part1.runPipeline(
            paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
            str(theirs / "dendro.txt"), "/dev/null", "/dev/null",
            str(theirs / "bingroups.txt"), str(theirs / "assessment.txt"),
            str(theirs / "chromgroups.txt"),
            False, True, 11, 0, 3, 0.05, 5, 0.5, g.resolution,
        )
    finally:
        ref.part1.hmm = saved_hmm
    part1_cluster.run_pipeline(
        paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
        str(ours / "dendro.txt"), "", "",
        str(ours / "bingroups.txt"), str(ours / "assessment.txt"),
        str(ours / "chromgroups.txt"),
        hyper_geom=False, hmm=True, min_size=11, modularity=0,
        louvain_rounds=3, psig=0.05, convergence_rounds=5, look_ahead=0.5,
        resolution=g.resolution,
    )
    for name in ("dendro.txt", "bingroups.txt", "assessment.txt",
                 "chromgroups.txt"):
        _same_bytes(theirs / name, ours / name, f"part1-hmm {name}")


def test_full_chain_fasta_byte_equal(ref, parity_dirs, part1_outputs):
    """End-to-end: each side runs ITS OWN parts 1->2->4 chain from raw
    HiC-Pro inputs; the final FASTAs must still match byte-for-byte."""
    g, root, paths = parity_dirs
    theirs, ours = part1_outputs
    ref.part2.runPipeline(
        paths["bed"], paths["bias"], paths["matrix"],
        str(theirs / "chromgroups.txt"),
        str(theirs / "chain_order.txt"), str(root / "theirs"), "",
        "/dev/null", "chain", str(theirs / "chain_plotorder.txt"),
        6, 4, g.resolution,
    )
    part2_order.run_pipeline(
        paths["bed"], paths["bias"], paths["matrix"],
        str(ours / "chromgroups.txt"),
        str(ours / "chain_order.txt"), "", "", "", "chain",
        str(ours / "chain_plotorder.txt"),
        n_scaffolds=6, scan_scaffolds=4, resolution=g.resolution,
    )
    ref.part4.runPipeline(
        paths["fasta"], str(theirs / "chain_order.txt"),
        str(theirs / "chain.fasta"),
    )
    part4_fasta.run_pipeline(
        paths["fasta"], str(ours / "chain_order.txt"),
        str(ours / "chain.fasta"),
    )
    _same_bytes(theirs / "chain.fasta", ours / "chain.fasta",
                "full-chain assembled FASTA")


@pytest.mark.parametrize(
    "tag,noise,cross,min_size,look_ahead,conv_rounds,markers",
    [
        # lookAhead truncation: the 0.15 window cuts far short of n on
        # every round; HMM converges within rounds
        ("truncate", 0.03, 0.01, 9, 0.15, 2, ()),
        # reset recursion: lookAhead=1.0 makes a boundary-free final
        # window cut at exactly n -> the hardcoded reset fires
        # (scaffoldToChromosomes.py:921-942): last-cut warning,
        # convergenceRounds reduction AND the recursion with the
        # minSize=5/modularity=.05/lookAhead=.5 reset parameters
        (
            "reset", 0.08, 0.03, 9, 1.0, 3,
            (
                "Last cut index found",
                "convergenceRounds reduced",
                "Recursing on identifyChromosomeGroupsHMM",
            ),
        ),
    ],
)
def test_part1_hmm_branch_scaled_stress(
    ref, tmp_path_factory, capsys, tag, noise, cross, min_size,
    look_ahead, conv_rounds, markers
):
    """Scaled HMM-branch golden parity (VERDICT r2 weak #7): ~264 bins,
    18 scaffolds, 4 chromosomes, parameters chosen to force the paths
    the tiny fixture could not reach — lookAhead truncation,
    convergence exhaustion and the hardcoded-reset recursion
    (scaffoldToChromosomes.py:921-942).  Byte equality of the full
    part-1 file bus, with stdout markers asserted so the stress paths
    cannot silently go untested."""
    import types as _types

    g = fixtures.make_genome(
        chrom_scaffold_bins=(
            (24, 20, 16, 12, 10),
            (22, 18, 14, 10),
            (20, 16, 12, 10, 8),
            (18, 14, 12, 8),
        ),
        seed=23,
        noise=noise,
        cross_noise_frac=cross,
        decay_alpha=0.0,
    )
    root = tmp_path_factory.mktemp(f"hmmstress_{tag}")
    paths = fixtures.write_hicpro_files(g, str(root / "hicpro"))
    theirs, ours = root / "theirs", root / "ours"
    theirs.mkdir(), ours.mkdir()

    saved_hmm = ref.part1.hmm
    ref.part1.hmm = _types.SimpleNamespace(GaussianHMM=_ShimGaussianHMM)
    try:
        ref.part1.runPipeline(
            paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
            str(theirs / "dendro.txt"), "/dev/null", "/dev/null",
            str(theirs / "bingroups.txt"), str(theirs / "assessment.txt"),
            str(theirs / "chromgroups.txt"),
            False, True, min_size, 0, 3, 0.05, conv_rounds, look_ahead,
            g.resolution,
        )
    finally:
        ref.part1.hmm = saved_hmm
    their_out = capsys.readouterr().out
    part1_cluster.run_pipeline(
        paths["bed"], paths["bias"], paths["matrix"], paths["sizes"],
        str(ours / "dendro.txt"), "", "",
        str(ours / "bingroups.txt"), str(ours / "assessment.txt"),
        str(ours / "chromgroups.txt"),
        hyper_geom=False, hmm=True, min_size=min_size, modularity=0,
        louvain_rounds=3, psig=0.05, convergence_rounds=conv_rounds,
        look_ahead=look_ahead, resolution=g.resolution,
    )
    our_out = capsys.readouterr().out
    for name in ("dendro.txt", "bingroups.txt", "assessment.txt",
                 "chromgroups.txt"):
        _same_bytes(theirs / name, ours / name,
                    f"part1-hmm-stress-{tag} {name}")
    # the stress paths must actually fire, on BOTH sides
    for m in markers:
        assert m in their_out, f"reference never hit: {m}"
        assert m in our_out, f"framework never hit: {m}"
