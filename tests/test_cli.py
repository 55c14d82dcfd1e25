"""End-to-end tests of the CLI programs on small inputs.

These drive the same code paths as the reference's bin/ programs:
design (with analysis writers and skip-set-cover), design_naively,
analyze_probe_coverage, and pool.
"""

import gzip
import logging

import numpy as np
import pytest

from catch_tpu.cli import analyze_probe_coverage, design, design_naively
from catch_tpu.cli import pool as pool_cli
from catch_tpu.utils import seq_io


@pytest.fixture(autouse=True)
def _quiet():
    logging.disable(logging.WARNING)
    np.random.seed(1)
    yield
    logging.disable(logging.NOTSET)


@pytest.fixture
def small_fasta(tmp_path):
    rng = np.random.default_rng(0)
    base = "".join(rng.choice(list("ACGT"), size=500))

    def mutate(s, rate):
        out = list(s)
        for i in range(len(out)):
            if rng.random() < rate:
                out[i] = str(rng.choice(list("ACGT")))
        return "".join(out)

    path = tmp_path / "genomes.fasta"
    with open(path, "w") as f:
        for i in range(4):
            f.write(f">g{i}\n{mutate(base, 0.02)}\n")
    return str(path)


class TestDesignCLI:
    def test_basic_design(self, small_fasta, tmp_path, capsys):
        out = tmp_path / "probes.fasta"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60"])
        design.main(args)
        probes = seq_io.read_fasta(str(out))
        assert len(probes) > 0
        assert all(len(s) == 60 for s in probes.values())
        count = int(capsys.readouterr().out.strip())
        assert count == len(probes)

    def test_design_with_analysis_files(self, small_fasta, tmp_path,
                                        capsys):
        out = tmp_path / "probes.fasta"
        tsv = tmp_path / "analysis.tsv"
        windows = tmp_path / "windows.tsv"
        counts = tmp_path / "counts.tsv"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60", "--write-analysis-to-tsv", str(tsv),
            "--write-sliding-window-coverage", str(windows),
            "--write-probe-map-counts-to-tsv", str(counts),
            "--print-analysis"])
        design.main(args)
        assert tsv.exists() and windows.exists() and counts.exists()
        printed = capsys.readouterr().out
        assert "NUMBER OF PROBES" in printed

    def test_design_rc_and_adapters(self, small_fasta, tmp_path):
        out = tmp_path / "probes.fasta"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60", "--add-adapters",
            "--add-reverse-complements"])
        design.main(args)
        probes = seq_io.read_fasta(str(out))
        # Adapters add 40 nt; rc doubles the count
        assert all(len(s) == 100 for s in probes.values())
        assert any("reverse complement" in h for h in probes.keys())

    def test_skip_set_cover_with_filter_from_fasta(self, small_fasta,
                                                   tmp_path, capsys):
        out1 = tmp_path / "probes1.fasta"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out1), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60"])
        design.main(args)
        capsys.readouterr()
        # Re-process the existing design without re-solving
        out2 = tmp_path / "probes2.fasta"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out2), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60", "--filter-from-fasta", str(out1),
            "--skip-set-cover"])
        design.main(args)
        p1 = set(seq_io.read_fasta(str(out1)).values())
        p2 = set(seq_io.read_fasta(str(out2)).values())
        assert p1 == p2

    def test_adapter_args_require_flag(self, small_fasta, tmp_path):
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(tmp_path / "p.fasta"),
            "--adapter-a", "AA", "TT"])
        with pytest.raises(Exception):
            design.main(args)

    def test_conflicting_lsh_flags(self, small_fasta, tmp_path):
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(tmp_path / "p.fasta"),
            "--filter-with-lsh-hamming", "2",
            "--filter-with-lsh-minhash", "0.5"])
        with pytest.raises(Exception):
            design.main(args)

    def test_large_defaults(self):
        args = design.init_and_parse_args("large", ["x.fasta", "-o", "y"])
        assert args.mismatches == 5
        assert args.cover_extension == 50
        assert args.cluster_and_design_separately == 0.15
        assert args.cluster_from_fragments == 50000
        assert args.filter_with_lsh_minhash == 0.6

    def test_basic_defaults(self):
        args = design.init_and_parse_args("basic", ["x.fasta", "-o", "y"])
        assert args.mismatches == 0
        assert args.cover_extension == 0
        assert args.cluster_and_design_separately is None
        assert args.filter_with_lsh_minhash is None

    def test_design_large_end_to_end(self, tmp_path, capsys):
        """The full 'large' tier (clustering + LSH near-dup + set
        cover with the large-input defaults) on a two-family corpus:
        clustering must split the families and the design must cover
        both (reference design_large.py is a thin args_type wrapper)."""
        rng = np.random.default_rng(7)

        def mutate(base, rate):
            out = base.copy()
            m = rng.random(len(out)) < rate
            out[m] = rng.choice(list("ACGT"), size=int(m.sum()))
            return "".join(out)

        path = tmp_path / "two_families.fasta"
        with open(path, "w") as f:
            for fam in range(2):
                base = rng.choice(list("ACGT"), size=700)
                for i in range(5):
                    f.write(f">f{fam}g{i}\n{mutate(base, 0.02)}\n")
        out = tmp_path / "probes.fasta"
        args = design.init_and_parse_args("large", [
            str(path), "-o", str(out), "-pl", "60", "-ps", "30",
            "-m", "2", "-l", "60"])
        design.main(args)
        probes = seq_io.read_fasta(str(out))
        assert len(probes) > 0
        count = int(capsys.readouterr().out.strip())
        assert count == len(probes)

        # the probe set must cover every genome of both families
        from catch_tpu.ops.cover import CoverModel, ProbeSearcher
        from catch_tpu.probe import Probe
        searcher = ProbeSearcher(
            [Probe.from_str(s) for s in probes.values()],
            CoverModel(2, 60))
        genomes = seq_io.read_genomes_from_fasta(str(path))
        for g in genomes:
            for seq in g.seqs:
                covered = np.zeros(len(seq) + 1, dtype=np.int64)
                for spans in searcher.find_probe_covers(seq).values():
                    for (a, b) in spans:
                        covered[max(0, a - 50)] += 1
                        covered[min(len(seq), b + 50)] -= 1
                assert np.all(np.cumsum(covered[:-1]) > 0)

    def test_two_segment_grouped_design(self, tmp_path, capsys):
        """BASELINE config #2 analogue: a segmented species (Lassa
        virus style — S and L segments as separate datasets,
        /root/reference/README.md:163-179) designed at the large-tier
        hybridization defaults m=5 / e=50 with grouping semantics
        intact (no clustering override): each dataset is its own
        grouping with its own set-cover universes, and the merged
        output must cover every genome of both segments under the
        design model."""
        rng = np.random.default_rng(23)

        def mutate(base, rate):
            out = base.copy()
            m = rng.random(len(out)) < rate
            out[m] = rng.choice(list("ACGT"), size=int(m.sum()))
            return "".join(out)

        # Two segments at Lassa-like relative sizes (S ~3.4 kb /
        # L ~7.2 kb, scaled down 4x to keep the CPU test fast), 6
        # genomes each, ~4% within-segment divergence (Lassa is a
        # notably diverse arenavirus)
        seg_paths = []
        for name, length in (("segS", 850), ("segL", 1800)):
            base = rng.choice(list("ACGT"), size=length)
            p = tmp_path / f"{name}.fasta"
            with open(p, "w") as f:
                for i in range(6):
                    f.write(f">{name}_g{i}\n{mutate(base, 0.04)}\n")
            seg_paths.append(str(p))

        out = tmp_path / "probes.fasta"
        args = design.init_and_parse_args("basic", [
            *seg_paths, "-o", str(out), "-pl", "100", "-ps", "50",
            "-m", "5", "-e", "50"])
        design.main(args)
        probes = seq_io.read_fasta(str(out))
        assert len(probes) > 0
        count = int(capsys.readouterr().out.strip())
        assert count == len(probes)

        # Coverage invariant: with e=50 extension, the merged probe
        # set covers every position of every genome in BOTH segment
        # datasets under the m=5 model (coverage=1.0 default).
        from catch_tpu.ops.cover import CoverModel, ProbeSearcher
        from catch_tpu.probe import Probe
        searcher = ProbeSearcher(
            [Probe.from_str(s) for s in probes.values()],
            CoverModel(5, 100))
        for path in seg_paths:
            for g in seq_io.read_genomes_from_fasta(path):
                for seq in g.seqs:
                    covered = np.zeros(len(seq) + 1, dtype=np.int64)
                    for spans in searcher.find_probe_covers(
                            seq).values():
                        for (a, b) in spans:
                            covered[max(0, a - 50)] += 1
                            covered[min(len(seq), b + 50)] -= 1
                    assert np.all(np.cumsum(covered[:-1]) > 0), path

        # Grouping invariant: the two datasets must have been solved
        # as two separate groupings with per-grouping universes (6
        # genomes each), not pooled into one 12-genome instance.
        from catch_tpu.filters.duplicate import DuplicateFilter
        from catch_tpu.filters.set_cover_filter import SetCoverFilter
        from catch_tpu.designer import ProbeDesigner
        groups = [seq_io.read_genomes_from_fasta(p) for p in seg_paths]
        scf = SetCoverFilter(mismatches=5, lcf_thres=100,
                             cover_extension=50)
        d = ProbeDesigner(groups, [DuplicateFilter(), scf],
                          probe_length=100, probe_stride=50)
        d.design()
        stats = scf.last_run_stats
        assert stats["groups_device"] + stats["groups_host"] == 2
        # and the API-level design agrees with the CLI's output
        assert sorted(p.seq_str for p in d.final_probes) == \
            sorted(probes.values())


class TestDesignNaivelyCLI:
    def test_naive(self, small_fasta, capsys):
        args = design_naively.init_and_parse_args([
            small_fasta, "-pl", "60", "-ps", "30",
            "-nrf", "1", "50"])
        design_naively.main(args)
        count = int(capsys.readouterr().out.strip())
        assert count > 0

    def test_dominating_set(self, small_fasta, capsys):
        args = design_naively.init_and_parse_args([
            small_fasta, "-pl", "60", "-ps", "30",
            "-dsf", "1", "50"])
        design_naively.main(args)
        count = int(capsys.readouterr().out.strip())
        assert count > 0


class TestAnalyzeCLI:
    def test_analyze(self, small_fasta, tmp_path, capsys):
        out = tmp_path / "probes.fasta"
        args = design.init_and_parse_args("basic", [
            small_fasta, "-o", str(out), "-pl", "60", "-ps", "30",
            "-m", "1", "-l", "60"])
        design.main(args)
        capsys.readouterr()
        tsv = tmp_path / "analysis.tsv"
        args = analyze_probe_coverage.init_and_parse_args([
            "-d", small_fasta, "-f", str(out), "-m", "1", "-l", "60",
            "--write-analysis-to-tsv", str(tsv), "--print-analysis"])
        analyze_probe_coverage.main(args)
        assert "NUMBER OF PROBES" in capsys.readouterr().out
        lines = tsv.read_text().splitlines()
        # 4 genomes x (fwd + rc) + header
        assert len(lines) == 9


class TestPoolCLI:
    def test_pool_standard(self, tmp_path, capsys):
        import pathlib
        tsv_in = str(pathlib.Path(__file__).parent / "data"
                     / "num-probes.V-WAfr.201506.tsv")
        out = tmp_path / "params.tsv"
        args = pool_cli.init_and_parse_args([
            tsv_in, "90000", str(out), "--round-params", "1", "10"])
        pool_cli.main(args)
        printed = capsys.readouterr().out
        assert "Number of probes:" in printed
        assert "Loss:" in printed
        count = int(printed.split("Number of probes: ")[1].split("\n")[0])
        assert 80000 < count <= 90000
        lines = out.read_text().splitlines()
        assert lines[0] == "dataset\tmismatches\tcover_extension"
