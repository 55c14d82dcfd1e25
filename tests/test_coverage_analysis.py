"""Tests for the coverage Analyzer.

Ported from /root/reference/catch/tests/test_coverage_analysis.py.
"""

from collections import Counter, OrderedDict

from catch_tpu.analysis import Analyzer
from catch_tpu.genome import Genome
from catch_tpu.probe import Probe


class TestAnalyzerWithTwoTargetGenomes:
    @classmethod
    def setup_class(cls):
        genome_a = Genome.from_one_seq("ATCCATCCATNGGGTTTGAAGCG")
        genome_b = Genome.from_chrs(OrderedDict(
            [("chr1", "CCCCCC"), ("chr2", "NTGAAGCG")]))
        probes = [Probe.from_str(p) for p in
                  ["ATCCAT", "TTTGAA", "GAAGCG", "ATGGAT", "AAACCC"]]
        cls.analyzer = Analyzer(
            probes, mismatches=0, lcf_thres=6,
            target_genomes=[[genome_a], [genome_b]],
            target_genomes_names=["g_a", "g_b"], kmer_probe_map_k=3)
        cls.analyzer.run(window_length=6, window_stride=3)

    def test_probe_cover_ranges(self):
        a = self.analyzer
        assert len(a.target_covers) == 2
        assert len(a.target_covers[0]) == 1
        assert len(a.target_covers[1]) == 1
        assert len(a.target_covers[0][0]) == 2
        assert len(a.target_covers[1][0]) == 2
        assert Counter(a.target_covers[0][0][False]) == Counter(
            [(0, 6), (4, 10), (14, 20), (17, 23)])
        assert Counter(a.target_covers[0][0][True]) == Counter(
            [(6, 12), (13, 19), (17, 23)])
        assert Counter(a.target_covers[1][0][False]) == Counter([(8, 14)])
        assert a.target_covers[1][0][True] == []

    def test_bp_covered(self):
        a = self.analyzer
        assert a.bp_covered[0][0][False] == 19
        assert a.bp_covered[0][0][True] == 16
        assert a.bp_covered[1][0][False] == 6
        assert a.bp_covered[1][0][True] == 0

    def test_average_coverage(self):
        a = self.analyzer
        assert a.average_coverage[0][0][False][0] == 24.0 / 23
        assert a.average_coverage[0][0][False][1] == 24.0 / 22
        assert a.average_coverage[0][0][True][0] == 18.0 / 23
        assert a.average_coverage[0][0][True][1] == 18.0 / 22
        assert a.average_coverage[1][0][False][0] == 6.0 / 14
        assert a.average_coverage[1][0][False][1] == 6.0 / 13
        assert a.average_coverage[1][0][True][0] == 0.0
        assert a.average_coverage[1][0][True][1] == 0.0

    def test_sliding_coverage(self):
        a = self.analyzer
        assert a.sliding_coverage[0][0][False] == {
            3: 8 / 6., 6: 8 / 6., 9: 4 / 6., 12: 2 / 6., 15: 5 / 6.,
            18: 9 / 6., 20: 9 / 6.}
        assert a.sliding_coverage[0][0][True] == {
            3: 0, 6: 1 / 2., 9: 1, 12: 5 / 6., 15: 1, 18: 8 / 6.,
            20: 8 / 6.}
        assert a.sliding_coverage[1][0][False] == {
            3: 0, 6: 1 / 6., 9: 4 / 6., 11: 1}
        assert a.sliding_coverage[1][0][True] == {3: 0, 6: 0, 9: 0, 11: 0}

    def test_data_matrix_string(self):
        data = self.analyzer._make_data_matrix_string()
        assert data == [
            ["Genome", "Num bases covered\n[over unambig]",
             "Average coverage/depth\n[over unambig]"],
            ["g_a, genome 0", "19 (82.61%) [86.36%]", "1.04 [1.09]"],
            ["g_a, genome 0 (rc)", "16 (69.57%) [72.73%]", "0.78 [0.82]"],
            ["g_b, genome 0", "6 (42.86%) [46.15%]", "0.43 [0.46]"],
            ["g_b, genome 0 (rc)", "0 (<0.01%) [<0.01%]",
             "<0.01 [<0.01]"]]

    def test_writers(self, tmp_path):
        a = self.analyzer
        a.write_data_matrix_as_tsv(str(tmp_path / "matrix.tsv"))
        a.write_sliding_window_coverage(str(tmp_path / "windows.tsv"))
        a.write_probe_map_counts(str(tmp_path / "counts.tsv"))
        matrix = (tmp_path / "matrix.tsv").read_text().splitlines()
        assert matrix[0].split("\t")[0] == "Genome"
        assert len(matrix) == 5
        counts = (tmp_path / "counts.tsv").read_text().splitlines()
        assert counts[0].split("\t") == [
            "Probe identifier", "Probe sequence",
            "Number sequences mapped to"]


class TestAnalyzerCoversWithCoverExtension:
    @classmethod
    def setup_class(cls):
        genome_a = Genome.from_one_seq("ATCCATCCATNGGGTTTGAAGCG")
        genome_b = Genome.from_chrs(OrderedDict(
            [("chr1", "CCCCCCA"), ("chr2", "ANTGAAGCG")]))
        probes = [Probe.from_str(p) for p in
                  ["ATCCAT", "TTTGAA", "GAAGCG", "ATGGAT", "CCCCCC",
                   "AAACCC"]]
        cls.analyzer = Analyzer(
            probes, mismatches=0, lcf_thres=6,
            target_genomes=[[genome_a], [genome_b]],
            target_genomes_names=["g_a", "g_b"], cover_extension=2,
            kmer_probe_map_k=3)
        cls.analyzer.run(window_length=6, window_stride=3)

    def test_probe_cover_ranges(self):
        a = self.analyzer
        assert Counter(a.target_covers[0][0][False]) == Counter(
            [(0, 8), (2, 12), (12, 22), (15, 23)])
        assert Counter(a.target_covers[0][0][True]) == Counter(
            [(4, 14), (11, 21), (15, 23)])
        assert Counter(a.target_covers[1][0][False]) == Counter(
            [(0, 7), (8, 16)])
        assert a.target_covers[1][0][True] == []

    def test_probe_map_counts(self):
        a = self.analyzer
        for seq, want in [("ATCCAT", 1), ("TTTGAA", 1), ("GAAGCG", 2),
                          ("ATGGAT", 0), ("CCCCCC", 1), ("AAACCC", 0)]:
            assert a.probe_map_counts[Probe.from_str(seq)] == want


class TestAnalyzerCoversWithoutReverseComplement:
    @classmethod
    def setup_class(cls):
        genome_a = Genome.from_one_seq("ATCCATCCATNGGGTTTGAAGCG")
        probes = [Probe.from_str(p)
                  for p in ["ATCCAT", "TTTGAA", "GAAGCG"]]
        cls.analyzer = Analyzer(
            probes, mismatches=0, lcf_thres=6,
            target_genomes=[[genome_a]], target_genomes_names=["g_a"],
            cover_extension=2, kmer_probe_map_k=3, rc_too=False)
        cls.analyzer.run(window_length=6, window_stride=3)

    def test_probe_cover_ranges(self):
        a = self.analyzer
        assert Counter(a.target_covers[0][0][False]) == Counter(
            [(0, 8), (2, 12), (12, 22), (15, 23)])
        assert a.target_covers[0][0][True] is None

    def test_data_matrix_string(self):
        data = self.analyzer._make_data_matrix_string()
        assert data == [
            ["Genome", "Num bases covered\n[over unambig]",
             "Average coverage/depth\n[over unambig]"],
            ["g_a, genome 0", "23 (100.00%) [104.55%]", "1.57 [1.64]"]]


class TestAnalyzerBatchedScanParity:
    """The one-call batched scan must produce the same analysis as
    per-sequence scanning (the flat path dedupes identical spans per
    (probe, strand) exactly as _group_spans does)."""

    def test_batched_matches_per_sequence(self, monkeypatch):
        import numpy as np
        from catch_tpu.ops import cover as cover_mod

        rng = np.random.default_rng(42)
        bases = np.array(list("ACGT"))
        genomes = []
        base = rng.choice(bases, size=3000)
        for _ in range(4):
            seq = base.copy()
            m = rng.random(3000) < 0.02
            seq[m] = rng.choice(bases, size=int(m.sum()))
            genomes.append(Genome.from_one_seq("".join(seq)))
        probes = [Probe.from_str("".join(base[i:i + 75]))
                  for i in range(0, 2900, 150)]

        def run(force_batch):
            orig = cover_mod.ProbeSearcher.find_probe_covers_flat

            def flat(self, sequences, **kw):
                return orig(self, sequences, force_batch=force_batch)

            monkeypatch.setattr(cover_mod.ProbeSearcher,
                                "find_probe_covers_flat", flat)
            a = Analyzer(probes, mismatches=2, lcf_thres=60,
                         target_genomes=[genomes], cover_extension=20)
            a.run()
            monkeypatch.setattr(cover_mod.ProbeSearcher,
                                "find_probe_covers_flat", orig)
            return a

        a1 = run(True)
        a2 = run(False)
        for i, j, gnm, rc in a1._iter_target_genomes():
            assert Counter(a1.target_covers[i][j][rc]) == \
                Counter(a2.target_covers[i][j][rc]), (i, j, rc)
            assert a1.bp_covered[i][j][rc] == a2.bp_covered[i][j][rc]
            assert a1.average_coverage[i][j][rc] == \
                a2.average_coverage[i][j][rc]
        assert a1.probe_map_counts == a2.probe_map_counts
        assert sum(a1.probe_map_counts.values()) > 0
