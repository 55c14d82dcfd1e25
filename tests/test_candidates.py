"""Tests for candidate probe generation.

Ported expectations from
/root/reference/catch/filter/tests/test_candidate_probes.py.
"""

from collections import Counter
import pathlib

import pytest

from catch_tpu.filters import candidates as candidate_probes
from catch_tpu.utils import seq_io

EBOLA = str(pathlib.Path(__file__).parent / "data"
            / "zaire_ebolavirus.fasta.gz")


def _seqs(probes):
    return [p.seq_str for p in probes]


class TestContrivedInput:
    def test_no_n(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATCGTCGCGGATCG", probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(
            ["ATCGTC", "GTCGCG", "GCGGAT", "GGATCG"])

    def test_one_n(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATCGNCGCGGATCG", probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(
            ["ATCGNC", "GNCGCG", "GCGGAT", "GGATCG"])

    def test_two_n(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATNGNCGCGGATCG", probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(
            ["ATNGNC", "GNCGCG", "GCGGAT", "GGATCG"])

    def test_n_string1(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATCGNCGNNTCG", probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(["ATCGNC", "TCGNCG"])

    def test_n_string2(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATCGNCGNNTCGATAT", probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(
            ["ATCGNC", "TCGNCG", "TCGATA", "TCGATA", "CGATAT"])

    def test_flanking_flag(self):
        p = candidate_probes.make_candidate_probes_from_sequence(
            "ATCGNCGNNTCGATAT", probe_length=6, probe_stride=3)
        flank = [x.seq_str for x in p if x.is_flanking_n_string]
        assert "TCGNCG" in flank or "TCGATA" in flank

    def test_multiple_seqs(self):
        p = candidate_probes.make_candidate_probes_from_sequences(
            ["ATCGNCGNNTCG", "ATCGNCGNNTCGATAT"],
            probe_length=6, probe_stride=3)
        assert Counter(_seqs(p)) == Counter(
            ["ATCGNC", "TCGNCG"]
            + ["ATCGNC", "TCGNCG", "TCGATA", "TCGATA", "CGATAT"])

    def test_small_seqs(self):
        with pytest.raises(ValueError):
            candidate_probes.make_candidate_probes_from_sequences(
                ["ATCGATCGATCG", "CCGG"], probe_length=6, probe_stride=3)
        with pytest.raises(ValueError):
            candidate_probes.make_candidate_probes_from_sequences(
                ["ATCGATCGATCG", "CCGG"], probe_length=6, probe_stride=3,
                allow_small_seqs=5)
        with pytest.raises(Exception):
            candidate_probes.make_candidate_probes_from_sequences(
                ["ATCGATCGATCG", "CNNN"], probe_length=6, probe_stride=3,
                allow_small_seqs=4)
        p = candidate_probes.make_candidate_probes_from_sequences(
            ["ATCGATCGATCG", "CCGG"], probe_length=6, probe_stride=3,
            allow_small_seqs=4)
        assert Counter(_seqs(p)) == Counter(
            ["ATCGAT", "GATCGA", "CGATCG", "CCGG"])
        p = candidate_probes.make_candidate_probes_from_sequences(
            ["ATCGATCGATCG", "CCGG"], probe_length=6, probe_stride=3,
            seq_length_to_skip=4)
        assert Counter(_seqs(p)) == Counter(["ATCGAT", "GATCGA", "CGATCG"])

    def test_type_errors(self):
        with pytest.raises(TypeError):
            candidate_probes.make_candidate_probes_from_sequences(
                "ACGTACGT", probe_length=6, probe_stride=3)
        with pytest.raises(ValueError):
            candidate_probes.make_candidate_probes_from_sequences(
                [], probe_length=6, probe_stride=3)
        with pytest.raises(TypeError):
            candidate_probes.make_candidate_probes_from_sequences(
                [b"ACGTACGT"], probe_length=6, probe_stride=3)


class TestEbolaZaire:
    """Statistics over the first 100 Ebola genomes (reference
    test_candidate_probes.py:133-183)."""

    @pytest.fixture(scope="class")
    def probes(self):
        seqs = list(seq_io.read_fasta(EBOLA).values())[:100]
        p100 = candidate_probes.make_candidate_probes_from_sequences(
            seqs, probe_length=100, probe_stride=50)
        p75 = candidate_probes.make_candidate_probes_from_sequences(
            seqs, probe_length=75, probe_stride=25)
        return p100, p75

    def test_probe_length(self, probes):
        p100, p75 = probes
        assert all(len(p) == 100 for p in p100)
        assert all(len(p) == 75 for p in p75)

    def test_probe_count(self, probes):
        p100, p75 = probes
        ratio = float(len(p75)) / len(p100)
        assert 1.95 < ratio < 2.05

    def test_n_string(self, probes):
        p100, p75 = probes
        assert all("NN" not in p.seq_str for p in p100)
        assert all("NN" not in p.seq_str for p in p75)
