"""Tests for Genome, Probe, seq_io."""

from collections import OrderedDict
import gzip
import hashlib
import os
import tempfile

import numpy as np
import pytest

from catch_tpu.genome import Genome
from catch_tpu.probe import Probe
from catch_tpu.utils import seq_io


class TestGenome:
    def test_one_seq(self):
        g = Genome.from_one_seq("ACGTN")
        assert not g.divided_into_chrs()
        assert g.size() == 5
        assert g.size(only_unambig=True) == 4

    def test_chrs(self):
        g = Genome.from_chrs(OrderedDict([("c1", "ACGT"), ("c2", "AANN")]))
        assert g.divided_into_chrs()
        assert g.size() == 8
        assert g.size(only_unambig=True) == 6

    def test_multi_seq_requires_chrs(self):
        with pytest.raises(ValueError):
            Genome(["ACGT", "ACGT"])

    def test_break_into_fragments(self):
        g = Genome.from_one_seq("ABCDEFGHIJK")
        f = g.break_into_fragments(4)
        assert f.seqs == ["ABCD", "EFGH", "IJK"]
        f2 = g.break_into_fragments(4, include_full_end=True)
        assert f2.seqs == ["ABCD", "EFGH", "HIJK"]

    def test_eq_hash(self):
        a = Genome.from_one_seq("ACGT")
        b = Genome.from_one_seq("ACGT")
        assert a == b and hash(a) == hash(b)


class TestProbe:
    def test_basics(self):
        p = Probe.from_str("ACGTN")
        assert p.seq_str == "ACGTN"
        assert len(p) == 5
        assert p[2] == "G"
        assert str(p) == "ACGTN"
        assert Probe.from_str("ACGTN") == p
        assert hash(Probe.from_str("ACGTN")) == hash(p)

    def test_mismatches(self):
        a = Probe.from_str("ACGT")
        b = Probe.from_str("ACTT")
        assert a.mismatches(b) == 1
        assert a.mismatches_at_offset(b, 1) == 2  # CGT vs ACT -> C!=A,T==T? CG T vs ACT
        assert a.min_mismatches_within_shift(b, 1) <= 1

    def test_reverse_complement(self):
        p = Probe.from_str("AACGT")
        assert p.reverse_complement().seq_str == "ACGTT"
        # N maps to itself
        assert Probe.from_str("AN").reverse_complement().seq_str == "NT"

    def test_prepend_append(self):
        p = Probe.from_str("ACGT")
        assert p.with_prepended_str("TT").seq_str == "TTACGT"
        assert p.with_appended_str("GG").seq_str == "ACGTGG"

    def test_construct_kmers(self):
        p = Probe.from_str("ABCDE")
        assert p.construct_kmers(3) == ["ABC", "BCD", "CDE"]
        assert p.construct_kmers(3, include_positions=True) == [
            ("ABC", 0), ("BCD", 1), ("CDE", 2)]

    def test_identifier_matches_sha224(self):
        p = Probe.from_str("ACGTACGTAC")
        want = hashlib.sha224(b"ACGTACGTAC").hexdigest()[-10:]
        assert p.identifier() == want

    def test_shares_some_kmers(self):
        np.random.seed(1)
        a = Probe.from_str("ABCDEFGHIJKLMNO")
        b = Probe.from_str("ZZZDEFGHIJKLZZZ")
        c = Probe.from_str("PQRSTUVWXY12345")
        hits = sum(1 for _ in range(20)
                   if Probe.from_str(a.seq_str).shares_some_kmers(
                       b, k=4, num_kmers_to_test=8))
        assert hits > 10
        assert not a.shares_some_kmers(c, k=4, num_kmers_to_test=8)

    def test_u1_array_input(self):
        arr = np.array(list("ACGT"), dtype="U1")
        assert Probe(arr).seq_str == "ACGT"
        assert np.array_equal(Probe(arr).seq, arr)


class TestSeqIO:
    def _write_and_read(self, content, **kwargs):
        with tempfile.NamedTemporaryFile(
                mode="w", suffix=".fasta", delete=False) as f:
            f.write(content)
            path = f.name
        try:
            return seq_io.read_fasta(path, **kwargs)
        finally:
            os.unlink(path)

    def test_read_fasta_normalization(self):
        content = ">s1\nacgt-Y\nRRGG\n>s2\nTTTT\n"
        m = self._write_and_read(content)
        assert list(m.keys()) == ["s1", "s2"]
        assert m["s1"] == "ACGTNNNGG"
        assert m["s2"] == "TTTT"

    def test_read_fasta_gzip(self):
        with tempfile.NamedTemporaryFile(suffix=".fasta.gz",
                                         delete=False) as f:
            path = f.name
        with gzip.open(path, "wt") as f:
            f.write(">a\nACGT\n")
        try:
            m = seq_io.read_fasta(path)
            assert m["a"] == "ACGT"
        finally:
            os.unlink(path)

    def test_iterate_fasta(self):
        content = ">s1\nACGT\n>s2\nGGYG\n"
        with tempfile.NamedTemporaryFile(
                mode="w", suffix=".fasta", delete=False) as f:
            f.write(content)
            path = f.name
        try:
            seqs = list(seq_io.iterate_fasta(path))
            assert seqs == ["ACGT", "GGNG"]
        finally:
            os.unlink(path)

    def test_read_genomes_from_fasta(self):
        content = ">s1\nACGT\n>s2\nGGGG\n"
        with tempfile.NamedTemporaryFile(
                mode="w", suffix=".fasta", delete=False) as f:
            f.write(content)
            path = f.name
        try:
            genomes = seq_io.read_genomes_from_fasta(path)
            assert [g.seqs for g in genomes] == [["ACGT"], ["GGGG"]]
        finally:
            os.unlink(path)

    def test_write_probe_fasta(self):
        p1 = Probe.from_str("ACGT")
        p2 = Probe.from_str("GGGG")
        p2.header = "custom header"
        with tempfile.NamedTemporaryFile(
                mode="w", suffix=".fasta", delete=False) as f:
            path = f.name
        try:
            seq_io.write_probe_fasta([p1, p2], path)
            with open(path) as f:
                lines = f.read().splitlines()
            assert lines == [
                ">probe_" + p1.identifier(), "ACGT",
                ">custom header", "GGGG"]
        finally:
            os.unlink(path)

    def test_ebola_fixture(self):
        path = os.path.join(os.path.dirname(__file__), "data",
                            "zaire_ebolavirus.fasta.gz")
        m = seq_io.read_fasta(path)
        assert len(m) > 100
        first = next(iter(m.values()))
        assert len(first) > 18000
        assert set(first) <= set("ACGTN")


class TestTimeLimit:
    """catch_tpu.utils.timeout.time_limit
    (parity: /root/reference/catch/utils/timeout.py:16-45)."""

    def test_completes_within_limit(self):
        from catch_tpu.utils.timeout import time_limit
        with time_limit(5):
            x = sum(range(10))
        assert x == 45

    def test_raises_on_timeout(self):
        import time
        import pytest
        from catch_tpu.utils.timeout import (TimeoutException, time_limit)
        with pytest.raises(TimeoutException):
            with time_limit(1):
                time.sleep(3)
