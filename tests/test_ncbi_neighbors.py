"""Tests for the NCBI neighbors client (network isolated).

Ported from /root/reference/catch/utils/tests/test_ncbi_neighbors.py;
the fetchers are monkeypatched with canned tables (the reference's
real-network integration tests are omitted: this environment has no
egress).
"""

import pytest

from catch_tpu.utils import ncbi_neighbors as nn


class TestURLConstruction:
    def _check(self, url, expected_start, expected_fields):
        start, fields = url.split("?")
        assert start == expected_start
        assert sorted(fields.split("&")) == sorted(expected_fields)

    def test_ncbi_neighbors_url(self):
        self._check(nn.ncbi_neighbors_url(123),
                    "https://www.ncbi.nlm.nih.gov/genomes/GenomesGroup.cgi",
                    ["taxid=123", "cmd=download2"])

    def test_ncbi_fasta_download_url(self):
        self._check(nn.ncbi_fasta_download_url(["A123", "A456", "B789"]),
                    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/"
                    "efetch.fcgi",
                    ["id=A123,A456,B789", "db=nuccore", "rettype=fasta",
                     "retmode=text"])

    def test_api_key_in_urls(self):
        nn.ncbi_api_key = "SECRET"
        try:
            assert "api_key=SECRET" in nn.ncbi_neighbors_url(5)
            assert "api_key=SECRET" in nn.ncbi_fasta_download_url(["A1"])
        finally:
            nn.ncbi_api_key = None

    def test_influenza_url(self):
        assert nn.ncbi_influenza_genomes_url("genomeset").endswith(
            "genomeset.dat.gz")
        with pytest.raises(AssertionError):
            nn.ncbi_influenza_genomes_url("bogus")


NEIGHBORS_TABLE = (
    "## Comment line 1\n"
    "## Comment line 2\n"
    "## Columns:\tRepresentative\tNeighbor\tHost\tSelected lineage\t"
    "Taxonomy name\tSegment name\n"
    "NC_0123\tKY456\tvertebrate,human\tFamilyA,GenusA,SpeciesA\t"
    "SpeciesA\tsegment \n"
    "NC_0456\tAB123\tinvertebrate\tFamilyB,GenusB,SpeciesB\tSpeciesB\t"
    "segment 1\n"
    "NC_0456\tAB456\tinvertebrate\tFamilyB,GenusB,SpeciesB\tSpeciesB\t"
    "segment 2\n")


class TestConstructNeighbors:
    def test_construct_neighbors(self, monkeypatch):
        monkeypatch.setattr(
            nn, "fetch_neighbors_table",
            lambda taxid: NEIGHBORS_TABLE.split("\n"))
        neighbors = nn.construct_neighbors(123)
        expected = [
            nn.Neighbor("KY456", "NC_0123", ["vertebrate", "human"],
                        ("FamilyA", "GenusA", "SpeciesA"), "SpeciesA", ""),
            nn.Neighbor("AB123", "NC_0456", ["invertebrate"],
                        ("FamilyB", "GenusB", "SpeciesB"), "SpeciesB",
                        "1"),
            nn.Neighbor("AB456", "NC_0456", ["invertebrate"],
                        ("FamilyB", "GenusB", "SpeciesB"), "SpeciesB",
                        "2"),
        ]
        assert neighbors == expected

    def test_bad_column_order(self, monkeypatch):
        table = ("## Columns:\tNeighbor\tRepresentative\tHost\t"
                 "Selected lineage\tTaxonomy name\tSegment name\n")
        monkeypatch.setattr(nn, "fetch_neighbors_table",
                            lambda taxid: table.split("\n"))
        with pytest.raises(Exception):
            nn.construct_neighbors(123)


INFLUENZA_TABLE = (
    "AB123\tHuman\t1\tH1N1\tUSA\t2018\t2300\t"
    "Influenza A virus (A/USA/1/2018(H1N1))\t\t10000\n"
    "AB456\tHuman\t2\t\tUSA\t2018\t2200\tInfluenza A virus (A/USA/2018)\n"
    "AB789\tHuman\t3\tH1N1\tUSA\t2018\t2200\t"
    "Influenza A virus (A/USA/2018)\n"
    "CD123\tHuman\t4\tH1N1\tUSA\t\t2300\tInfluenza A virus (A/USA)\n"
    "CD456\tHuman\t5\tH1N1\tUSA\t3000\t2200\t"
    "Influenza A virus (A/USA/3000)\n"
    "CD789\tHuman\t6\tH3N2\tChina\t2015\t2200\t"
    "Influenza A virus (A/China/2015)\n")


class TestConstructInfluenzaGenomeNeighbors:
    def test_construct(self, monkeypatch):
        monkeypatch.setattr(
            nn, "fetch_influenza_genomes_table",
            lambda species, db: INFLUENZA_TABLE.split("\n"))
        lineage = ("Orthomyxoviridae", "Alphainfluenzavirus",
                   "Influenza A virus")
        expected = [
            nn.Neighbor("AB123", None, ["Human"], lineage,
                        "Influenza A virus (A/USA/1/2018(H1N1))", "1",
                        {"subtype": "H1N1", "country": "USA",
                         "year": 2018, "seq_len": 2300}),
            nn.Neighbor("AB456", None, ["Human"], lineage,
                        "Influenza A virus (A/USA/2018)", "2",
                        {"subtype": "", "country": "USA", "year": 2018,
                         "seq_len": 2200}),
            nn.Neighbor("AB789", None, ["Human"], lineage,
                        "Influenza A virus (A/USA/2018)", "3",
                        {"subtype": "H1N1", "country": "USA",
                         "year": 2018, "seq_len": 2200}),
            nn.Neighbor("CD789", None, ["Human"], lineage,
                        "Influenza A virus (A/China/2015)", "6",
                        {"subtype": "H3N2", "country": "China",
                         "year": 2015, "seq_len": 2200}),
        ]
        assert nn.construct_influenza_genome_neighbors(11320) == expected

    def test_bad_taxid(self):
        with pytest.raises(ValueError):
            nn.construct_influenza_genome_neighbors(999)


class TestConstructFastaForTaxid:
    def test_facade(self, monkeypatch, tmp_path):
        monkeypatch.setattr(
            nn, "fetch_neighbors_table",
            lambda taxid: NEIGHBORS_TABLE.split("\n"))

        fetched = {}

        def fake_fetch_fastas(accs, **kw):
            import tempfile
            fetched["accs"] = sorted(accs)
            fp = tempfile.NamedTemporaryFile()
            fp.write(b">A\nACGT\n")
            fp.seek(0)
            return fp

        monkeypatch.setattr(nn, "fetch_fastas", fake_fetch_fastas)
        acc_file = tmp_path / "accs.txt"
        tf = nn.construct_fasta_for_taxid("123", write_to=str(acc_file))
        assert fetched["accs"] == ["AB123", "AB456", "KY456"]
        assert acc_file.read_text().splitlines() == ["AB123", "AB456",
                                                     "KY456"]
        tf.close()

    def test_segment_filter(self, monkeypatch):
        monkeypatch.setattr(
            nn, "fetch_neighbors_table",
            lambda taxid: NEIGHBORS_TABLE.split("\n"))
        monkeypatch.setattr(
            nn, "fetch_fastas",
            lambda accs, **kw: sorted(accs))
        out = nn.construct_fasta_for_taxid(123, segment="1")
        assert out == ["AB123"]
        with pytest.raises(Exception):
            nn.construct_fasta_for_taxid(123, segment="9")

    def test_invalid_taxid(self):
        with pytest.raises(ValueError):
            nn.construct_fasta_for_taxid("abc")
