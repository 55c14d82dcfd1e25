"""Tests for the simple filters, the adapter filter, and the designer.

Expectations ported from the reference's filter tests
(/root/reference/catch/filter/tests/).
"""

from collections import Counter
import os
import tempfile

import pytest

from catch_tpu.designer import ProbeDesigner
from catch_tpu.filters import candidates as cp
from catch_tpu.filters.adapter import AdapterFilter
from catch_tpu.filters.dominating_set import DominatingSetFilter
from catch_tpu.filters.duplicate import DuplicateFilter
from catch_tpu.filters.fasta import FastaFilter
from catch_tpu.filters.n_expansion import NExpansionFilter
from catch_tpu.filters.naive_redundant import (
    NaiveRedundantFilter, redundant_shift_and_mismatch_count,
    redundant_longest_common_substring)
from catch_tpu.filters.near_duplicate import (
    NearDuplicateFilterWithHammingDistance, NearDuplicateFilterWithMinHash)
from catch_tpu.filters.polya import PolyAFilter
from catch_tpu.filters.reverse_complement import ReverseComplementFilter
from catch_tpu.filters.set_cover_filter import SetCoverFilter
from catch_tpu.genome import Genome
from catch_tpu.probe import Probe


def P(*seqs):
    return [Probe.from_str(s) for s in seqs]


class TestDuplicateFilter:
    def test_dedup_preserves_order(self):
        probes = P("ABC", "DEF", "ABC", "GHI", "DEF")
        out = DuplicateFilter()._filter(probes)
        assert [p.seq_str for p in out] == ["ABC", "DEF", "GHI"]


class TestReverseComplementFilter:
    def test_interleaved_and_headers(self):
        probes = P("ATCG")
        out = ReverseComplementFilter()._filter(probes)
        assert [p.seq_str for p in out] == ["ATCG", "CGAT"]
        assert out[0].header == \
            f"probe_{out[0].identifier()} | from target sequence"
        assert out[1].header == (
            f"probe_{out[1].identifier()} | reverse complement of "
            f"probe_{out[0].identifier()}")

    def test_non_acgt_maps_to_self(self):
        out = ReverseComplementFilter()._filter(P("ANCG"))
        assert out[1].seq_str == "CGNT"


class TestNExpansionFilter:
    def test_no_n(self):
        out = NExpansionFilter()._filter(P("ATCG"))
        assert [p.seq_str for p in out] == ["ATCG"]

    def test_one_n(self):
        out = NExpansionFilter()._filter(P("ANCG"))
        assert [p.seq_str for p in out] == \
            ["AACG", "ATCG", "ACCG", "AGCG"]

    def test_two_n(self):
        out = NExpansionFilter()._filter(P("ANCN"))
        assert len(out) == 16
        assert len(set(p.seq_str for p in out)) == 16
        assert all("N" not in p.seq_str for p in out)

    def test_limit_expansion(self):
        out = NExpansionFilter(limit_n_expansion_randomly=1)._filter(
            P("NNNN"))
        assert len(out) == 4
        assert all("N" not in p.seq_str for p in out)

    def test_no_limit(self):
        out = NExpansionFilter(limit_n_expansion_randomly=None)._filter(
            P("NNNN"))
        assert len(out) == 256


class TestPolyAFilter:
    def test_removes_polya_and_polyt(self):
        probes = P("AAAAAACG", "TTTTTTCG", "ATCGATCG")
        out = PolyAFilter(6, 0)._filter(probes)
        assert [p.seq_str for p in out] == ["ATCGATCG"]

    def test_with_mismatches(self):
        # AAAGAAA contains 7 A's with 1 mismatch
        probes = P("AAAGAAAC", "ACGTACGT")
        out = PolyAFilter(7, 1, min_exact_length_to_consider=3)._filter(
            probes)
        assert [p.seq_str for p in out] == ["ACGTACGT"]

    def test_exact_prescreen_keeps_probe(self):
        # Contains no exact run of 6 A's/T's, so kept even though a
        # 1-mismatch run exists (behavioral contract of the prescreen)
        probes = P("AAAGAAAC")
        out = PolyAFilter(7, 1)._filter(probes)
        assert [p.seq_str for p in out] == ["AAAGAAAC"]

    def test_empty(self):
        assert PolyAFilter(6, 0)._filter([]) == []


class TestFastaFilter:
    def test_reorders_to_file_order(self):
        f = tempfile.NamedTemporaryFile(mode="w", suffix=".fasta",
                                        delete=False)
        f.write(">one\nGGGG\n>two\nAAAA\n>three | reverse complement of x\n"
                "CCCC\n")
        f.close()
        probes = P("AAAA", "CCCC", "GGGG", "TTTT")
        out = FastaFilter(f.name)._filter(probes)
        assert [p.seq_str for p in out] == ["GGGG", "AAAA", "CCCC"]
        out_skip = FastaFilter(
            f.name, skip_reverse_complements=True)._filter(probes)
        assert [p.seq_str for p in out_skip] == ["GGGG", "AAAA"]
        os.unlink(f.name)


class TestNearDuplicateFilter:
    def test_hamming_removes_near_duplicates(self):
        # 'ATCGTCGCGG' repeated 3x (higher multiplicity) and a
        # 1-mismatch variant once; the variant must be removed
        probes = P("ATCGTCGCGG", "ATCGTCGCGG", "ATCGTCGCGG", "ATCGTCGCGT",
                   "TTTTTTTTTT")
        f = NearDuplicateFilterWithHammingDistance(2, 10)
        out = f._filter(probes)
        seqs = [p.seq_str for p in out]
        assert "ATCGTCGCGG" in seqs
        assert "ATCGTCGCGT" not in seqs
        assert "TTTTTTTTTT" in seqs

    def test_minhash_removes_near_duplicates(self):
        base = "ATCGTCGCGGAATTCCGGATCGCGATATTCGAGG"
        variant = base[:20] + "T" + base[21:]
        distinct = "GGGGGGGGCCCCCCCCAAAATTTTGGGGCCCCAA"
        probes = P(base, base, variant, distinct)
        f = NearDuplicateFilterWithMinHash(0.5, kmer_size=5)
        out = f._filter(probes)
        seqs = [p.seq_str for p in out]
        assert base in seqs
        assert variant not in seqs
        assert distinct in seqs

    def test_keeps_all_when_distant(self):
        probes = P("AAAAAAAAAA", "CCCCCCCCCC", "GGGGGGGGGG")
        f = NearDuplicateFilterWithHammingDistance(2, 10)
        out = f._filter(probes)
        assert len(out) == 3

    @staticmethod
    def _random_mutated_probes(rng, n_clusters, copies, length, mut):
        import numpy as np
        from catch_tpu.probe import Probe
        bases = np.array(list("ACGT"))
        probes = []
        for _ in range(n_clusters):
            base = rng.choice(bases, size=length)
            for _ in range(copies):
                seq = base.copy()
                m = rng.random(length) < mut
                seq[m] = rng.choice(bases, size=int(m.sum()))
                probes.append(Probe.from_str("".join(seq)))
        rng.shuffle(probes)
        return probes

    def test_grouped_thread_pool_deterministic(self):
        """Grouped filtering runs groups on a thread pool; output must
        equal per-group sequential calls in input order (each group
        draws identical hash functions from a fresh seeded family —
        the reference's fork-pool semantics,
        reference test_near_duplicate_filter.py:82,202)."""
        import numpy as np
        from catch_tpu.probe import Probe
        rng = np.random.default_rng(5)
        bases = np.array(list("ACGT"))
        groups = []
        for _ in range(6):
            base = rng.choice(bases, size=100)
            probes = []
            for _ in range(200):
                s = base.copy()
                m = rng.random(100) < 0.02
                s[m] = rng.choice(bases, size=int(m.sum()))
                probes.append(Probe.from_str("".join(s)))
            groups.append(probes)
        f = NearDuplicateFilterWithMinHash(0.5)
        out_pool = f.filter([list(g) for g in groups],
                            input_is_grouped=True)
        f2 = NearDuplicateFilterWithMinHash(0.5)
        out_seq = [f2._filter(list(g)) for g in groups]
        for a, b in zip(out_pool, out_seq):
            assert [p.seq_str for p in a] == [p.seq_str for p in b]

    @pytest.mark.parametrize("make_filter", [
        lambda seed: NearDuplicateFilterWithHammingDistance(
            8, 60, seed=seed),
        lambda seed: NearDuplicateFilterWithMinHash(
            0.5, kmer_size=8, seed=seed),
    ])
    def test_batched_sweep_matches_generic(self, make_filter):
        """The vectorized LSH engine must reproduce the generic
        per-probe lookup exactly: same hash draws, same buckets, same
        exact-distance checks, same greedy output."""
        import numpy as np
        rng = np.random.default_rng(99)
        probes = self._random_mutated_probes(rng, 12, 8, 60, 0.04)
        # duplicate some probes so multiplicity ordering matters
        probes = probes + probes[::7]

        f_batched = make_filter(5)
        out_b = f_batched._filter(list(probes))

        f_generic = make_filter(5)
        occurrences = {}
        for p in probes:
            occurrences[p] = occurrences.get(p, 0) + 1
        input_sorted = [p for p, _ in
                        sorted(occurrences.items(), key=lambda t: t[1],
                               reverse=True)]
        out_g = f_generic._sweep_generic(
            input_sorted, list(occurrences.keys()))

        assert [p.seq_str for p in out_b] == [p.seq_str for p in out_g]
        assert 10 <= len(out_b) < len(occurrences)


class TestNaiveRedundantFilter:
    def test_exact_duplicates_default(self):
        probes = P("ABCDEF", "ABCDEF", "GHIJKL")
        out = NaiveRedundantFilter()._filter(probes)
        assert [p.seq_str for p in out] == ["ABCDEF", "GHIJKL"]

    def test_shift_and_mismatch(self):
        fn = redundant_shift_and_mismatch_count(shift=1, mismatch_thres=1)
        out = NaiveRedundantFilter(fn)._filter(
            P("ABCDEF", "BCDEFG", "ZZZZZZ"))
        assert [p.seq_str for p in out] == ["ABCDEF", "ZZZZZZ"]

    def test_lcs_redundancy(self):
        fn = redundant_longest_common_substring(
            mismatches=0, lcf_thres=5, prune_with_heuristic_and_anchor=False)
        out = NaiveRedundantFilter(fn)._filter(
            P("ABCDEF", "BCDEFG", "ZZZZZZ"))
        assert [p.seq_str for p in out] == ["ABCDEF", "ZZZZZZ"]


class TestDominatingSetFilter:
    def test_exact_duplicates_default(self):
        probes = P("ABCDEF", "ABCDEF", "GHIJKL")
        out = DominatingSetFilter()._filter(probes)
        assert sorted(p.seq_str for p in out) == ["ABCDEF", "GHIJKL"]

    def test_covers_all(self):
        fn = redundant_shift_and_mismatch_count(shift=0, mismatch_thres=1)
        probes = P("ABCDEF", "ABCDEX", "XBCDEF", "QRSTUV")
        out = DominatingSetFilter(fn)._filter(probes)
        # Every input probe must be redundant to (or equal) a chosen one
        for p in probes:
            assert any(fn(c, p) or c == p for c in out)


ADAPTER_A = ("ATACGCCATGCTGGGTCTCC", "CGTACTTGGGAGTCGGCCAT")
ADAPTER_B = ("AGGCCCTGGCTGCTGATATG", "GACCTTTTGGGACAGCGGTG")


class TestAdapterFilter:
    """Ported from /root/reference/catch/filter/tests/
    test_adapter_filter.py:104-244."""

    def _get_output(self, lcf_thres, mismatches, target_genomes, input):
        f = AdapterFilter(ADAPTER_A, ADAPTER_B, mismatches=mismatches,
                          lcf_thres=lcf_thres, kmer_probe_map_k=3)
        return f, f.filter(input, target_genomes)

    def _with_adapters(self, a_strs, b_strs):
        probes = []
        for s in a_strs:
            probes.append(Probe.from_str(s)
                          .with_prepended_str(ADAPTER_A[0])
                          .with_appended_str(ADAPTER_A[1]))
        for s in b_strs:
            probes.append(Probe.from_str(s)
                          .with_prepended_str(ADAPTER_B[0])
                          .with_appended_str(ADAPTER_B[1]))
        return probes

    def _tg(self, groups):
        return [[Genome.from_one_seq(s) for s in group]
                for group in groups]

    def test_one_genome(self):
        tg = self._tg([["ABCDEFGHIJKLMNOPQRSTUVWXYZ"]])
        input = []
        for group in tg:
            for g in group:
                input += cp.make_candidate_probes_from_sequences(
                    g.seqs, probe_length=6, probe_stride=3)
        f, output = self._get_output(6, 0, tg, input)
        want = self._with_adapters(
            ["ABCDEF", "GHIJKL", "MNOPQR", "STUVWX"],
            ["DEFGHI", "JKLMNO", "PQRSTU", "UVWXYZ"])
        assert Counter(output) == Counter(want)

    def test_two_genomes(self):
        tg = self._tg([["ABCDEFGHIJKLMNOPQRSTUVWXYZ"],
                       ["ZYXWVUTSRQPONMLKJIHGFEDCBA"]])
        input = []
        for group in tg:
            for g in group:
                input += cp.make_candidate_probes_from_sequences(
                    g.seqs, probe_length=6, probe_stride=3)
        f, output = self._get_output(6, 0, tg, input)
        want = self._with_adapters(
            ["ABCDEF", "GHIJKL", "MNOPQR", "STUVWX", "ZYXWVU", "TSRQPO",
             "NMLKJI", "HGFEDC"],
            ["DEFGHI", "JKLMNO", "PQRSTU", "UVWXYZ", "WVUTSR", "QPONML",
             "KJIHGF", "FEDCBA"])
        assert Counter(output) == Counter(want)

    def test_almost_identical_probe(self):
        tg = self._tg([["ABCDEFGHIJKLMNOP", "ABCDEFGHXJKLMNOP"]])
        input = P("ABCDEF", "FGHIJK", "FGHXJK", "KLMNOP")
        for allowed_mismatches in [0, 1]:
            f, output = self._get_output(6, allowed_mismatches, tg, input)
            want = self._with_adapters(["ABCDEF", "KLMNOP"],
                                       ["FGHIJK", "FGHXJK"])
            assert Counter(output) == Counter(want)
            votes = f._make_votes_across_target_genomes(input, tg)
            if allowed_mismatches == 0:
                assert votes == [(2, 0), (0, 1), (0, 1), (2, 0)]
            else:
                assert votes == [(2, 0), (0, 2), (0, 2), (2, 0)]

    def test_misaligned(self):
        tg = self._tg([["ABCDEFGHIJKLMNOPQR", "XYZABCDEFGHIJKLMNOPQR"]])
        input = P("XYZABC", "ABCDEF", "DEFGHI", "GHIJKL", "JKLMNO",
                  "MNOPQR")
        f, output = self._get_output(6, 0, tg, input)
        want = self._with_adapters(["ABCDEF", "GHIJKL", "MNOPQR"],
                                   ["XYZABC", "DEFGHI", "JKLMNO"])
        assert Counter(output) == Counter(want)
        votes = f._make_votes_across_target_genomes(input, tg)
        assert votes == [(0, 1), (2, 0), (0, 2), (2, 0), (0, 2), (2, 0)]

    def test_three_genomes(self):
        tg = self._tg([["ABCDEFGHEFKLMN", "ABCDEFKLMN", "ABCDEFKLMNO"]])
        input = P("ABCDEF", "EFKLMN")
        f, output = self._get_output(6, 0, tg, input)
        want = self._with_adapters(["ABCDEF"], ["EFKLMN"])
        assert Counter(output) == Counter(want)
        votes = f._make_votes_across_target_genomes(input, tg)
        assert votes == [(3, 0), (1, 2)]

    def test_with_mismatches(self):
        tg = self._tg([["ABCDEFGHIJKLMNO", "ABCXEFGXIJKXMNO",
                        "ABCDEFGYYJKLMNO", "ABCDEXGHIJKLXNO",
                        "ABCDEFGHIJKLMNX", "AXCDEFGHIJKLMNO",
                        "ABCDEFGHIYYLMNO"]])
        input = P("ABCDEF", "DEFGHI", "GHIJKL", "JKLMNO", "DEFGYY",
                  "GYYJKL", "IYYLMN")
        f, output = self._get_output(6, 1, tg, input)
        want = self._with_adapters(
            ["ABCDEF", "GHIJKL", "GYYJKL", "IYYLMN"],
            ["DEFGHI", "JKLMNO", "DEFGYY"])
        assert Counter(output) == Counter(want)

    def test_bad_adapter_args(self):
        with pytest.raises(ValueError):
            AdapterFilter(("A",), ADAPTER_B, mismatches=0, lcf_thres=6)


class TestProbeDesigner:
    def test_basic_design(self):
        genomes = [[Genome.from_one_seq("ABCDEFGHIJKLMNOPQRSTUVWXYZ")]]
        filters = [DuplicateFilter()]
        pd = ProbeDesigner(genomes, filters, probe_length=6,
                           probe_stride=3)
        pd.design()
        # Tiling: starts 0..18 step 3 (7 probes) + right-aligned tail
        assert len(pd.final_probes) == 8
        seqs = {p.seq_str for p in pd.final_probes}
        assert "ABCDEF" in seqs and "UVWXYZ" in seqs

    def test_design_with_set_cover(self):
        genomes = [[Genome.from_one_seq(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF")]]
        scf = SetCoverFilter(mismatches=0, lcf_thres=6, coverage=1.0,
                             kmer_probe_map_k=3)
        pd = ProbeDesigner(genomes, [DuplicateFilter(), scf],
                           probe_length=6, probe_stride=3)
        pd.design()
        # Full coverage with 6bp tiling at stride 3 needs ~6 probes
        assert 5 <= len(pd.final_probes) <= 7

    def test_design_with_clustering(self):
        # Two divergent families of sequences; cluster and design per
        # cluster, merging after set cover
        import numpy as np
        rng = np.random.default_rng(0)
        fam1 = "".join(rng.choice(list("ACGT"), size=600))
        fam2 = "".join(rng.choice(list("ACGT"), size=600))

        def mutate(s, rate):
            out = list(s)
            for i in range(len(out)):
                if rng.random() < rate:
                    out[i] = str(rng.choice(list("ACGT")))
            return "".join(out)

        genomes = [[Genome.from_one_seq(mutate(fam1, 0.03)),
                    Genome.from_one_seq(mutate(fam1, 0.03)),
                    Genome.from_one_seq(mutate(fam2, 0.03)),
                    Genome.from_one_seq(mutate(fam2, 0.03))]]
        scf = SetCoverFilter(mismatches=1, lcf_thres=60, coverage=1.0)
        pd = ProbeDesigner(genomes, [DuplicateFilter(), scf],
                           probe_length=60, probe_stride=30,
                           cluster_threshold=0.15,
                           cluster_merge_after=scf,
                           cluster_method="choose")
        pd.design()
        assert len(pd.final_probes) > 0
        # Candidates from all four sequences were produced (19 tiles
        # per 600-nt sequence at stride 30)
        assert len(pd.candidate_probes) == 4 * 19

    def test_pipelined_groups_match_stage_loop(self):
        """The cross-stage group pipeline (whole filter chain per
        group, groups overlapped) must produce exactly what the
        stage-at-a-time loop produces, per group and in order."""
        import numpy as np
        rng = np.random.default_rng(5)

        def fam(seed_seq, n):
            out = []
            for _ in range(n):
                s = np.array(list(seed_seq))
                m = rng.random(len(s)) < 0.02
                s[m] = rng.choice(list("ACGT"), size=int(m.sum()))
                out.append(Genome.from_one_seq("".join(s)))
            return out

        groups = [fam("".join(rng.choice(list("ACGT"), size=500)), 4)
                  for _ in range(5)]
        probes = [cp.make_candidate_probes_from_sequences(
            [s for g in grp for s in g.seqs], probe_length=60,
            probe_stride=30) for grp in groups]

        def chain():
            return [NearDuplicateFilterWithMinHash(0.6),
                    SetCoverFilter(mismatches=1, lcf_thres=60,
                                   cover_extension=10)]

        f_serial = chain()
        pd = ProbeDesigner(groups, f_serial, probe_length=60,
                           probe_stride=30)
        serial = probes
        for f in f_serial:
            serial = f.filter(serial, groups, input_is_grouped=True)

        f_pipe = chain()
        pd2 = ProbeDesigner(groups, f_pipe, probe_length=60,
                            probe_stride=30)
        assert all(f.group_local for f in f_pipe)
        piped = pd2._filter_groups_pipelined(probes, groups, f_pipe)

        assert len(piped) == len(serial)
        for g, (a, b) in enumerate(zip(serial, piped)):
            assert [p.seq_str for p in a] == [p.seq_str for p in b], g
        # accumulated stats cover all groups
        stats = f_pipe[-1].last_run_stats
        assert stats["groups_device"] + stats["groups_host"] == \
            len(groups)

    def test_max_num_processes_one_disables_pipeline(self, monkeypatch):
        """--max-num-processes 1 must mean serial: the pipelined path
        may not run (it floors its pool at 2 workers)."""
        from catch_tpu.filters import base as filter_base
        monkeypatch.setattr(filter_base, "_max_num_processes", 1)
        groups = [[Genome.from_one_seq("ACGTACGTACGTACGTACGTACGT")]
                  for _ in range(3)]
        probes = [cp.make_candidate_probes_from_sequences(
            [g[0].seqs[0]], probe_length=8, probe_stride=4)
            for g in groups]
        filters = [DuplicateFilter(),
                   SetCoverFilter(mismatches=0, lcf_thres=8,
                                  kmer_probe_map_k=4)]
        pd = ProbeDesigner(groups, filters, probe_length=8,
                           probe_stride=4)

        def boom(*a, **k):
            raise AssertionError("pipeline must not run at cap 1")

        monkeypatch.setattr(pd, "_filter_groups_pipelined", boom)
        out = pd._pass_through_filters(probes, groups, filters)
        assert len(out) == 3

    def test_adapter_filter_not_group_local(self):
        af = AdapterFilter(("AT", "CG"), ("GG", "TT"), mismatches=0,
                           lcf_thres=6)
        assert af.group_local is False
        scf = SetCoverFilter(mismatches=0, lcf_thres=6, identify=True,
                             coverage=0.5)
        assert scf.group_local is False
        assert DuplicateFilter().group_local is True
