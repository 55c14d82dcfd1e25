"""Tests for SetCoverFilter.

Ported behavioral expectations from
/root/reference/catch/filter/tests/test_set_cover_filter.py (contrived
alphabets, kmer_probe_map_k=3, coverage/identify/avoid/extension cases).
The reference asserts num_processes-invariance; here output determinism
is inherent (one code path), so each case runs once.
"""

from collections import OrderedDict
import os
import tempfile

import pytest

from catch_tpu.filters.set_cover_filter import SetCoverFilter
from catch_tpu.genome import Genome
from catch_tpu.probe import Probe
from catch_tpu.ops.cover import CoverModel, ProbeSearcher
from catch_tpu.utils.intervals import merge_overlapping


def convert_target_genomes(target_genomes):
    return [[Genome.from_one_seq(g) for g in group]
            for group in target_genomes]


def get_filter_and_output(lcf_thres, mismatches, target_genomes_grouped,
                          input, coverage, mismatches_tolerant=-1,
                          lcf_thres_tolerant=-1, cover_extension=0,
                          identify=False, avoided_genomes=[]):
    input_probes_grouped = []
    for input_group in input:
        probes = [Probe.from_str(s) if isinstance(s, str) else s
                  for s in input_group]
        input_probes_grouped.append(list(OrderedDict.fromkeys(probes)))
    f = SetCoverFilter(
        mismatches=mismatches, lcf_thres=lcf_thres, coverage=coverage,
        cover_extension=cover_extension,
        mismatches_tolerant=mismatches_tolerant,
        lcf_thres_tolerant=lcf_thres_tolerant, identify=identify,
        avoided_genomes=avoided_genomes, kmer_probe_map_k=3)
    output = f.filter(input_probes_grouped, target_genomes_grouped,
                      input_is_grouped=True)
    return f, list(set(p for group in output for p in group))


def verify_target_genome_coverage(selected_probes, target_genomes, f,
                                  desired_coverage, cover_extension=0):
    searcher = ProbeSearcher(selected_probes, f.model, kmer_probe_map_k=3)
    for tg in [tg for group in target_genomes for tg in group]:
        num_bp_covered = 0
        for seq in tg.seqs:
            covers = searcher.find_probe_covers(seq)
            all_ranges = []
            for cover_ranges in covers.values():
                for (s, e) in cover_ranges:
                    all_ranges.append((max(0, s - cover_extension),
                                       min(len(seq), e + cover_extension)))
            for (s, e) in merge_overlapping(all_ranges):
                num_bp_covered += e - s
        if desired_coverage <= 1.0:
            assert num_bp_covered >= desired_coverage * tg.size()
        else:
            assert num_bp_covered >= min(desired_coverage, tg.size())


def tile_6bp(target_genomes_grouped):
    input = []
    for group in target_genomes_grouped:
        input_group = []
        for tg in group:
            for seq in tg.seqs:
                input_group += [seq[i:i + 6]
                                for i in range(len(seq) - 6 + 1)]
        input.append(input_group)
    return input


def get_6bp_probes(target_genomes_grouped, cover=1.0, cover_extension=0,
                   identify=False, mismatches_tolerant=0,
                   lcf_thres_tolerant=6, avoided_genomes=[]):
    input = tile_6bp(target_genomes_grouped)
    return get_filter_and_output(
        6, 0, target_genomes_grouped, input, cover,
        mismatches_tolerant=mismatches_tolerant,
        lcf_thres_tolerant=lcf_thres_tolerant,
        cover_extension=cover_extension, identify=identify,
        avoided_genomes=avoided_genomes)


class TestSetCoverFilter:
    def test_full_coverage_one_group(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        f, output = get_6bp_probes(tg)
        for must in ["OPQRST", "UVWXYZ", "FEDCBA", "ABCDEF", "ZYXWVF"]:
            assert Probe.from_str(must) in output
        verify_target_genome_coverage(output, tg, f, 1.0)

    def test_full_coverage_two_groups(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"],
             ["ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        f, output = get_6bp_probes(tg)
        verify_target_genome_coverage(output, tg, f, 1.0)

    def test_same_output_with_duplicated_species(self):
        tg1 = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        _, probes_once = get_6bp_probes(tg1)
        tg2 = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"],
             ["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        _, probes_twice = get_6bp_probes(tg2)
        assert set(probes_once) == set(probes_twice)

    def test_fractional_coverage(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"]])
        min_num_probes = {0.1: 1, 0.5: 2, 0.8: 4, 1.0: 5}
        for cover_frac, want in min_num_probes.items():
            f, probes = get_6bp_probes(tg, cover_frac)
            assert len(probes) == want
            verify_target_genome_coverage(probes, tg, f, cover_frac)

    def test_explicit_bp_coverage(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"]])
        min_num_probes = {2: 1, 5: 1, 10: 1, 15: 2, 20: 3, 1000: 5}
        for num_bp, want in min_num_probes.items():
            f, probes = get_6bp_probes(tg, num_bp)
            assert len(probes) == want
            verify_target_genome_coverage(probes, tg, f, num_bp)

    def test_varying_probe_length(self):
        tg = convert_target_genomes([["ABCDEFGHIJKLM", "ABCXE", "CXEGH"]])
        cands = [["ABCDEF", "DEFGHI", "GHIJKLM", "ABCXE", "CXEGH"]]
        f, probes = get_filter_and_output(5, 0, tg, cands, 1.0)
        assert sorted(p.seq_str for p in probes) == sorted(
            ["ABCDEF", "GHIJKLM", "ABCXE", "CXEGH"])
        verify_target_genome_coverage(probes, tg, f, 1.0)

    def test_cover_extension1(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"]])
        f, probes = get_6bp_probes(tg, cover_extension=2)
        assert len(probes) == 3
        verify_target_genome_coverage(probes, tg, f, 1.0,
                                      cover_extension=2)

    def test_cover_extension2(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        f, probes = get_6bp_probes(tg, cover_extension=3)
        assert len(probes) == 5
        verify_target_genome_coverage(probes, tg, f, 1.0,
                                      cover_extension=3)

    def test_cover_extension3(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFED"]])
        f, probes = get_6bp_probes(tg, cover_extension=3)
        assert len(probes) == 4
        verify_target_genome_coverage(probes, tg, f, 1.0,
                                      cover_extension=3)

    def test_cover_extension_with_partial_coverage(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ZYXWVFGHIJWUTSOPQRSTFEDCBAZYXWVF"]])
        f, probes = get_6bp_probes(tg, cover=0.5, cover_extension=3)
        assert len(probes) == 3
        verify_target_genome_coverage(probes, tg, f, 0.5,
                                      cover_extension=3)

    def test_identify_one_group(self):
        tg = convert_target_genomes(
            [["ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert probes == [Probe.from_str("ABCDEF")]

    def test_identify_two_groups(self):
        tg = convert_target_genomes(
            [["ABCDEFXXIJKXMNOPQRXTUXWXYXABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"],
             ["ATATATABCDEFATATATATATATATATATAT"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert set(probes) == {Probe.from_str("MNOPQR"),
                               Probe.from_str("ATATAT")}

    def test_identify_three_groups(self):
        tg = convert_target_genomes(
            [["ABCDEFQRSQRSHIJKLMQRSQRSQRSQRSQR",
              "XYZXYZATATATAXYZXYZXYZEEEEEEXYZX"],
             ["ATATATABXDXFATATATACGCGCGTATATAT",
              "CGCGCGABCDEFATXTATATATATATATATAT"],
             ["XYZXYZAAAAAAXYZXYZXYZXYZXYZXYZXY",
              "QRSQRSQRSQRAAAAAAQRSQRSQRSQRSQRS"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert Probe.from_str("CGCGCG") in probes
        assert Probe.from_str("AAAAAA") in probes
        assert len(probes) == 4

    def test_identify_three_groups_forced_pick(self):
        tg = convert_target_genomes(
            [["ABCDEFXYZXYZIJKLMN", "XYZXYZBCDEFMNOPQ"],
             ["ABCDEFMNOPQR"], ["ABCDEF"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert set(probes) == {Probe.from_str("ABCDEF"),
                               Probe.from_str("XYZXYZ"),
                               Probe.from_str("MNOPQR")}

    def test_identify_three_groups_two_hit_species(self):
        tg = convert_target_genomes(
            [["ABCDEFXYZXYZ", "MNOPQRXYZXYZ"], ["ABCDEFXYZXYZ"],
             ["ABCDEFMNOPQR"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert Probe.from_str("ABCDEF") not in probes
        assert Probe.from_str("MNOPQR") not in probes

    def test_identify_two_groups_two_probes(self):
        tg = convert_target_genomes(
            [["ABCDEFXXIJKXMNOPQRXTUVWXYXABCDEF",
              "TUVWXYGHIJKLMNOPQRSABCDEFAABCDEF"],
             ["ATATATABCDEFATATATATATATATATATAT"]])
        f, probes = get_6bp_probes(tg, cover=10, identify=True)
        assert set(probes) == {Probe.from_str("MNOPQR"),
                               Probe.from_str("TUVWXY"),
                               Probe.from_str("ATATAT")}

    def test_identify_two_groups_tolerant(self):
        tg = convert_target_genomes(
            [["ABCDEFXXIJKXMNOPQRXTATXAYABCDEFATAXATXYZX",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"],
             ["ATATATABCDEFATATATATATATATXYZXYZ"]])
        f, probes = get_6bp_probes(tg, cover=6, mismatches_tolerant=1,
                                   lcf_thres_tolerant=5, identify=True)
        assert set(probes) == {Probe.from_str("MNOPQR"),
                               Probe.from_str("XYZXYZ")}

    def test_identify_two_groups_reverse_complement(self):
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXMNOPQRXTUXWXYXATCGGG",
              "ATCGGGGHIJKLMNOPQRSTUVWXYZATCGGG"],
             ["ATATATCCCGATATATATATATATATATATAT"]])
        f, probes = get_6bp_probes(tg, cover=6, identify=True)
        assert set(probes) == {Probe.from_str("MNOPQR"),
                               Probe.from_str("ATATAT")}

    def _write_avoided(self, *seqs):
        f = tempfile.NamedTemporaryFile(mode="w", suffix=".fasta",
                                        delete=False)
        for i, s in enumerate(seqs):
            f.write(f">n/a {i}\n{s}\n")
        f.close()
        return f.name

    def test_avoid_one_genome1(self):
        path = self._write_avoided("AAAAAAAAAAAAAAAAAAAAA")
        tg = convert_target_genomes(
            [["ABCDEFXXIJKXMNOPQRXTUXWXYXABCDEF",
              "ABCDEFGHIJKLMNOPQRSTUVWXYZABCDEF"]])
        f, probes = get_6bp_probes(tg, cover=6, avoided_genomes=[path])
        assert set(probes) == {Probe.from_str("ABCDEF")}
        os.unlink(path)

    def test_avoid_one_genome2(self):
        path = self._write_avoided("AAAAAAAAATCGGGAAAAAAAA")
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXMNOPQRXTUXWXYXATCGGG",
              "ATCGGGGHIJKLMNOPQRSTUVWXYZATCGGG"]])
        f, probes = get_6bp_probes(tg, cover=6, avoided_genomes=[path])
        assert set(probes) == {Probe.from_str("MNOPQR")}
        os.unlink(path)

    def test_avoid_one_genome_reverse_complement(self):
        path = self._write_avoided("AAAAAAAACCCGATAAAAAA")
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXMNOPQRXTUXWXYXATCGGG",
              "ATCGGGGHIJKLMNOPQRSTUVWXYZAYCGGG"]])
        f, probes = get_6bp_probes(tg, cover=6, avoided_genomes=[path])
        assert set(probes) == {Probe.from_str("MNOPQR")}
        os.unlink(path)

    def test_avoid_one_genome_tolerant(self):
        path = self._write_avoided("AAAAAAAATCCGCAAAAAAAA")
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXMNOPQRXTUXWXYXATCGGG",
              "ATCGGGGHIJKLMNOPQRSTUVWXYZAYCGGG"]])
        f, probes = get_6bp_probes(tg, cover=6, mismatches_tolerant=1,
                                   lcf_thres_tolerant=5,
                                   avoided_genomes=[path])
        assert set(probes) == {Probe.from_str("MNOPQR")}
        os.unlink(path)

    def test_avoid_two_genomes_one_file(self):
        path = self._write_avoided("AAAAAAAAATCGGGAAAAAAAA",
                                   "AATCGGGAAAAAAAAGGGGGGAAAA")
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXGGGGGGXTUXWXYXATCGGG",
              "ATCGGGGHIJKLGGGGGGSTUVWXYZATCGGG"]])
        f, probes = get_6bp_probes(tg, cover=6, avoided_genomes=[path])
        assert Probe.from_str("ATCGGG") not in probes
        assert Probe.from_str("GGGGGG") not in probes
        os.unlink(path)

    def test_avoid_two_genomes_two_files(self):
        p1 = self._write_avoided("AAAAAAAAATCGGGAAAAAAAA")
        p2 = self._write_avoided("AATCGGGAAAAAAAAGGGGGGAAAA")
        tg = convert_target_genomes(
            [["ATCGGGXXIJKXGGGGGGXTUXWXYXATCGGG",
              "ATCGGGGHIJKLGGGGGGSTUVWXYZATCGGG"]])
        f, probes = get_6bp_probes(tg, cover=6, avoided_genomes=[p1, p2])
        assert Probe.from_str("ATCGGG") not in probes
        assert Probe.from_str("GGGGGG") not in probes
        os.unlink(p1)
        os.unlink(p2)

    def test_avoid_one_genome_forced_pick(self):
        path = self._write_avoided("AAAAAAAAAAATCGGGAAAAA")
        tg = convert_target_genomes([["ABCDEFABCDEF"], ["ABCDEFATCGGG"]])
        f, probes = get_6bp_probes(tg, cover=1.0, avoided_genomes=[path])
        assert Probe.from_str("ABCDEF") in probes
        assert Probe.from_str("ATCGGG") in probes
        assert len(probes) == 3
        os.unlink(path)

    def test_identify_and_avoid(self):
        path = self._write_avoided("AAAAAAAAAAATCGGGATCGGGAAAAA")
        tg = convert_target_genomes(
            [["ABCDEFGGGGGGCCCCCC"],
             ["ABCDEFATCGGGATCGGGXXX",
              "ATCGGGBCDEFGGGGGCCCCCATCGGGYYY"]])
        f, probes = get_6bp_probes(tg, cover=12, identify=True,
                                   avoided_genomes=[path])
        assert Probe.from_str("GGGGGG") in probes
        assert Probe.from_str("CCCCCC") in probes
        assert Probe.from_str("ABCDEF") not in probes
        assert Probe.from_str("ATCGGG") not in probes
        verify_target_genome_coverage(probes, tg, f, 12)
        os.unlink(path)

    def test_custom_cover_range_fn(self):
        fn_src = (
            '"""Toy custom cover model (mirrors the reference fixture '
            'catch/filter/tests/input/custom_cover_range_fn.py)."""\n'
            "def covers_abc(probe_seq, sequence, kmer_start, kmer_end,\n"
            "               full_probe_len, full_sequence_len):\n"
            "    probe_seq = ''.join(probe_seq)\n"
            "    if 'ABC' in probe_seq and 'ABC' in sequence:\n"
            "        i = sequence.index('ABC')\n"
            "        return (i, i + len('ABC'))\n"
            "    return None\n")
        fn_file = tempfile.NamedTemporaryFile(
            mode="w", suffix=".py", delete=False)
        fn_file.write(fn_src)
        fn_file.close()

        tg = convert_target_genomes(
            [["AAAAAAAAABCBBBBBBBBBB", "AAAAAAAAABCBBBBBBBBBB"]])
        cands = [[Probe.from_str(p)
                  for p in ["AAAAAA", "AAABCB", "BBBBBB", "XXXXXX"]]]
        f = SetCoverFilter(0, 0, coverage=3,
                           custom_cover_range_fn=(fn_file.name,
                                                  "covers_abc"),
                           kmer_probe_map_k=3)
        output = f.filter(cands, tg, input_is_grouped=True)
        output = list(set(p for group in output for p in group))
        assert set(output) == {Probe.from_str("AAABCB")}
        os.unlink(fn_file.name)

    def test_filter_empty_input(self):
        tg = convert_target_genomes([["ACGT"]])
        f = SetCoverFilter(0, 0)
        assert f._filter([[]], tg) == [[]]
        assert f.filter([[]], tg, input_is_grouped=True) == [[]]


class TestAvoidedGenomesBatched:
    """The avoided-genome rank scan streams through the batched corpus
    path in bounded batches; splitting the stream must not change
    ranks or output (reference set_cover_filter.py:580-612)."""

    def test_batch_split_invariance(self, tmp_path):
        import numpy as np

        from catch_tpu.filters.duplicate import DuplicateFilter
        from catch_tpu.filters.candidates import (
            make_candidate_probes_from_sequences)

        rng = np.random.default_rng(11)
        bases = np.array(list("ACGT"))
        target = "".join(rng.choice(bases, size=3000))
        genomes = [Genome.from_one_seq(target)]
        # Avoided background: several sequences, some sharing stretches
        # of the target so a few probes earn a nonzero avoided rank
        avoided = tmp_path / "avoid.fasta"
        with open(avoided, "w") as f:
            for i in range(12):
                if i % 3 == 0:
                    lo = rng.integers(0, len(target) - 400)
                    s = target[lo:lo + 400]
                else:
                    s = "".join(rng.choice(bases, size=500))
                f.write(f">bg{i}\n{s}\n")

        probes = DuplicateFilter()._filter(
            make_candidate_probes_from_sequences(
                [target], probe_length=80, probe_stride=40))

        def run(batch_bp):
            scf = SetCoverFilter(
                mismatches=1, lcf_thres=60,
                avoided_genomes=[str(avoided)])
            scf._AVOID_BATCH_BP = batch_bp
            ranks = scf._make_ranks(probes, [genomes])
            out = scf.filter([probes], [genomes], input_is_grouped=True)
            return ranks.tolist(), [p.seq_str for p in out[0]]

        ranks_one, out_one = run(1 << 30)     # single batch
        ranks_split, out_split = run(600)     # many tiny batches
        assert ranks_one == ranks_split
        assert out_one == out_split
        assert max(ranks_one) > 0, "some probe must hit the background"
