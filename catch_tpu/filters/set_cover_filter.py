"""SetCoverFilter: probe selection by multi-universe set cover.

Behavioral parity with the reference SetCoverFilter
(/root/reference/catch/filter/set_cover_filter.py:195-930): per-group
set-cover instances over target genomes with cover extension, required
coverage (fractional or bp), identification ranks, avoided-genome
penalty ranks (tolerant hybridization model, both strands), and custom
cover functions.

TPU-native design: the cover engine (ProbeSearcher) replaces the k-mer
map + fork pool; cover spans flow directly into flat interval arrays
(ops/set_cover.build_instance_from_cover_arrays) with no per-probe
Python dict materialization; each group's greedy solve is one jitted
while-loop on device (host mirror for tiny instances).
"""

import logging

import numpy as np

from catch_tpu.filters.base import BaseFilter
from catch_tpu.ops import set_cover
from catch_tpu.ops.cover import CoverModel, ProbeSearcher
from catch_tpu.utils import dynamic_load, seq_io

logger = logging.getLogger(__name__)

__all__ = ["SetCoverFilter"]

_RC_MAP = {"A": "T", "T": "A", "C": "G", "G": "C"}


def _reverse_complement(sequence):
    return "".join(_RC_MAP.get(b, b) for b in sequence[::-1])


class SetCoverFilter(BaseFilter):
    """Selects candidate probes via greedy multi-universe set cover."""

    def __init__(self, mismatches, lcf_thres, island_of_exact_match=0,
                 mismatches_tolerant=None, lcf_thres_tolerant=None,
                 island_of_exact_match_tolerant=None,
                 custom_cover_range_fn=None,
                 custom_cover_range_tolerant_fn=None,
                 identify=False, avoided_genomes=[], coverage=1.0,
                 cover_extension=0, kmer_probe_map_k=20,
                 kmer_probe_map_use_native_dict=False, mesh=None):
        """Args mirror the reference contract
        (set_cover_filter.py:200-290); kmer_probe_map_use_native_dict is
        accepted for compatibility and ignored (no shared-memory dict
        exists here).  `mesh` is an optional jax.sharding.Mesh: with
        more than one device, the cover scan verifies data-parallel
        across it and the greedy solve shards candidate sets over it
        (catch_tpu/parallel/set_cover.py) — the output probe set is
        identical for every device count (the TPU analogue of the
        reference's num_processes-invariance contract,
        reference test_set_cover_filter.py:134-175)."""
        self.mesh = mesh
        if custom_cover_range_fn is not None:
            fn_path, fn_name = custom_cover_range_fn
            fn = dynamic_load.load_function_from_path(fn_path, fn_name)
            self.model = CoverModel(custom_fn=fn)
        else:
            self.model = CoverModel(mismatches, lcf_thres,
                                    island_of_exact_match)

        if not mismatches_tolerant:
            mismatches_tolerant = mismatches
        if not lcf_thres_tolerant:
            lcf_thres_tolerant = lcf_thres
        if not island_of_exact_match_tolerant:
            island_of_exact_match_tolerant = island_of_exact_match
        if custom_cover_range_tolerant_fn is not None:
            fn_path, fn_name = custom_cover_range_tolerant_fn
            fn = dynamic_load.load_function_from_path(fn_path, fn_name)
            self.tolerant_model = CoverModel(custom_fn=fn)
        else:
            self.tolerant_model = CoverModel(
                mismatches_tolerant, lcf_thres_tolerant,
                island_of_exact_match_tolerant)

        if identify:
            if (coverage <= 1.0 and coverage >= 0.25) or \
               (coverage > 1 and coverage >= 5000):
                logger.warning(
                    "Identification is enabled but the required coverage "
                    "is high; generally coverage should be small when "
                    "performing identification")

        self.identify = identify
        self.avoided_genomes = avoided_genomes
        self.coverage = coverage
        self.cover_extension = cover_extension
        self.kmer_probe_map_k = kmer_probe_map_k

        self.requires_probe_groupings = True
        # Test hook kept for API parity (process count is meaningless
        # here; output must be identical regardless)
        self._force_num_processes = None

    # ------------------------------------------------------------------

    def _make_cover_arrays(self, candidate_probes, target_genomes):
        """Cover spans of every candidate in every target genome.

        Returns flat arrays (set_ids, univ_ids, starts, ends) with
        cover extension applied and clamped per chromosome, and
        coordinates offset into genome-global positions
        (reference set_cover_filter.py:414-470).
        """
        searcher = ProbeSearcher(candidate_probes, self.model,
                                 kmer_probe_map_k=self.kmer_probe_map_k,
                                 mesh=self.mesh)
        self._last_searcher = searcher
        # Reference semantics: later duplicates take the id
        # (set_cover_filter.py:407-410 builds probe->id with last-wins)
        probe_id = {}
        for i, p in enumerate(candidate_probes):
            probe_id[p] = i
        pid_of = np.array([probe_id[p] for p in searcher.probes],
                          dtype=np.int64) if not searcher.empty else \
            np.empty(0, dtype=np.int64)

        # Flatten all chromosome sequences across genomes with per-seq
        # (genome id, chromosome offset, length) bookkeeping; one
        # corpus-level scan replaces the per-sequence loop.
        sequences, seq_univ, seq_off, seq_len = [], [], [], []
        for j, gnm in enumerate(target_genomes):
            length_so_far = 0
            for sequence in gnm.seqs:
                sequences.append(sequence)
                seq_univ.append(j)
                seq_off.append(length_so_far)
                seq_len.append(len(sequence))
                length_so_far += len(sequence)
        seq_univ = np.array(seq_univ, dtype=np.int64)
        seq_off = np.array(seq_off, dtype=np.int64)
        seq_len = np.array(seq_len, dtype=np.int64)
        logger.info("Computing coverage across %d target genomes "
                    "(%d sequences)", len(target_genomes), len(sequences))

        p_idx, s_idx, st, en = searcher.find_probe_covers_flat(sequences)
        if len(p_idx) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy(), z.copy()
        # Cover extension, clamped per chromosome, then offset into
        # genome-global coordinates (reference set_cover_filter.py:414-470)
        st = np.maximum(0, st - self.cover_extension)
        en = np.minimum(seq_len[s_idx], en + self.cover_extension)
        return (pid_of[p_idx], seq_univ[s_idx],
                st + seq_off[s_idx], en + seq_off[s_idx])

    def _tolerant_bp_covered(self, searcher, sequence, rc_too=True):
        """Per-probe bp covered in sequence (and its reverse complement)
        under the tolerant model (reference :473-530)."""
        num_bp = {}
        strands = [sequence]
        if rc_too:
            strands.append(_reverse_complement(sequence))
        for s in strands:
            covers = searcher.find_probe_covers(s)
            for p, cover_ranges in covers.items():
                tot = sum(e - a for (a, e) in cover_ranges)
                num_bp[p] = num_bp.get(p, 0) + tot
        return num_bp

    def _make_ranks(self, candidate_probes, target_genomes_grouped):
        """Integer rank per set id (reference :614-735): tuples
        (0, groupings_hit or 0) / (1, avoided_bp), densified."""
        need_searcher = self.identify or len(self.avoided_genomes) > 0
        searcher = None
        if need_searcher:
            searcher = ProbeSearcher(
                candidate_probes, self.tolerant_model,
                kmer_probe_map_k=self.kmer_probe_map_k, mesh=self.mesh)

        if self.identify:
            num_groupings_hit = {p: 0 for p in candidate_probes}
            for i, genomes_from_group in enumerate(target_genomes_grouped):
                logger.info(
                    "Computing coverage in grouping %d (of %d) to count "
                    "number of groupings hit", i + 1,
                    len(target_genomes_grouped))
                bp_in_grouping = {}
                for gnm in genomes_from_group:
                    for sequence in gnm.seqs:
                        for p, bp in self._tolerant_bp_covered(
                                searcher, sequence).items():
                            bp_in_grouping[p] = bp_in_grouping.get(p, 0) + bp
                for p, bp in bp_in_grouping.items():
                    if bp >= 1:
                        num_groupings_hit[p] += 1
            for p, hit in num_groupings_hit.items():
                if hit == 0:
                    logger.critical(
                        "There is a probe that does not 'hit' any target "
                        "genome grouping, but every candidate probe "
                        "should hit at least one")
            rank_val = {p: (0, hit) for p, hit in num_groupings_hit.items()}
        else:
            rank_val = {p: (0, 0) for p in candidate_probes}

        total_avoided_bp = {p: 0 for p in candidate_probes}
        for fasta_path in self.avoided_genomes:
            for sequence in seq_io.iterate_fasta(fasta_path):
                logger.info("Computing coverage across an avoided sequence")
                for p, bp in self._tolerant_bp_covered(
                        searcher, sequence).items():
                    total_avoided_bp[p] += bp
        for p, bp in total_avoided_bp.items():
            if bp > 0:
                rank_val[p] = (1, bp)

        all_rank_tuples = sorted(set(rank_val.values()))
        tuple_rank_idx = {t: i for i, t in enumerate(all_rank_tuples)}
        return np.array(
            [tuple_rank_idx[rank_val[p]] for p in candidate_probes],
            dtype=np.int64)

    def _make_universe_p(self, target_genomes):
        """Required coverage per universe (reference :761-792)."""
        if self.coverage <= 1.0:
            return np.full(len(target_genomes), self.coverage,
                           dtype=np.float64)
        p = np.empty(len(target_genomes), dtype=np.float64)
        for j, gnm in enumerate(target_genomes):
            desired = min(self.coverage, gnm.size())
            p[j] = float(desired) / gnm.size()
        return p

    # ------------------------------------------------------------------

    def _filter(self, input, target_genomes_grouped):
        """Per-group set-cover selection; input is grouped probes."""
        import time as _time
        stats = {"scan_seconds": 0.0, "solve_seconds": 0.0,
                 "candidates_evaluated": 0, "set_cover_picks": 0}
        self.last_run_stats = stats
        selected_probes = []
        for group_i, (possible_probes, target_genomes) in enumerate(
                zip(input, target_genomes_grouped)):
            possible_probes = list(possible_probes)
            logger.info("Building set cover input (group %d of %d)",
                        group_i + 1, len(input))
            if len(possible_probes) == 0:
                selected_probes.append([])
                continue
            t0 = _time.time()
            set_ids, univ_ids, starts, ends = self._make_cover_arrays(
                possible_probes, target_genomes)
            stats["scan_seconds"] += _time.time() - t0
            stats["candidates_evaluated"] += \
                self._last_searcher.stats["candidates"]
            ranks = self._make_ranks(possible_probes,
                                     target_genomes_grouped)
            universe_p = self._make_universe_p(target_genomes)
            inst = set_cover.build_instance_from_cover_arrays(
                set_ids, univ_ids, starts, ends,
                n_sets=len(possible_probes),
                n_universes=len(target_genomes),
                universe_p=universe_p, ranks=ranks)
            logger.info("Solving set cover instance (group %d of %d)",
                        group_i + 1, len(input))
            t0 = _time.time()
            chosen = set_cover.solve_instance(inst, mesh=self.mesh)
            stats["solve_seconds"] += _time.time() - t0
            stats["set_cover_picks"] += len(chosen)
            n_min_rank = int(np.sum(ranks[chosen] > ranks.min())) \
                if len(chosen) else 0
            if n_min_rank:
                logger.warning(
                    "The solution for group %d chose %d probes with rank "
                    "above the minimum (e.g., probes hitting avoided "
                    "genomes or multiple groupings)", group_i, n_min_rank)
            # Deterministic output order: ascending set id = candidate
            # order (the reference iterates a Python set of ints here,
            # set_cover_filter.py:921-928)
            chosen_sorted = np.sort(chosen)
            selected_probes.append(
                [possible_probes[i] for i in chosen_sorted])
        return selected_probes
