"""End-to-end benchmark: full probe design on the Ebola test corpus.

Runs the complete design pipeline (candidate tiling -> duplicate filter
-> cover scan -> greedy multi-universe set cover) on the first 175
genomes of the Zaire ebolavirus fixture with the reference README's
recommended hybridization model (-pl 100 -m 2 -l 60 -e 50), the same
workload as /root/reference/bin/design.py on the same input.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}

vs_baseline is the speedup (baseline_seconds / our_seconds) over the
reference CPU implementation measured on this host; see BASELINE_S
below for the measurement command.  Extra keys report the north-star
metrics from BASELINE.json: candidate (probe, alignment) pairs
evaluated per second and greedy set-cover picks per second.
"""

import json
import sys
import time

# Reference CATCH wall-clock for this exact workload on this host,
# measured 2026-08-19 with:
#   PYTHONPATH=/root/reference python /root/reference/bin/design.py \
#     ebola175.fasta -o ref_175.fasta \
#     -pl 100 -m 2 -l 60 -e 50 --max-num-processes 8
# Host: 2 CPUs (reference pool caps at min(nCPU, 8) = 2 workers).
# Result: 1621 s wall-clock, 163 probes (rc=0).  We emit 159 probes on
# the same input: exhaustive seeding finds strictly more true covers
# than the reference's Monte-Carlo k-mer sampling, so the greedy cover
# needs fewer probes (coverage parity verified in VERDICT round 1).
BASELINE_S = 1621.0
N_GENOMES = 175


def main():
    from catch_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from catch_tpu.utils import seq_io
    from catch_tpu.filters.duplicate import DuplicateFilter
    from catch_tpu.filters.set_cover_filter import SetCoverFilter
    from catch_tpu.designer import ProbeDesigner

    genomes = seq_io.read_genomes_from_fasta(
        "tests/data/zaire_ebolavirus.fasta.gz")[:N_GENOMES]

    t0 = time.time()
    scf = SetCoverFilter(mismatches=2, lcf_thres=60, cover_extension=50)
    filters = [DuplicateFilter(), scf]
    designer = ProbeDesigner([genomes], filters, probe_length=100,
                             probe_stride=50)
    designer.design()
    elapsed = time.time() - t0
    n_probes = len(designer.final_probes)

    stats = getattr(scf, "last_run_stats", {}) or {}
    vs = (BASELINE_S / elapsed) if BASELINE_S else None
    out = {
        "metric": "ebola175_design_e2e_pl100_m2_l60_e50",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
        "n_probes": n_probes,
        "baseline_s": BASELINE_S,
    }
    if stats.get("candidates_evaluated") and stats.get("scan_seconds"):
        out["candidates_per_s"] = int(
            stats["candidates_evaluated"] / stats["scan_seconds"])
    if stats.get("set_cover_picks") and stats.get("solve_seconds"):
        out["set_cover_picks_per_s"] = round(
            stats["set_cover_picks"] / stats["solve_seconds"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
