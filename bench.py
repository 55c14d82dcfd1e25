"""End-to-end benchmark: full probe design on the Ebola test corpus.

Runs the complete design pipeline (candidate tiling -> duplicate filter
-> cover scan -> greedy multi-universe set cover) on the 175-genome
Zaire ebolavirus fixture with the reference README's recommended
hybridization model (-pl 100 -m 2 -l 60 -e 50), the same workload as
/root/reference/bin/design.py on the same input.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

vs_baseline is the speedup (baseline_seconds / our_seconds) over the
reference CPU implementation measured on this machine's 8-CPU host
(PYTHONPATH=/root/reference bin/design.py, --max-num-processes 8); see
BASELINE_S below for the measured anchor.
"""

import json
import sys
import time

# Reference CATCH wall-clock for this exact workload on this host
# (8-CPU pool), measured with:
#   time PYTHONPATH=/root/reference python /root/reference/bin/design.py \
#     tests/data/zaire_ebolavirus.fasta.gz -o /tmp/ref.fasta \
#     -pl 100 -m 2 -l 60 -e 50 --max-num-processes 8
BASELINE_S = None  # set after measurement; see bottom of file


def main():
    from catch_tpu.utils import seq_io
    from catch_tpu.filters.candidates import (
        make_candidate_probes_from_sequences)
    from catch_tpu.filters.duplicate import DuplicateFilter
    from catch_tpu.filters.set_cover_filter import SetCoverFilter
    from catch_tpu.designer import ProbeDesigner

    genomes = seq_io.read_genomes_from_fasta(
        "tests/data/zaire_ebolavirus.fasta.gz")

    t0 = time.time()
    filters = [
        DuplicateFilter(),
        SetCoverFilter(mismatches=2, lcf_thres=60, cover_extension=50),
    ]
    designer = ProbeDesigner([genomes], filters, probe_length=100,
                             probe_stride=50)
    designer.design()
    elapsed = time.time() - t0
    n_probes = len(designer.final_probes)

    vs = (BASELINE_S / elapsed) if BASELINE_S else None
    print(json.dumps({
        "metric": "ebola_design_e2e_pl100_m2_l60_e50",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
        "n_probes": n_probes,
    }))


if __name__ == "__main__":
    sys.exit(main())
