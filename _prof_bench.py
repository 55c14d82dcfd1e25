import time, json
from catch_tpu.utils import seq_io
from catch_tpu.filters.duplicate import DuplicateFilter
from catch_tpu.filters.set_cover_filter import SetCoverFilter
from catch_tpu.designer import ProbeDesigner

genomes = seq_io.read_genomes_from_fasta("tests/data/zaire_ebolavirus.fasta.gz")[:175]
t0 = time.time()
scf = SetCoverFilter(mismatches=2, lcf_thres=60, cover_extension=50)
filters = [DuplicateFilter(), scf]
designer = ProbeDesigner([genomes], filters, probe_length=100, probe_stride=50)
designer.design()
elapsed = time.time() - t0
print(json.dumps({"elapsed": elapsed, "n_probes": len(designer.final_probes), "stats": scf.last_run_stats}))
