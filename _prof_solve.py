import time, numpy as np, pickle
from catch_tpu.utils import seq_io
from catch_tpu.probe import Probe
from catch_tpu.filters.candidates import make_candidate_probes_from_sequences
from catch_tpu.filters.duplicate import DuplicateFilter
from catch_tpu.filters.set_cover_filter import SetCoverFilter
from catch_tpu.ops import set_cover

genomes = seq_io.read_genomes_from_fasta("tests/data/zaire_ebolavirus.fasta.gz")[:175]
seqs = [s for g in genomes for s in g.seqs]
cands = make_candidate_probes_from_sequences(seqs, probe_length=100, probe_stride=50)
cands = DuplicateFilter()._filter(cands)
print("n candidates:", len(cands))

scf = SetCoverFilter(mismatches=2, lcf_thres=60, cover_extension=50)
t0=time.time()
set_ids, univ_ids, starts, ends = scf._make_cover_arrays(cands, genomes)
t_scan = time.time()-t0
print(f"scan: {t_scan:.2f}s, spans={len(set_ids)}")
t0=time.time()
inst = set_cover.build_instance_from_cover_arrays(
    set_ids, univ_ids, starts, ends, n_sets=len(cands), n_universes=len(genomes),
    universe_p=np.ones(len(genomes)), ranks=None)
print(f"build_instance: {time.time()-t0:.2f}s  u_len={inst.u_len} M={len(inst.ivl_start)} n_pairs={len(inst.set_of_pair)} n_sets={inst.n_sets}")
with open("/tmp/inst.pkl","wb") as f:
    pickle.dump(inst.__dict__, f)
t0=time.time()
chosen = set_cover._solve_device_steps(inst)
print(f"solve_device_steps (cold): {time.time()-t0:.2f}s picks={len(chosen)}")
t0=time.time()
chosen = set_cover._solve_device_steps(inst)
print(f"solve_device_steps (warm): {time.time()-t0:.2f}s picks={len(chosen)}")
