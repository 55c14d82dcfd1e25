"""Real multi-process validation of the multi-host path.

Launches 2 jax.distributed CPU processes on localhost (the coordinator
plumbing of catch_tpu/parallel/distributed.py, exactly as a 2-host TPU
pod run would use it), runs the same small design in both over the
4-device global mesh, and asserts the probe set equals the
single-process run — the contract the reference pins across worker
counts (reference test_set_cover_filter.py:134-175), here across
process counts.
"""

import os
import socket
import subprocess
import sys

_SNIPPET = r"""
import os, sys, hashlib
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
from catch_tpu.parallel import distributed
assert distributed.maybe_initialize(), "distributed init did not run"
import jax
assert jax.process_count() == 2, jax.process_count()
from catch_tpu.parallel import make_mesh
from catch_tpu.utils import seq_io
from catch_tpu.filters.duplicate import DuplicateFilter
from catch_tpu.filters.set_cover_filter import SetCoverFilter
from catch_tpu.designer import ProbeDesigner

mesh = make_mesh()          # all global devices (2 per process)
assert mesh.devices.size == 4, mesh.devices.size
genomes = seq_io.read_genomes_from_fasta(
    "tests/data/zaire_ebolavirus.fasta.gz")[:4]
scf = SetCoverFilter(mismatches=1, lcf_thres=80, cover_extension=20,
                     mesh=mesh)
d = ProbeDesigner([genomes], [DuplicateFilter(), scf],
                  probe_length=80, probe_stride=40)
d.design()
ps = sorted(p.seq_str for p in d.final_probes)
print("HASH", len(ps),
      hashlib.sha224("".join(ps).encode()).hexdigest(), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_design_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith("CATCH_TPU_")}
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # An accelerator-plugin sitecustomize on PYTHONPATH initializes the
    # JAX backend at interpreter start, before jax.distributed can run;
    # give the subprocesses a clean import path.
    base_env["PYTHONPATH"] = repo
    procs = []
    for pid in range(2):
        env = dict(base_env)
        env["CATCH_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CATCH_TPU_NUM_PROCESSES"] = "2"
        env["CATCH_TPU_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _SNIPPET.format(repo=repo)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-4000:]
        lines = [ln for ln in out.splitlines() if ln.startswith("HASH ")]
        assert lines, out
        outs.append(lines[-1])
    assert outs[0] == outs[1], (outs[0], outs[1])

    # Single-process reference (in-process, the suite's 8-device CPU
    # harness; mesh size must not change the probe set)
    import hashlib
    from catch_tpu.utils import seq_io
    from catch_tpu.filters.duplicate import DuplicateFilter
    from catch_tpu.filters.set_cover_filter import SetCoverFilter
    from catch_tpu.designer import ProbeDesigner

    genomes = seq_io.read_genomes_from_fasta(
        "tests/data/zaire_ebolavirus.fasta.gz")[:4]
    scf = SetCoverFilter(mismatches=1, lcf_thres=80, cover_extension=20)
    d = ProbeDesigner([genomes], [DuplicateFilter(), scf],
                      probe_length=80, probe_stride=40)
    d.design()
    ps = sorted(p.seq_str for p in d.final_probes)
    want = "HASH %d %s" % (
        len(ps), hashlib.sha224("".join(ps).encode()).hexdigest())
    assert outs[0] == want, (outs[0], want)
