"""catch-tpu: a TPU-native probe-design engine.

A from-scratch, TPU-first (JAX/XLA/pjit) framework with the
capabilities of broadinstitute/catch: design of compact DNA oligo probe
sets that guarantee configurable coverage of diverse input genomes under
a mismatch/longest-common-substring hybridization model, minimized via
greedy weighted multi-universe set cover.

Architecture (vs. the CPU reference at /root/reference):

- The reference's k-mer hash map + per-candidate anchored-LCS scan
  (reference catch/probe.py:507-1271) is replaced by a device-resident
  pipeline (catch_tpu/ops/scan_instance): a stride-sampled exact k-mer
  join against a dense probe seed table, batched maximal-window
  verification, and a segmented-scan interval merge that assembles the
  set-cover instance without moving candidates or spans to the host.
  Seeding is exhaustive (every k-run of exact matches counts as a
  seed), making the engine deterministic with recall >= the
  reference's Monte-Carlo k-mer sampling.
- The reference's greedy multi-universe set cover
  (reference catch/utils/set_cover.py:147) runs as batched greedy
  steps on device with boundary-indexed segment sums
  (catch_tpu/ops/set_cover), with a sharded path merging
  per-iteration scores with jax.lax.psum across a device mesh.
- The reference's fork-based multiprocessing pools are replaced by
  jax.sharding over a Mesh, single- or multi-host
  (catch_tpu/parallel/).
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_xla_cache():
    """Point JAX at a persistent compilation cache.

    The greedy set-cover while-loop and the cover-scan tiles compile
    once per power-of-two shape bucket; caching the executables across
    processes removes minutes of XLA compile time from every run after
    the first.  Opt out with CATCH_TPU_NO_XLA_CACHE=1; an explicit
    JAX_COMPILATION_CACHE_DIR is respected.
    """
    if _os.environ.get("CATCH_TPU_NO_XLA_CACHE"):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "catch_tpu", "xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_xla_cache()

from catch_tpu.genome import Genome
from catch_tpu.probe import Probe
