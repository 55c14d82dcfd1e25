"""catch-tpu: a TPU-native probe-design engine.

A from-scratch, TPU-first (JAX/XLA/Pallas/pjit) framework with the
capabilities of broadinstitute/catch: design of compact DNA oligo probe
sets that guarantee configurable coverage of diverse input genomes under
a mismatch/longest-common-substring hybridization model, minimized via
greedy weighted multi-universe set cover.

Architecture (vs. the CPU reference at /root/reference):

- The reference's k-mer hash map + per-candidate anchored-LCS scan
  (reference catch/probe.py:507-1271) is replaced by a dense batched
  "match-count" convolution on the MXU over one-hot encoded sequences
  plus a vectorized maximal-window verification phase
  (catch_tpu/ops/cover.py).  Seeding is exhaustive (every k-run of
  exact matches counts as a seed), making the engine deterministic with
  recall >= the reference's Monte-Carlo k-mer sampling.
- The reference's greedy multi-universe set cover
  (reference catch/utils/set_cover.py:147) becomes an iterative
  masked argmax over coverage arrays (catch_tpu/ops/set_cover.py),
  with a sharded device path merging per-iteration scores with
  jax.lax.psum across a device mesh.
- The reference's fork-based multiprocessing pools are replaced by
  jax.sharding over a Mesh (catch_tpu/parallel/).
"""

__version__ = "0.1.0"

from catch_tpu.genome import Genome
from catch_tpu.probe import Probe
