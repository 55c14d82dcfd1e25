"""Sharded probe-vs-sequence match counting over a device mesh.

Multi-device form of the phase-1 prefilter in catch_tpu.ops.cover: the
alignment axis (one alignment per possible probe placement against the
target sequence) is sharded across the mesh; the probe tensor is
replicated.  Each device one-hot-encodes its alignment windows and
match-counts them against every probe with a single bf16 einsum on its
MXU.  No collectives are needed — alignments are independent — so this
is a pure data-parallel (sequence-parallel) decomposition, the TPU
equivalent of the reference's per-range process fan-out
(/root/reference/catch/probe.py:1230-1257), without its shared-memory
k-mer map (each device holds the full probe tensor in HBM).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["sharded_match_counts", "match_counts_kernel"]


def match_counts_kernel(win_codes, probe_codes, alphabet_size):
    """Match counts between alignment windows and probes.

    Args:
        win_codes: (NA, L) uint8 — sequence codes at each alignment
            (0 = PAD, never matches)
        probe_codes: (Pn, L) uint8 probe codes
        alphabet_size: static alphabet size A

    Returns:
        (NA, Pn) int32 match counts
    """
    win_oh = jax.nn.one_hot(
        win_codes.astype(jnp.int32) - 1, alphabet_size, dtype=jnp.bfloat16)
    probes_oh = jax.nn.one_hot(
        probe_codes.astype(jnp.int32) - 1, alphabet_size, dtype=jnp.bfloat16)
    counts = jnp.einsum("wla,pla->wp", win_oh, probes_oh,
                        preferred_element_type=jnp.float32)
    return counts.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis_name", "A", "Lmax", "na_loc"))
def _sharded_counts_jit(seq_padded, a0s, probe_codes, *, mesh, axis_name,
                        A, Lmax, na_loc):
    def body(seq_padded_r, a0, probe_codes_r):
        a0 = a0[0]
        a = a0 + jnp.arange(na_loc, dtype=jnp.int32)
        j = jnp.arange(Lmax, dtype=jnp.int32)
        win = seq_padded_r[a[:, None] + j[None, :] + Lmax]
        return match_counts_kernel(win, probe_codes_r, A)

    counts = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(seq_padded, a0s, probe_codes)
    return counts


def sharded_match_counts(seq_codes, probe_codes, mesh, axis_name="d"):
    """Match-count every alignment of every probe against a sequence.

    Args:
        seq_codes: (n,) uint8 sequence codes (1..A; built by
            catch_tpu.ops.encode)
        probe_codes: (Pn, Lmax) uint8 probe codes (0-padded)
        mesh: 1-D jax.sharding.Mesh

    Returns:
        (num_align, Pn) int32 match counts, where alignment row r
        corresponds to probe position 0 at sequence position
        r - (Lmax - 1).
    """
    n = len(seq_codes)
    Pn, Lmax = probe_codes.shape
    n_shards = mesh.devices.size
    num_align = n + Lmax - 1
    na_loc = -(-num_align // n_shards)
    padded = np.zeros(n_shards * na_loc + 2 * Lmax, dtype=np.uint8)
    padded[Lmax:Lmax + n] = seq_codes
    a0s = (np.arange(n_shards, dtype=np.int32) * na_loc) - (Lmax - 1)
    # Alphabet size: codes are 1..A
    A = int(max(int(seq_codes.max(initial=0)),
                int(probe_codes.max(initial=0)), 1))
    counts = _sharded_counts_jit(
        jnp.asarray(padded), jnp.asarray(a0s), jnp.asarray(probe_codes),
        mesh=mesh, axis_name=axis_name, A=A, Lmax=Lmax, na_loc=na_loc)
    return np.asarray(counts)[:num_align]
