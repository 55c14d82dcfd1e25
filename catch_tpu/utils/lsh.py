"""Locality-sensitive hashing machinery.

Capability parity with the reference
(/root/reference/catch/utils/lsh.py:16-321): HammingDistanceFamily
(random coordinate sampling), MinHashFamily (universal hash over k-mers,
signature = N smallest values sorted, Jaccard estimation by merging
sorted signatures), HashConcatenation (AND construction), and
NearNeighborLookup (OR construction with L tables chosen from the
desired reporting probability, exact distance re-check on query).

Design differences vs. the reference:
- Hash functions operate on plain strings (callers pass probe
  sequences); k-mer hashing is vectorized with numpy (the k-mer matrix
  is hashed in one shot with a polynomial rolling scheme) instead of
  per-k-mer md5 calls.
- Randomness comes from an explicit ``rng`` (numpy Generator) so that
  probe-set outputs are reproducible; the reference draws from the
  global ``random`` module and is not reproducible across runs.
"""

from collections import defaultdict
import math

import numpy as np

__all__ = ["HammingDistanceFamily", "MinHashFamily", "HashConcatenation",
           "NearNeighborLookup"]

_MERSENNE_P = 2**31 - 1


class HammingDistanceFamily:
    """LSH family for Hamming distance: hash = random coordinate."""

    def __init__(self, dim, rng=None):
        self.dim = dim
        self._rng = rng if rng is not None else np.random.default_rng(0)

    def make_h(self):
        i = int(self._rng.integers(0, self.dim))

        def h(x):
            assert len(x) == self.dim
            return x[i]
        return h

    def P1(self, dist):
        """Lower bound on collision probability within ``dist``."""
        return 1.0 - float(dist) / float(self.dim)


def _kmer_int_codes(s, k):
    """All k-mers of s as integers (base-256 polynomial mod 2^61-1).

    Deterministic and vectorized; the role of the reference's md5 k-mer
    hash (lsh.py:105-111) is to give a stable integer per k-mer, which
    this does directly.
    """
    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    P = np.uint64(1000003)
    MOD = np.uint64(_MERSENNE_P)
    # Rolling polynomial over a window of k bytes; intermediate values
    # stay below 2^51 so uint64 arithmetic never overflows
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = (acc * P + b[j:j + n]) % MOD
    return acc


class MinHashFamily:
    """MinHash family over k-mers: signature = N smallest hash values."""

    def __init__(self, kmer_size, N=1, use_fast_str_hash=False, rng=None):
        self.kmer_size = kmer_size
        self.N = N
        # use_fast_str_hash accepted for API parity; hashing here is
        # always deterministic and vectorized
        self._rng = rng if rng is not None else np.random.default_rng(0)

    def make_h(self):
        p = _MERSENNE_P
        a = int(self._rng.integers(1, p + 1))
        b = int(self._rng.integers(0, p + 1))

        def h(s):
            assert self.kmer_size <= len(s)
            codes = _kmer_int_codes(s, self.kmer_size)
            vals = ((np.uint64(a) * (codes % np.uint64(p))
                     + np.uint64(b)) % np.uint64(p))
            num_kmers = len(vals)
            if num_kmers < self.N:
                # Repeat k-mers until at least N hashes exist
                # (reference lsh.py:137-144 keeps yielding)
                reps = -(-self.N // num_kmers)
                vals = np.tile(vals, reps)[:max(self.N, num_kmers)]
            if self.N == 1:
                return (int(vals.min()),)
            smallest = np.sort(np.partition(vals, self.N - 1)[:self.N])
            return tuple(int(v) for v in smallest)
        return h

    def P1(self, dist):
        """Collision probability = Jaccard similarity = 1 - dist."""
        return 1.0 - dist

    def estimate_jaccard_dist(self, sig_a, sig_b):
        """Estimate Jaccard distance from two sorted signatures.

        The estimator walks the merged multiset of the two signatures
        in value order, pairing equal values (intersection) and
        counting everything once (union), stopping after N union
        elements or when either signature is exhausted; the estimate is
        1 - |intersection|/|union| over the walked prefix.  Here the
        walk is evaluated in closed form over value blocks: per
        distinct value, min(count_a, count_b) paired elements come
        first, the |count_a - count_b| unpaired ones count only while
        the other signature still has larger values left, and the
        N-truncation slices block-wise with pairs consumed first.
        """
        a = np.asarray(sig_a, dtype=np.int64)
        b = np.asarray(sig_b, dtype=np.int64)
        va, ca = np.unique(a, return_counts=True)
        vb, cb = np.unique(b, return_counts=True)
        vals = np.union1d(va, vb)
        fa = np.zeros(len(vals), dtype=np.int64)
        fb = np.zeros(len(vals), dtype=np.int64)
        fa[np.searchsorted(vals, va)] = ca
        fb[np.searchsorted(vals, vb)] = cb
        pairs = np.minimum(fa, fb)
        singles = np.maximum(fa, fb) - pairs
        # The walk covers value blocks up to the smaller signature
        # maximum; unpaired elements of one signature count only while
        # the other side has larger values remaining.
        lim = min(int(va[-1]), int(vb[-1]))
        walked = vals <= lim
        other_max = np.where(fa > fb, int(vb[-1]), int(va[-1]))
        singles_eff = np.where(walked & (vals < other_max), singles, 0)
        pairs_eff = np.where(walked, pairs, 0)
        block = pairs_eff + singles_eff
        before = np.concatenate(([0], np.cumsum(block)[:-1]))
        room = np.clip(self.N - before, 0, None)
        intersect_count = int(np.minimum(pairs_eff, room).sum())
        union_count = int(np.minimum(block, room).sum())
        return 1.0 - float(intersect_count) / union_count


class HashConcatenation:
    """Concatenated hash functions (AND construction)."""

    def __init__(self, family, k):
        self.family = family
        self.k = k
        self.hs = [family.make_h() for _ in range(k)]

    def g(self, x):
        return tuple(h(x) for h in self.hs)


class NearNeighborLookup:
    """R-near neighbor reporting (OR construction over L tables)."""

    def __init__(self, family, k, dist_thres, dist_fn, reporting_prob):
        """L = ceil(log_{1-P1^k}(1 - reporting_prob)) tables
        (reference lsh.py:270-277)."""
        self.family = family
        self.k = k
        self.dist_thres = dist_thres
        self.dist_fn = dist_fn

        P1 = self.family.P1(dist_thres)
        if P1 == 1.0:
            self.num_tables = 1
        else:
            self.num_tables = int(math.ceil(
                math.log(1.0 - reporting_prob, 1.0 - math.pow(P1, k))))

        self.hashtables = []
        self.hashtables_g = []
        for _ in range(self.num_tables):
            g = HashConcatenation(self.family, self.k)
            self.hashtables.append(defaultdict(list))
            self.hashtables_g.append(g)

    def add(self, pts):
        for j in range(self.num_tables):
            ht = self.hashtables[j]
            g = self.hashtables_g[j].g
            for p in pts:
                ht[g(p)].append(p)

    def query(self, q):
        """Return stored points within dist_thres of q (validated by
        dist_fn; may miss some, never reports a non-neighbor)."""
        neighbors = set()
        for j in range(self.num_tables):
            ht = self.hashtables[j]
            g = self.hashtables_g[j].g
            for p in ht[g(q)]:
                if self.dist_fn(q, p) <= self.dist_thres:
                    neighbors.add(p)
        return neighbors
