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

    def estimate_jaccard_dist(self, hA, hB):
        """Estimate Jaccard distance from two sorted signatures
        (reference lsh.py:166-215)."""
        hA_i, hB_i = 0, 0
        intersect_count = 0
        union_count = 0
        while hA_i < len(hA) and hB_i < len(hB):
            if union_count == self.N:
                break
            if hA[hA_i] < hB[hB_i]:
                hA_i += 1
                union_count += 1
            elif hA[hA_i] > hB[hB_i]:
                hB_i += 1
                union_count += 1
            else:
                intersect_count += 1
                union_count += 1
                hA_i += 1
                hB_i += 1
        similarity = float(intersect_count) / union_count
        return 1.0 - similarity


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
