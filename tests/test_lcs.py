"""Tests for catch_tpu.utils.lcs against brute-force oracles."""

import numpy as np
import pytest

from catch_tpu.utils import lcs


def brute_k_lcf_len(a, b, k):
    """Brute force: max length of common substring with <= k mismatches."""
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            mism = 0
            l = 0
            while i + l < len(a) and j + l < len(b):
                if a[i + l] != b[j + l]:
                    mism += 1
                    if mism > k:
                        break
                l += 1
                best = max(best, l)
    return best


def test_k_lcf_simple():
    assert lcs.k_lcf("ABCDEF", "ABCDEF", 0) == (6, 0, 0)
    l, sa, sb = lcs.k_lcf("XXABCDYY", "ZZABCDWW", 0)
    assert (l, sa, sb) == (4, 2, 2)
    l, _, _ = lcs.k_lcf("AAAA", "TTTT", 0)
    assert l == 0
    l, _, _ = lcs.k_lcf("AAAA", "TTTT", 2)
    assert l == 2


def test_k_lcf_with_mismatches():
    a = "ACGTACGTAC"
    b = "ACGAACGTAC"  # one mismatch at index 3
    assert lcs.k_lcf(a, b, 0)[0] == 6
    assert lcs.k_lcf(a, b, 1) == (10, 0, 0)


@pytest.mark.parametrize("seed", range(15))
def test_k_lcf_random_vs_brute(seed):
    rng = np.random.RandomState(seed)
    alpha = "ACGT"
    a = "".join(rng.choice(list(alpha), rng.randint(1, 25)))
    b = "".join(rng.choice(list(alpha), rng.randint(1, 25)))
    for k in (0, 1, 2, 3):
        got = lcs.k_lcf(a, b, k)
        want = brute_k_lcf_len(a, b, k)
        assert got[0] == want, (a, b, k)
        # returned positions must be consistent with the length
        l, sa, sb = got
        if l > 0:
            mism = sum(1 for i in range(l) if a[sa + i] != b[sb + i])
            assert mism <= k


def brute_anchor(a, b, s, e, k):
    """Brute force anchored LCS: longest window containing [s, e)."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    best = -1
    best_start = -1
    for i in range(0, s + 1):
        for j in range(e, n + 1):
            mism = sum(1 for t in range(i, j) if a[t] != b[t])
            if mism <= k and j - i > best:
                best = j - i
                best_start = i
    return best, best_start


@pytest.mark.parametrize("seed", range(15))
def test_anchor_random_vs_brute(seed):
    rng = np.random.RandomState(seed)
    alpha = "ACGT"
    n = rng.randint(8, 30)
    a = "".join(rng.choice(list(alpha), n))
    # b: copy of a with random mutations outside an anchor
    b = list(a)
    s = rng.randint(0, n - 4)
    e = s + rng.randint(2, min(5, n - s) + 1)
    for i in range(n):
        if not (s <= i < e) and rng.rand() < 0.3:
            b[i] = alpha[(alpha.index(b[i]) + 1) % 4]
    b = "".join(b)
    for k in (0, 1, 2, 3):
        gl, gs = lcs.k_lcf_around_anchor(a, b, s, e, k)
        wl, _ = brute_anchor(a, b, s, e, k)
        assert gl == wl, (a, b, s, e, k)
        # verify mismatches within the returned window
        mism = sum(1 for t in range(gs, gs + gl) if a[t] != b[t])
        assert mism <= k
        assert gs <= s and gs + gl >= e


def test_anchor_raises_on_bad_anchor():
    with pytest.raises(ValueError):
        lcs.k_lcf_around_anchor("AAAA", "TTTT", 1, 3, 0)


def test_anchor_truncates_longer_seq():
    # When a is longer than b, the end of a is ignored
    l, s = lcs.k_lcf_around_anchor("ACGTACGT", "ACGT", 0, 4, 0)
    assert (l, s) == (4, 0)
