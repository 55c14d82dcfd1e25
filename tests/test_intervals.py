"""Tests for catch_tpu.utils.intervals (IntervalSet operations)."""

import numpy as np
import pytest

from catch_tpu.utils.intervals import IntervalSet, merge_overlapping, schedule


def test_merge_overlapping_basic():
    assert merge_overlapping([(1, 5), (3, 7), (9, 12)]) == [(1, 7), (9, 12)]
    assert merge_overlapping([(1, 3), (3, 5)]) == [(1, 5)]
    assert merge_overlapping([]) == []
    assert merge_overlapping([(5, 6)]) == [(5, 6)]
    assert merge_overlapping([(9, 12), (1, 5)]) == [(1, 5), (9, 12)]


def test_intervalset_normalizes():
    s = IntervalSet([(3, 7), (1, 5), (9, 12)])
    assert s.intervals == ((1, 7), (9, 12))
    assert len(s) == 9
    assert s.first_start == 1
    assert s.last_end == 12


def test_intersection_union_difference():
    a = IntervalSet([(1, 5), (10, 20)])
    b = IntervalSet([(3, 12), (18, 25)])
    assert a.intersection(b).intervals == ((3, 5), (10, 12), (18, 20))
    assert a.union(b).intervals == ((1, 25),)
    assert a.difference(b).intervals == ((1, 3), (12, 18))
    assert b.difference(a).intervals == ((5, 10), (20, 25))


def test_empty_ops():
    a = IntervalSet([(1, 5)])
    e = IntervalSet([])
    assert a.intersection(e).intervals == ()
    assert a.union(e).intervals == ((1, 5),)
    assert a.difference(e).intervals == ((1, 5),)
    assert e.difference(a).intervals == ()
    assert len(e) == 0


def test_overlaps_interval():
    a = IntervalSet([(1, 5), (10, 20)])
    assert a.overlaps_interval(4, 6)
    assert a.overlaps_interval(0, 2)
    assert not a.overlaps_interval(5, 10)
    assert a.overlaps_interval(19, 30)
    assert not a.overlaps_interval(20, 30)
    assert not a.overlaps_interval(3, 3)


def _set_from_intervals(ivs):
    out = set()
    for s, e in ivs:
        out.update(range(s, e))
    return out


@pytest.mark.parametrize("seed", range(20))
def test_random_ops_vs_python_sets(seed):
    rng = np.random.RandomState(seed)
    def rand_intervals():
        n = rng.randint(0, 12)
        out = []
        for _ in range(n):
            s = rng.randint(0, 100)
            out.append((s, s + rng.randint(1, 15)))
        return out
    ia, ib = rand_intervals(), rand_intervals()
    a, b = IntervalSet(ia), IntervalSet(ib)
    sa, sb = _set_from_intervals(ia), _set_from_intervals(ib)
    assert _set_from_intervals(a.intersection(b).intervals) == sa & sb
    assert _set_from_intervals(a.union(b).intervals) == sa | sb
    assert _set_from_intervals(a.difference(b).intervals) == sa - sb
    assert len(a) == len(sa)


def test_schedule():
    ivs = [((1, 4), "a"), ((3, 5), "b"), ((5, 9), "c"), ((0, 2), "d")]
    # earliest-finish: d (0,2), a? a starts at 1 < 2 -> skip; b starts 3 >= 2
    # -> b (3,5); c starts 5 >= 5 -> c
    assert schedule(ivs) == ["d", "b", "c"]
    assert schedule([]) == []
