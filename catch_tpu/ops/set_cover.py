"""Greedy weighted partial multi-universe set cover — TPU-native.

Capability parity with the reference solver
(/root/reference/catch/utils/set_cover.py:14-615): ``approx`` (classic
weighted partial cover) and ``approx_multiuniverse`` (per-universe
fractional coverage, per-set integer rank tiers, costs), with the same
dict-based host API accepting sets, arrays, or interval sets.

TPU-first design (vs. the reference's per-set Python loops with
memoized intersection counts and a "last minimum ratio" reuse
heuristic, which are CPU-isms):

- Every universe occupies a contiguous slice of one global position
  axis.  Each candidate set is a list of half-open intervals on that
  axis (arbitrary element values are densified per universe on the
  host first, so runs of consecutive elements become intervals).
- The greedy loop runs entirely on device as one ``lax.while_loop``:
  per iteration, the number of still-needed positions each set would
  newly cover is computed for *all* sets at once via a prefix sum of
  the uncovered indicator, two gathers per interval, and two segment
  sums (interval -> (set, universe) pair -> set, with the per-universe
  "no need to cover more than what's left" cap applied at the pair
  level, mirroring reference :424-426).  The pick is a masked argmin
  of cost/score; rank tiers advance only when no set of the current
  rank has positive score (reference :497-510, :522-526).
- Tie-breaking is deterministic: the lowest set id among minimal
  ratios wins (``jnp.argmin`` returns the first minimum).  The
  reference's tie order is Python-set iteration order and therefore
  unspecified; outputs agree wherever the reference's choice is
  well-defined.

The same step function is reused by the sharded multi-device solver in
catch_tpu/parallel/ (positions sharded over a mesh; per-set scores
merged with lax.psum).
"""

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp

from catch_tpu.utils import intervals as intervals_mod
from catch_tpu.utils.profiling import maybe_trace

logger = logging.getLogger(__name__)

__all__ = ["approx", "approx_multiuniverse", "SetCoverInstance",
           "solve_instance"]

# Instances below this many total elements (position axis + intervals)
# are solved by the exact numpy mirror of the device step; above it,
# the lazy-greedy solver (_solve_host_lazy) wins.  Measured on the
# ebola175 bench instance (u_len 3.3M / M 3.2M): ~240 ms/pick for the
# full-rescan host mirror, ~400 ms/pick for the batched-step device
# solver (each pick rescans all intervals; TPU scatters dominate), vs
# ~1 ms/pick lazy.  Greedy set cover is inherently sequential with
# tiny per-pick touched state, so lazy evaluation on the host is the
# production path; the device solvers remain for parity validation and
# for instances whose per-pick work is genuinely device-scale (see
# solve_instance).  The threshold is small: the full-rescan mirror
# costs O(picks x (positions + intervals)) while the lazy solver's
# setup is one O(n log n) pass with ~per-pick-touched work after, so
# lazy wins for anything beyond unit-test scale (measured: a 1.7 Mbp
# 90-genome group solved in 1.67 s by full-rescan vs 0.1 s lazy).
_HOST_SOLVE_MAX_ELEMS = 1 << 16

# Greedy steps executed per device dispatch (one lax.scan): amortizes
# the host<->device round trip (which rides a network tunnel under
# axon) without growing compile time, since scan compiles its body
# once.  Overshoot past the stop condition is free: steps after stop
# are no-ops by construction.
_STEPS_PER_DISPATCH = 64


def _next_pow2(x):
    return 1 if x <= 1 else 1 << int(x - 1).bit_length()


class SetCoverInstance:
    """A canonicalized multi-universe set-cover instance (flat arrays).

    Attributes:
        n_sets: number of candidate sets S (ids 0..S-1)
        n_universes: number of universes
        u_size: int64[nU] universe sizes |U_u| (count of distinct
            elements in the union of all sets for that universe)
        can_uncover: int64[nU] floor(|U_u| - p_u * |U_u|)
        ivl_start, ivl_end: int64[M] global half-open interval bounds
        pair_of_ivl: int32[M] dense (set, universe)-pair id per interval
        set_of_pair, univ_of_pair: int32[PAIRS]
        cost: float32[S]
        rank_idx: int32[S] index into the sorted distinct rank values
        n_rank_vals: number of distinct ranks
        u_len: total length of the global position axis
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _runs_to_intervals(sorted_vals):
    """Convert a sorted int array to half-open intervals of consecutive runs."""
    if len(sorted_vals) == 0:
        return np.empty((0, 2), dtype=np.int64)
    breaks = np.flatnonzero(np.diff(sorted_vals) != 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [len(sorted_vals) - 1]))
    return np.stack([sorted_vals[starts], sorted_vals[ends] + 1], axis=1)


def build_instance(sets, costs=None, universe_p=None, ranks=None,
                   use_intervalsets=False):
    """Canonicalize the reference-style dict inputs into flat arrays.

    Args:
        sets: dict set_id -> dict universe_id -> (set | array | list |
            IntervalSet | single (start, end) tuple)
        costs / universe_p / ranks: as in the reference API
        use_intervalsets: values are IntervalSets / single-interval
            tuples over ints; their coordinates are used directly
            (per-universe, offset to the universe's global slice)

    Returns:
        (instance, set_id_list): instance arrays + original set ids in
        dense order (sorted for determinism).
    """
    set_id_list = sorted(sets.keys(), key=_sort_key)
    universe_ids = set()
    for sbu in sets.values():
        universe_ids.update(sbu.keys())
    universe_id_list = sorted(universe_ids, key=_sort_key)
    u_index = {u: i for i, u in enumerate(universe_id_list)}
    nU = len(universe_id_list)

    if costs is None:
        cost = np.ones(len(set_id_list), dtype=np.float32)
    else:
        for c in costs.values():
            if c < 0:
                raise ValueError("All costs must be nonnegative")
        for sid in set_id_list:
            if sid not in costs:
                raise ValueError(f"costs is missing a value for set {sid}")
        cost = np.array([costs[sid] for sid in set_id_list], dtype=np.float32)

    if ranks is None:
        rank_arr = np.ones(len(set_id_list), dtype=np.int64)
    else:
        for sid in set_id_list:
            if sid not in ranks:
                raise ValueError(f"ranks is missing a value for set {sid}")
        rank_arr = np.array([ranks[sid] for sid in set_id_list],
                            dtype=np.int64)
    rank_vals = np.unique(rank_arr)
    rank_idx = np.searchsorted(rank_vals, rank_arr).astype(np.int32)

    # Per-universe interval lists in local (within-universe) coordinates.
    per_set_ivls = []  # list of (set_idx, univ_idx, (k,2) local intervals)
    if use_intervalsets:
        # Coordinates are ints used directly; per universe record min/max
        # to build a compact global slice.
        u_min = np.full(nU, np.iinfo(np.int64).max, dtype=np.int64)
        u_max = np.full(nU, np.iinfo(np.int64).min, dtype=np.int64)
        for si, sid in enumerate(set_id_list):
            for uid, s in sets[sid].items():
                ui = u_index[uid]
                if isinstance(s, tuple):
                    arr = np.array([s], dtype=np.int64)
                else:
                    arr = np.asarray(
                        [list(i) for i in s.intervals], dtype=np.int64
                    ).reshape(-1, 2)
                if arr.shape[0] == 0:
                    continue
                u_min[ui] = min(u_min[ui], int(arr[:, 0].min()))
                u_max[ui] = max(u_max[ui], int(arr[:, 1].max()))
                per_set_ivls.append((si, ui, arr))
        base = np.where(u_min > u_max, 0, u_min)
        span = np.maximum(u_max - base, 0)
        per_set_ivls = [(si, ui, a - base[ui]) for (si, ui, a) in per_set_ivls]
        u_span = span
    else:
        # Arbitrary hashable elements: densify per universe by sorted
        # element order so consecutive values form intervals.
        u_elements = [dict() for _ in range(nU)]
        collected = []
        for si, sid in enumerate(set_id_list):
            for uid, s in sets[sid].items():
                ui = u_index[uid]
                vals = list(s)
                for v in vals:
                    u_elements[ui][v] = None
                collected.append((si, ui, vals))
        u_rank = []
        for ui in range(nU):
            ordered = sorted(u_elements[ui].keys(), key=_sort_key)
            u_rank.append({v: i for i, v in enumerate(ordered)})
        u_span = np.array([len(r) for r in u_rank], dtype=np.int64)
        for si, ui, vals in collected:
            if not vals:
                continue
            dense = np.unique(
                np.array([u_rank[ui][v] for v in vals], dtype=np.int64))
            per_set_ivls.append((si, ui, _runs_to_intervals(dense)))

    offsets = np.zeros(nU + 1, dtype=np.int64)
    np.cumsum(u_span, out=offsets[1:])
    u_len = int(offsets[-1])

    # Merge intervals per (set, universe) and flatten with dense pair ids.
    pair_key = {}
    set_of_pair, univ_of_pair = [], []
    ivl_start, ivl_end, pair_of_ivl = [], [], []
    for si, ui, arr in per_set_ivls:
        if arr.shape[0] == 0:
            continue
        merged = intervals_mod.merge_overlapping(
            [(int(a), int(b)) for a, b in arr])
        key = (si, ui)
        if key not in pair_key:
            pair_key[key] = len(set_of_pair)
            set_of_pair.append(si)
            univ_of_pair.append(ui)
        pid = pair_key[key]
        for a, b in merged:
            ivl_start.append(a + offsets[ui])
            ivl_end.append(b + offsets[ui])
            pair_of_ivl.append(pid)

    ivl_start = np.array(ivl_start, dtype=np.int64)
    ivl_end = np.array(ivl_end, dtype=np.int64)
    pair_of_ivl = np.array(pair_of_ivl, dtype=np.int32)
    set_of_pair = np.array(set_of_pair, dtype=np.int32)
    univ_of_pair = np.array(univ_of_pair, dtype=np.int32)

    # Universe sizes = number of elements in the union of all intervals
    # per universe (for intervalsets mode the span may exceed the union).
    u_size = np.zeros(nU, dtype=np.int64)
    if len(ivl_start):
        in_universe = _union_indicator(ivl_start, ivl_end, u_len)
        pos_univ = np.searchsorted(offsets, np.arange(u_len), side="right") - 1
        u_size = np.bincount(pos_univ, weights=in_universe,
                             minlength=nU).astype(np.int64)

    if universe_p is None:
        p_arr = np.ones(nU, dtype=np.float64)
    else:
        for p in universe_p.values():
            if p < 0 or p > 1:
                raise ValueError(
                    "The coverage fraction (p) of each universe must be "
                    "in [0,1]")
        for uid in universe_id_list:
            if uid not in universe_p:
                raise ValueError(
                    f"universe_p is missing a value for universe {uid}")
        p_arr = np.array([universe_p[uid] for uid in universe_id_list],
                         dtype=np.float64)
    # Reference floor semantics: int(len - p*len)
    # (/root/reference/catch/utils/set_cover.py:362-373)
    can_uncover = (u_size - p_arr * u_size).astype(np.int64)

    inst = SetCoverInstance(
        n_sets=len(set_id_list), n_universes=nU, u_size=u_size,
        can_uncover=can_uncover, ivl_start=ivl_start, ivl_end=ivl_end,
        pair_of_ivl=pair_of_ivl, set_of_pair=set_of_pair,
        univ_of_pair=univ_of_pair, cost=cost, rank_idx=rank_idx,
        n_rank_vals=len(rank_vals), u_len=u_len,
        pos_univ_offsets=offsets)
    return inst, set_id_list


def _sort_key(x):
    """Deterministic ordering for possibly-mixed-type hashables."""
    return (type(x).__name__, x if isinstance(x, (int, float, str, tuple))
            else repr(x))


def _union_indicator(starts, ends, n):
    delta = np.zeros(n + 1, dtype=np.int64)
    np.add.at(delta, starts, 1)
    np.add.at(delta, ends, -1)
    return (np.cumsum(delta[:n]) > 0).astype(np.int64)


# ----------------------------------------------------------------------
# Device solver
# ----------------------------------------------------------------------

def _greedy_core(core, const):
    """One greedy iteration on the core state; shared by every solver.

    core: (covered[U] bool, len_u[nU] i32, in_cover[S] bool,
           cur_rank i32, stop bool)
    const: dict of instance arrays (device-resident).  Padded entries
    (dummy sets / pairs / intervals / universes) are inert: padded
    intervals are empty, padded universes have size 0, padded sets have
    rank index n_rank_vals (never eligible).

    Returns (new_core, chosen, pick).  Steps executed after `stop`
    latches are no-ops (pick stays False and the state is unchanged),
    so batching a fixed number of steps per dispatch is safe.
    """
    covered, len_u, in_cover, cur_rank, stop = core
    need_u = jnp.maximum(len_u - const["can_uncover"], 0)
    active = jnp.any(need_u > 0)

    uncov = (~covered).astype(jnp.int32)
    prefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(uncov)])
    new_ivl = prefix[const["ivl_end"]] - prefix[const["ivl_start"]]
    pair_new = jax.ops.segment_sum(
        new_ivl, const["pair_of_ivl"], num_segments=const["n_pairs"])
    pair_capped = jnp.minimum(pair_new, need_u[const["univ_of_pair"]])
    score = jax.ops.segment_sum(
        pair_capped, const["set_of_pair"], num_segments=const["n_sets"])

    elig = ((~in_cover) & (const["rank_idx"] == cur_rank) & (score > 0))
    ratio = jnp.where(elig, const["cost"] / score.astype(jnp.float32),
                      jnp.inf)
    any_elig = jnp.any(elig)
    chosen = jnp.argmin(ratio).astype(jnp.int32)

    pick = active & any_elig
    adv = active & ~any_elig
    new_stop = (~active) | (adv & (cur_rank + 1 >= const["n_rank_vals"]))
    cur_rank = cur_rank + adv.astype(jnp.int32)

    # Coverage update for the chosen set (no-op when not picking)
    w = ((const["set_of_pair"][const["pair_of_ivl"]] == chosen)
         & pick).astype(jnp.int32)
    U = covered.shape[0]
    delta = jnp.zeros((U + 1,), jnp.int32)
    delta = delta.at[const["ivl_start"]].add(w)
    delta = delta.at[const["ivl_end"]].add(-w)
    chosen_cov = jnp.cumsum(delta[:U]) > 0
    covered = covered | chosen_cov

    dec = jax.ops.segment_sum(
        jnp.where(const["set_of_pair"] == chosen, pair_new, 0),
        const["univ_of_pair"], num_segments=const["n_universes"])
    len_u = len_u - jnp.where(pick, dec, 0)

    in_cover = in_cover.at[chosen].set(in_cover[chosen] | pick)
    return ((covered, len_u, in_cover, cur_rank, new_stop), chosen, pick)


def _greedy_step(state, const):
    """While-loop form of the greedy iteration (keeps a pick-order array
    in the carried state; used by the single-dispatch while_loop solver).

    state: (covered[U] bool, len_u[nU] i32, in_cover[S] bool,
            order[S] i32, n_chosen i32, cur_rank i32, stop bool)
    """
    covered, len_u, in_cover, order, n_chosen, cur_rank, stop = state
    core, chosen, pick = _greedy_core(
        (covered, len_u, in_cover, cur_rank, stop), const)
    covered, len_u, in_cover, cur_rank, new_stop = core
    order = order.at[n_chosen].set(
        jnp.where(pick, chosen, order[n_chosen]))
    n_chosen = n_chosen + pick.astype(jnp.int32)
    return (covered, len_u, in_cover, order, n_chosen, cur_rank, new_stop)


def _solve_host(inst):
    """Exact numpy mirror of the device greedy loop (same dtypes and
    tie-breaking), for small instances where XLA compiles dominate."""
    U = inst.u_len
    M = len(inst.ivl_start)
    nP = len(inst.set_of_pair)
    S = inst.n_sets
    nU = inst.n_universes
    starts = inst.ivl_start.astype(np.int64)
    ends = inst.ivl_end.astype(np.int64)
    pair_of_ivl = inst.pair_of_ivl
    set_of_pair = inst.set_of_pair
    univ_of_pair = inst.univ_of_pair
    cost = inst.cost
    rank_idx = inst.rank_idx
    can_uncover = inst.can_uncover.astype(np.int64)

    covered = ~(_union_indicator(starts, ends, U).astype(bool))
    len_u = inst.u_size.astype(np.int64).copy()
    in_cover = np.zeros(S, dtype=bool)
    order = []
    cur_rank = 0
    while True:
        need_u = np.maximum(len_u - can_uncover, 0)
        if not np.any(need_u > 0):
            break
        prefix = np.zeros(U + 1, dtype=np.int64)
        np.cumsum(~covered, out=prefix[1:])
        new_ivl = prefix[ends] - prefix[starts]
        pair_new = np.bincount(pair_of_ivl, weights=new_ivl,
                               minlength=nP).astype(np.int64)
        pair_capped = np.minimum(pair_new, need_u[univ_of_pair])
        score = np.bincount(set_of_pair, weights=pair_capped,
                            minlength=S).astype(np.int64)
        elig = (~in_cover) & (rank_idx == cur_rank) & (score > 0)
        if not np.any(elig):
            cur_rank += 1
            if cur_rank >= inst.n_rank_vals:
                break
            continue
        ratio = np.where(
            elig,
            cost.astype(np.float32)
            / np.maximum(score, 1).astype(np.float32),
            np.float32(np.inf))
        chosen = int(np.argmin(ratio))
        msk = set_of_pair[pair_of_ivl] == chosen
        if np.any(msk):
            cov = _union_indicator(starts[msk], ends[msk], U).astype(bool)
            covered |= cov
        dec = np.bincount(univ_of_pair,
                          weights=np.where(set_of_pair == chosen,
                                           pair_new, 0),
                          minlength=nU).astype(np.int64)
        len_u -= dec
        in_cover[chosen] = True
        order.append(chosen)
    return np.array(order, dtype=np.int32)


def _solve_host_lazy(inst):
    """Lazy-greedy host solver: identical pick order to _solve_host.

    Greedy gains here are submodular: a set's capped score
    sum_pairs min(pair_new, need_u) is nonincreasing over time
    (coverage only grows, need_u only shrinks), so ratios = cost/score
    are nondecreasing.  A min-heap keyed (ratio, set_id) therefore
    reproduces the full per-iteration argmin exactly — including the
    lowest-set-id tie-break — because a set is only picked when either
    (a) its entry was recomputed in the current iteration, or (b) its
    recomputed ratio equals its stale key (then every other stale key
    is >= it and true ratios are >= their stale keys, so it is a true
    minimum; a lower-id true minimum would have popped first).

    The state is incremental: rem[pair] = number of still-uncovered
    positions of that (set, universe) pair, maintained exactly via
    interval algebra.  A refresh is then O(pairs of the set) and a
    pick-apply is O(intervals overlapping the newly covered region),
    instead of the O(total axis length) per refresh that position
    bitmaps force.  Measured on the ebola175 bench instance (3.2M
    intervals, 3.3M positions, 159 picks): ~400 ms/pick for the
    batched-step device solver, ~240 ms/pick for the full-rescan host
    mirror, ~2 ms/pick here.  This replaces the reference's memoized
    intersection + last-min-ratio machinery
    (/root/reference/catch/utils/set_cover.py:268-284, :436-481).
    """
    import heapq

    U = inst.u_len
    S = inst.n_sets
    nU = inst.n_universes
    starts = inst.ivl_start.astype(np.int64, copy=False)
    ends = inst.ivl_end.astype(np.int64, copy=False)
    pair_of_ivl = inst.pair_of_ivl
    set_of_pair = inst.set_of_pair
    univ_of_pair = inst.univ_of_pair
    nP = len(set_of_pair)
    cost32 = inst.cost.astype(np.float32, copy=False)
    rank_idx = inst.rank_idx
    can_uncover = inst.can_uncover.astype(np.int64, copy=False)

    # Intervals are grouped by ascending pair id and pairs by ascending
    # set id (build_instance* emit them sorted); derive contiguous
    # slices so one set's intervals/pairs are a single slice each.
    if nP and not (np.all(pair_of_ivl[1:] >= pair_of_ivl[:-1])
                   and np.all(set_of_pair[1:] >= set_of_pair[:-1])):
        order = np.argsort(pair_of_ivl, kind="stable")
        starts, ends, pair_of_ivl = (starts[order], ends[order],
                                     pair_of_ivl[order])
    pair_ptr = np.zeros(nP + 1, dtype=np.int64)
    np.cumsum(np.bincount(pair_of_ivl, minlength=nP), out=pair_ptr[1:])
    set_ptr = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(np.bincount(set_of_pair, minlength=S), out=set_ptr[1:])

    # A second view of the intervals sorted by start, for "which
    # intervals overlap this region" queries during pick-apply.
    by_start = np.argsort(starts, kind="stable")
    s_sorted = starts[by_start]
    e_sorted = ends[by_start]
    pair_sorted = pair_of_ivl[by_start]
    max_ivl_len = int((ends - starts).max()) if len(starts) else 0

    # rem[pair] = uncovered positions of the pair.  Initially the full
    # pair area: covered0 is the complement of the union of all
    # intervals, and every pair interval lies inside the union.
    rem = np.bincount(pair_of_ivl, weights=ends - starts,
                      minlength=nP).astype(np.int64)
    len_u = inst.u_size.astype(np.int64).copy()
    in_cover = np.zeros(S, dtype=bool)
    need_u = np.maximum(len_u - can_uncover, 0)

    def fresh_score(s):
        p0, p1 = set_ptr[s], set_ptr[s + 1]
        capped = np.minimum(rem[p0:p1], need_u[univ_of_pair[p0:p1]])
        return int(capped.sum()), (p0, p1)

    # Covered region as merged sorted interval arrays (grows over time)
    cov_s = np.empty(0, dtype=np.int64)
    cov_e = np.empty(0, dtype=np.int64)

    def apply_pick(p0, p1):
        """Zero the chosen set's uncovered positions: update rem for
        every interval overlapping the newly covered region, decrement
        len_u, and grow the covered list."""
        nonlocal cov_s, cov_e, len_u
        i0, i1 = pair_ptr[p0], pair_ptr[p1]
        ch_s = starts[i0:i1]
        ch_e = ends[i0:i1]
        # dec per universe = the chosen's current rem per pair
        np.subtract.at(len_u, univ_of_pair[p0:p1], rem[p0:p1])
        # Z = chosen intervals minus already-covered (disjoint pieces)
        z_s, z_e = _interval_difference(ch_s, ch_e, cov_s, cov_e)
        if len(z_s):
            # Intervals possibly overlapping any Z piece: by-start rank
            # window [searchsorted(a - max_len), searchsorted(b))
            lo = np.searchsorted(s_sorted, z_s - max_ivl_len)
            hi = np.searchsorted(s_sorted, z_e)
            for zi in range(len(z_s)):
                a, b = z_s[zi], z_e[zi]
                sl = slice(lo[zi], hi[zi])
                ov = (np.minimum(e_sorted[sl], b)
                      - np.maximum(s_sorted[sl], a))
                m = ov > 0
                if np.any(m):
                    np.subtract.at(rem, pair_sorted[sl][m], ov[m])
            # Merge Z into the covered list
            cov_s, cov_e = _merge_sorted_intervals(cov_s, cov_e, z_s, z_e)

    # Initial scores, vectorized
    score0 = np.bincount(
        set_of_pair, weights=np.minimum(rem, need_u[univ_of_pair]),
        minlength=S).astype(np.int64)

    heaps = [[] for _ in range(inst.n_rank_vals)]
    for s in range(S):
        if score0[s] > 0:
            r = np.float32(cost32[s]) / np.float32(score0[s])
            heaps[rank_idx[s]].append((float(r), s, 0))
    for h in heaps:
        heapq.heapify(h)

    order = []
    cur_rank = 0
    epoch = 0
    while np.any(need_u > 0):
        # Pop until a provably fresh minimum surfaces.
        chosen = None
        chosen_slice = None
        while cur_rank < inst.n_rank_vals:
            h = heaps[cur_rank]
            if not h:
                cur_rank += 1
                continue
            ratio, s, e = heapq.heappop(h)
            if e == epoch:
                chosen = s
                chosen_slice = (set_ptr[s], set_ptr[s + 1])
                break
            sc_val, sl = fresh_score(s)
            if sc_val > 0:
                r = float(np.float32(cost32[s]) / np.float32(sc_val))
                if r == ratio:
                    chosen = s
                    chosen_slice = sl
                    break
                heapq.heappush(h, (r, s, epoch))
            # score 0: drop permanently (scores never grow)
        if chosen is None:
            break

        apply_pick(*chosen_slice)
        need_u = np.maximum(len_u - can_uncover, 0)
        in_cover[chosen] = True
        order.append(chosen)
        epoch += 1
    return np.array(order, dtype=np.int32)


def _interval_difference(a_s, a_e, b_s, b_e):
    """Pieces of the sorted disjoint intervals (a_s, a_e) not covered by
    the sorted disjoint merged intervals (b_s, b_e)."""
    if len(b_s) == 0:
        keep = a_e > a_s
        return a_s[keep].copy(), a_e[keep].copy()
    out_s, out_e = [], []
    # For each a interval, walk the b intervals overlapping it.
    lo = np.searchsorted(b_e, a_s, side="right")
    for i in range(len(a_s)):
        cur = a_s[i]
        end = a_e[i]
        j = lo[i]
        while cur < end and j < len(b_s) and b_s[j] < end:
            if b_s[j] > cur:
                out_s.append(cur)
                out_e.append(b_s[j])
            cur = max(cur, b_e[j])
            j += 1
        if cur < end:
            out_s.append(cur)
            out_e.append(end)
    return (np.array(out_s, dtype=np.int64),
            np.array(out_e, dtype=np.int64))


def _merge_sorted_intervals(a_s, a_e, b_s, b_e):
    """Merge two sorted disjoint interval lists into one (merging
    touching/overlapping intervals)."""
    s = np.concatenate([a_s, b_s])
    e = np.concatenate([a_e, b_e])
    o = np.argsort(s, kind="stable")
    s, e = s[o], e[o]
    if len(s) == 0:
        return s, e
    run_end = np.maximum.accumulate(e)
    new_run = np.empty(len(s), dtype=bool)
    new_run[0] = True
    new_run[1:] = s[1:] > run_end[:-1]
    idx = np.flatnonzero(new_run)
    m_s = s[idx]
    m_e = np.maximum.reduceat(e, idx)
    return m_s, m_e


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2),
    static_argnames=("n_rank_vals", "n_steps"))
def _steps_jit(covered, len_u, in_cover, cur_rank, ivl_start, ivl_end,
               pair_of_ivl, set_of_pair, univ_of_pair, cost, rank_idx,
               can_uncover, *, n_rank_vals, n_steps):
    """Run `n_steps` greedy iterations as one device dispatch.

    Returns (covered, len_u, in_cover, cur_rank, stop, chosens[n_steps],
    picks[n_steps]).  The mutable state (covered/len_u/in_cover) is
    donated so the host loop re-feeds the returned buffers without
    copies.
    """
    const = dict(
        ivl_start=ivl_start, ivl_end=ivl_end, pair_of_ivl=pair_of_ivl,
        set_of_pair=set_of_pair, univ_of_pair=univ_of_pair, cost=cost,
        rank_idx=rank_idx, can_uncover=can_uncover,
        n_sets=cost.shape[0], n_pairs=set_of_pair.shape[0],
        n_universes=can_uncover.shape[0], n_rank_vals=n_rank_vals)

    def body(core, _):
        core, chosen, pick = _greedy_core(core, const)
        return core, (chosen, pick)

    core0 = (covered, len_u, in_cover, cur_rank, jnp.bool_(False))
    core, (chosens, picks) = jax.lax.scan(
        body, core0, None, length=n_steps)
    covered, len_u, in_cover, cur_rank, stop = core
    return covered, len_u, in_cover, cur_rank, stop, chosens, picks


@functools.partial(jax.jit, static_argnames=("u_len_pad",))
def _init_covered_jit(ivl_start, ivl_end, *, u_len_pad):
    """covered0 = complement of the union of all intervals."""
    delta = jnp.zeros((u_len_pad + 1,), jnp.int32)
    nonempty = (ivl_end > ivl_start).astype(jnp.int32)
    delta = delta.at[ivl_start].add(nonempty)
    delta = delta.at[ivl_end].add(-nonempty)
    return ~(jnp.cumsum(delta[:u_len_pad]) > 0)


def _pad_instance(inst):
    """Pad an instance to power-of-two shape buckets (shared by the
    while-loop and batched-step device solvers).  Padded intervals are
    empty, padded pairs point at a dummy set/universe, padded sets have
    rank index n_rank_vals (never eligible)."""
    M = len(inst.ivl_start)
    S, nP, nU = inst.n_sets, len(inst.set_of_pair), inst.n_universes
    M_pad = _next_pow2(M)
    S_pad = _next_pow2(S + 1)      # +1 dummy set absorbing padded pairs
    P_pad = _next_pow2(nP + 1)
    nU_pad = _next_pow2(nU + 1)
    U_pad = _next_pow2(inst.u_len)

    ivl_start = np.zeros(M_pad, dtype=np.int32)
    ivl_end = np.zeros(M_pad, dtype=np.int32)
    pair_of_ivl = np.full(M_pad, P_pad - 1, dtype=np.int32)
    ivl_start[:M] = inst.ivl_start
    ivl_end[:M] = inst.ivl_end
    pair_of_ivl[:M] = inst.pair_of_ivl

    set_of_pair = np.full(P_pad, S_pad - 1, dtype=np.int32)
    univ_of_pair = np.full(P_pad, nU_pad - 1, dtype=np.int32)
    set_of_pair[:nP] = inst.set_of_pair
    univ_of_pair[:nP] = inst.univ_of_pair

    cost = np.ones(S_pad, dtype=np.float32)
    rank_idx = np.full(S_pad, inst.n_rank_vals, dtype=np.int32)
    cost[:S] = inst.cost
    rank_idx[:S] = inst.rank_idx

    can_uncover = np.zeros(nU_pad, dtype=np.int32)
    u_size = np.zeros(nU_pad, dtype=np.int32)
    can_uncover[:nU] = inst.can_uncover
    u_size[:nU] = inst.u_size
    return dict(ivl_start=ivl_start, ivl_end=ivl_end,
                pair_of_ivl=pair_of_ivl, set_of_pair=set_of_pair,
                univ_of_pair=univ_of_pair, cost=cost, rank_idx=rank_idx,
                can_uncover=can_uncover, u_size=u_size,
                S_pad=S_pad, U_pad=U_pad)


def _solve_device_steps(inst):
    """Device solve as a host loop of batched greedy steps.

    Each dispatch runs _STEPS_PER_DISPATCH iterations on device and
    reads back only the per-step (chosen, pick) vectors plus the stop
    flag; the big coverage state never leaves the device.  Identical
    output to _solve_host / the while-loop solver (parity-tested).
    """
    pad = _pad_instance(inst)
    consts = [jnp.asarray(pad[k]) for k in (
        "ivl_start", "ivl_end", "pair_of_ivl", "set_of_pair",
        "univ_of_pair", "cost", "rank_idx", "can_uncover")]
    covered = _init_covered_jit(consts[0], consts[1], u_len_pad=pad["U_pad"])
    len_u = jnp.asarray(pad["u_size"].astype(np.int32))
    in_cover = jnp.zeros((pad["S_pad"],), bool)
    cur_rank = jnp.int32(0)

    order = []
    # Hard bound: every dispatch either picks >= 1 set, advances the
    # rank tier, or stops, so n_rank_vals + n_sets dispatches suffice.
    max_dispatch = 2 + (inst.n_sets + inst.n_rank_vals
                        ) // max(1, _STEPS_PER_DISPATCH // 2)
    with maybe_trace("set_cover_solve"):
        for _ in range(max_dispatch):
            covered, len_u, in_cover, cur_rank, stop, chosens, picks = \
                _steps_jit(covered, len_u, in_cover, cur_rank, *consts,
                           n_rank_vals=inst.n_rank_vals,
                           n_steps=_STEPS_PER_DISPATCH)
            picks_np = np.asarray(picks)
            chosens_np = np.asarray(chosens)
            order.extend(chosens_np[picks_np].tolist())
            if bool(stop):
                break
        else:
            logger.warning("Batched-step solver hit its dispatch bound; "
                           "solution may be truncated")
    return np.array(order, dtype=np.int32)


# ----------------------------------------------------------------------
# Boundary-sum device solver ("v2") — for device-resident instances
# ----------------------------------------------------------------------
#
# The v1 step (_greedy_core) computes per-pair and per-set sums with
# jax.ops.segment_sum, i.e. unsorted scatter-adds, which XLA:TPU lowers
# to effectively serialized updates — measured ~400 ms/pick on the
# ebola175 instance.  Instance intervals are always sorted by pair id
# and pairs by set id (build_instance* emit them that way), so both
# segment sums are differences of a cumulative sum at precomputed
# boundary indices: two passes, no scatters.  The coverage update
# scatters only the chosen set's own intervals (<= max-intervals-per-
# set elements instead of all M).

def _greedy_core_v2(core, const):
    """One greedy iteration over boundary-indexed instance arrays.

    core: (covered[U_pad] bool, len_u[nU_pad] i32, in_cover[S_pad] bool,
           cur_rank i32, stop bool)
    const: dict with device arrays ivl_start/ivl_end (i32[M_pad],
        padded intervals empty), pair_bounds (i32[P_pad+1], padded
        pairs empty), set_bounds (i32[S_pad+1], padded sets empty),
        univ_of_pair (i32[P_pad], padded -> dummy universe),
        cost (f32[S_pad]), rank_idx (i32[S_pad], padded ineligible),
        can_uncover (i32[nU_pad]) and statics n_rank_vals, U_pad,
        max_pairs_per_set, max_ivls_per_set.

    Semantics (eligibility, rank tiers, f32 ratio, first-argmin
    tie-break) are identical to _greedy_core and the host solvers.
    """
    covered, len_u, in_cover, cur_rank, stop = core
    U_pad = const["U_pad"]
    zero1 = jnp.zeros((1,), jnp.int32)

    need_u = jnp.maximum(len_u - const["can_uncover"], 0)
    active = jnp.any(need_u > 0)

    uncov = (~covered).astype(jnp.int32)
    prefix = jnp.concatenate([zero1, jnp.cumsum(uncov)])
    new_ivl = prefix[const["ivl_end"]] - prefix[const["ivl_start"]]
    ivl_csum = jnp.concatenate([zero1, jnp.cumsum(new_ivl)])
    pb = const["pair_bounds"]
    pair_new = ivl_csum[pb[1:]] - ivl_csum[pb[:-1]]
    pair_capped = jnp.minimum(pair_new, need_u[const["univ_of_pair"]])
    pc_csum = jnp.concatenate([zero1, jnp.cumsum(pair_capped)])
    sb = const["set_bounds"]
    score = pc_csum[sb[1:]] - pc_csum[sb[:-1]]

    elig = (~in_cover) & (const["rank_idx"] == cur_rank) & (score > 0)
    ratio = jnp.where(elig, const["cost"] / score.astype(jnp.float32),
                      jnp.inf)
    any_elig = jnp.any(elig)
    chosen = jnp.argmin(ratio).astype(jnp.int32)
    pick = active & any_elig
    adv = active & ~any_elig
    new_stop = (~active) | (adv & (cur_rank + 1 >= const["n_rank_vals"]))
    cur_rank = cur_rank + adv.astype(jnp.int32)

    # Update: touch only the chosen set's pairs and intervals.
    P_pad = const["univ_of_pair"].shape[0]
    M_pad = const["ivl_start"].shape[0]
    nU_pad = len_u.shape[0]
    p0 = sb[chosen]
    p1 = sb[chosen + 1]
    jp = p0 + jnp.arange(const["max_pairs_per_set"], dtype=jnp.int32)
    vp = (jp < p1) & pick
    jpc = jnp.minimum(jp, P_pad - 1)
    len_u = len_u.at[jnp.where(vp, const["univ_of_pair"][jpc],
                               nU_pad - 1)].add(
        jnp.where(vp, -pair_new[jpc], 0))
    i0 = pb[p0]
    i1 = pb[p1]
    ji = i0 + jnp.arange(const["max_ivls_per_set"], dtype=jnp.int32)
    vi = (ji < i1) & pick
    jic = jnp.minimum(ji, M_pad - 1)
    cs = jnp.where(vi, const["ivl_start"][jic], 0)
    ce = jnp.where(vi, const["ivl_end"][jic], 0)
    delta = jnp.zeros((U_pad + 1,), jnp.int32)
    delta = delta.at[cs].add(vi.astype(jnp.int32))
    delta = delta.at[ce].add(-vi.astype(jnp.int32))
    covered = covered | (jnp.cumsum(delta[:U_pad]) > 0)
    in_cover = in_cover.at[chosen].set(in_cover[chosen] | pick)
    return ((covered, len_u, in_cover, cur_rank, new_stop), chosen, pick)


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2),
    static_argnames=("n_rank_vals", "n_steps", "U_pad",
                     "max_pairs_per_set", "max_ivls_per_set"))
def _steps_jit_v2(covered, len_u, in_cover, cur_rank, ivl_start, ivl_end,
                  pair_bounds, set_bounds, univ_of_pair, cost, rank_idx,
                  can_uncover, *, n_rank_vals, n_steps, U_pad,
                  max_pairs_per_set, max_ivls_per_set):
    const = dict(
        ivl_start=ivl_start, ivl_end=ivl_end, pair_bounds=pair_bounds,
        set_bounds=set_bounds, univ_of_pair=univ_of_pair, cost=cost,
        rank_idx=rank_idx, can_uncover=can_uncover,
        n_rank_vals=n_rank_vals, U_pad=U_pad,
        max_pairs_per_set=max_pairs_per_set,
        max_ivls_per_set=max_ivls_per_set)

    def body(core, _):
        core, chosen, pick = _greedy_core_v2(core, const)
        return core, (chosen, pick)

    core0 = (covered, len_u, in_cover, cur_rank, jnp.bool_(False))
    core, (chosens, picks) = jax.lax.scan(body, core0, None, length=n_steps)
    covered, len_u, in_cover, cur_rank, stop = core
    return covered, len_u, in_cover, cur_rank, stop, chosens, picks


def solve_boundary_instance(dev, n_sets_real, max_dispatches=None):
    """Solve a boundary-indexed device instance; return picks in order.

    `dev` is a dict of device (or host) arrays as consumed by
    _greedy_core_v2 plus u_size (i32[nU_pad]) and statics n_rank_vals,
    U_pad, max_pairs_per_set, max_ivls_per_set.  Set ids are dense
    solver ids 0..n_sets_real-1; the caller maps them back to candidate
    ids.  The big state stays on device; per dispatch only the
    (chosen, pick) step vectors and the stop flag are read back.
    `max_dispatches` bounds the solve for throughput measurement (the
    solution may then be truncated).
    """
    if "ivl_start" not in dev:
        # Instances from ops/scan_instance defer the boundary-array
        # assembly (the default lazy-host route never needs it)
        from catch_tpu.ops import scan_instance
        scan_instance.ensure_assembled(dev)
    consts = [jnp.asarray(dev[k]) for k in (
        "ivl_start", "ivl_end", "pair_bounds", "set_bounds",
        "univ_of_pair", "cost", "rank_idx", "can_uncover")]
    U_pad = int(dev["U_pad"])
    covered = _init_covered_jit(consts[0], consts[1], u_len_pad=U_pad)
    # Forced copy: len_u is donated to the step program, and when
    # dev["u_size"] is already an int32 device array astype() would
    # alias it — a later solve on the same dev would then pass a
    # deleted buffer.
    len_u = jnp.array(dev["u_size"], dtype=jnp.int32, copy=True)
    in_cover = jnp.zeros((int(consts[5].shape[0]),), bool)
    cur_rank = jnp.int32(0)
    n_rank_vals = int(dev["n_rank_vals"])

    order = []
    max_dispatch = 2 + (n_sets_real + n_rank_vals
                        ) // max(1, _STEPS_PER_DISPATCH // 2)
    if max_dispatches is not None:
        max_dispatch = min(max_dispatch, max_dispatches)
    with maybe_trace("set_cover_solve"):
        for _ in range(max_dispatch):
            covered, len_u, in_cover, cur_rank, stop, chosens, picks = \
                _steps_jit_v2(
                    covered, len_u, in_cover, cur_rank, *consts,
                    n_rank_vals=n_rank_vals,
                    n_steps=_STEPS_PER_DISPATCH, U_pad=U_pad,
                    max_pairs_per_set=int(dev["max_pairs_per_set"]),
                    max_ivls_per_set=int(dev["max_ivls_per_set"]))
            picks_np = np.asarray(picks)
            order.extend(np.asarray(chosens)[picks_np].tolist())
            if bool(stop):
                break
        else:
            logger.warning("Boundary-step solver hit its dispatch "
                           "bound; solution may be truncated")
    return np.array(order, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("u_len_pad", "n_rank_vals"))
def _solve_jit_padded(ivl_start, ivl_end, pair_of_ivl, set_of_pair,
                      univ_of_pair, cost, rank_idx, can_uncover, u_size,
                      *, u_len_pad, n_rank_vals):
    n_sets = cost.shape[0]
    const = dict(
        ivl_start=ivl_start, ivl_end=ivl_end, pair_of_ivl=pair_of_ivl,
        set_of_pair=set_of_pair, univ_of_pair=univ_of_pair, cost=cost,
        rank_idx=rank_idx, can_uncover=can_uncover, n_sets=n_sets,
        n_pairs=set_of_pair.shape[0], n_universes=can_uncover.shape[0],
        n_rank_vals=n_rank_vals)
    delta = jnp.zeros((u_len_pad + 1,), jnp.int32)
    delta = delta.at[ivl_start].add(1)
    delta = delta.at[ivl_end].add(-1)
    in_universe = jnp.cumsum(delta[:u_len_pad]) > 0
    covered0 = ~in_universe
    state0 = (
        covered0,
        u_size.astype(jnp.int32),
        jnp.zeros((n_sets,), bool),
        jnp.full((n_sets,), -1, jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
        jnp.bool_(False),
    )
    final = jax.lax.while_loop(
        lambda s: ~s[-1], lambda s: _greedy_step(s, const), state0)
    _, _, in_cover, order, n_chosen, _, _ = final
    return in_cover, order, n_chosen


def _solve_device(inst):
    """Pad the instance to power-of-two shape buckets and run the jitted
    while-loop solver on the default device (single dispatch; used by
    parity tests — production routing prefers the batched-step form)."""
    pad = _pad_instance(inst)
    _, order, n_chosen = _solve_jit_padded(
        jnp.asarray(pad["ivl_start"]), jnp.asarray(pad["ivl_end"]),
        jnp.asarray(pad["pair_of_ivl"]), jnp.asarray(pad["set_of_pair"]),
        jnp.asarray(pad["univ_of_pair"]), jnp.asarray(pad["cost"]),
        jnp.asarray(pad["rank_idx"]), jnp.asarray(pad["can_uncover"]),
        jnp.asarray(pad["u_size"]),
        u_len_pad=pad["U_pad"], n_rank_vals=inst.n_rank_vals)
    n = int(n_chosen)
    return np.asarray(order)[:n]


def solve_instance(inst, force_device=None, mesh=None):
    """Solve a canonicalized instance; returns dense set indices in pick
    order (np.int32 array).

    Production path: tiny instances run the exact full-rescan numpy
    mirror; everything else runs the lazy-greedy solver — identical
    pick order (parity-tested), ~100-400x less work per pick.  Greedy
    set cover is inherently sequential (one pick per iteration) and
    lazy evaluation touches only the few sets whose stale ratios tie
    the front of the heap, so this is the part of the pipeline that
    correctly stays on the host; the device compute budget belongs to
    the cover scan.  force_device=True routes to the batched-step
    device solver (or, with a multi-device `mesh`, the sharded solver
    in catch_tpu.parallel.set_cover) — same output; used by parity
    tests, the multichip dryrun, and instances too large to rescan on
    the host at all.
    """
    if inst.n_sets == 0 or inst.u_len == 0 or len(inst.ivl_start) == 0:
        return np.empty(0, dtype=np.int32)
    if np.all(inst.can_uncover >= inst.u_size):
        return np.empty(0, dtype=np.int32)
    if force_device and mesh is not None and mesh.devices.size > 1:
        from catch_tpu.parallel.set_cover import solve_instance_sharded
        return solve_instance_sharded(inst, mesh=mesh)
    if force_device and inst.u_len < np.iinfo(np.int32).max:
        try:
            return _solve_device_steps(inst)
        except Exception:
            logger.exception(
                "Device set-cover solve failed; falling back to the "
                "host solver")
    n_elems = inst.u_len + len(inst.ivl_start)
    if n_elems > _HOST_SOLVE_MAX_ELEMS:
        return _solve_host_lazy(inst)
    return _solve_host(inst)


def _merge_by_group(group_key, starts, ends):
    """Merge overlapping/touching intervals within each group.

    Args:
        group_key: int64[M] group id per interval (need not be sorted)
        starts, ends: int64[M]

    Returns:
        (group_key, starts, ends) of the merged intervals, sorted by
        (group, start).
    """
    if len(starts) == 0:
        return group_key, starts, ends
    # Sort by (group, start): a single composite-key argsort is ~5x
    # faster than np.lexsort at millions of intervals.  End order
    # within equal (group, start) is irrelevant to the running-max
    # merge below.  Fall back to lexsort if the key would overflow.
    s_min = int(starts.min())
    s_span = int(ends.max()) - s_min + 2
    g_max = int(group_key.max())
    if (g_max + 1) * s_span < np.iinfo(np.int64).max // 2:
        key = group_key * np.int64(s_span) + (starts - s_min)
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((ends, starts, group_key))
    g = group_key[order]
    s = starts[order]
    e = ends[order]
    # Shift each group into a disjoint coordinate band so a single
    # global running max implements a per-group running max.
    big = np.int64(max(int(e.max()) - int(s.min()) + 2, 2))
    gi = np.cumsum(np.concatenate(([0], (np.diff(g) != 0).astype(np.int64))))
    s_off = s - s.min() + gi * big
    e_off = e - s.min() + gi * big
    run_end = np.maximum.accumulate(e_off)
    new_run = np.empty(len(s), dtype=bool)
    new_run[0] = True
    new_run[1:] = s_off[1:] > run_end[:-1]
    run_idx = np.flatnonzero(new_run)
    m_start = s[run_idx]
    m_end = np.maximum.reduceat(e_off, run_idx) - gi[run_idx] * big \
        + s.min()
    return g[run_idx], m_start, m_end


def build_instance_from_cover_arrays(set_ids, univ_ids, starts, ends,
                                     n_sets, n_universes, universe_p,
                                     ranks=None, costs=None):
    """Build a SetCoverInstance directly from flat cover arrays.

    The fast path for the probe-design pipeline: the cover engine emits
    (probe set_id, universe j, start, end) spans in genome-global
    coordinates; no per-probe Python dicts are materialized (unlike the
    reference's sets-of-IntervalSets, set_cover_filter.py:359-470).

    Args:
        set_ids, univ_ids, starts, ends: int arrays, one entry per
            cover interval (within-universe coordinates)
        n_sets: total number of candidate sets (ids 0..n_sets-1)
        n_universes: number of universes (ids 0..n_universes-1)
        universe_p: float64[n_universes] required coverage fraction
        ranks: int64[n_sets] (default all 1)
        costs: float32[n_sets] (default all 1)

    Returns:
        SetCoverInstance
    """
    set_ids = np.asarray(set_ids, dtype=np.int64)
    univ_ids = np.asarray(univ_ids, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    universe_p = np.asarray(universe_p, dtype=np.float64)

    if costs is None:
        cost = np.ones(n_sets, dtype=np.float32)
    else:
        cost = np.asarray(costs, dtype=np.float32)
    if ranks is None:
        rank_arr = np.ones(n_sets, dtype=np.int64)
    else:
        rank_arr = np.asarray(ranks, dtype=np.int64)
    rank_vals = np.unique(rank_arr)
    rank_idx = np.searchsorted(rank_vals, rank_arr).astype(np.int32)

    # Universe spans = max end seen per universe (coordinates are local
    # to the universe; the global axis concatenates them).
    u_span = np.zeros(n_universes, dtype=np.int64)
    if len(starts):
        np.maximum.at(u_span, univ_ids, ends)
    offsets = np.zeros(n_universes + 1, dtype=np.int64)
    np.cumsum(u_span, out=offsets[1:])
    u_len = int(offsets[-1])

    g_start = starts + offsets[univ_ids]
    g_end = ends + offsets[univ_ids]

    # Merge per (set, universe); pair key = set * nU + univ
    pair_key = set_ids * n_universes + univ_ids
    mk, ms, me = _merge_by_group(pair_key, g_start, g_end)
    pair_ids, pair_of_ivl = np.unique(mk, return_inverse=True)
    set_of_pair = (pair_ids // n_universes).astype(np.int32)
    univ_of_pair = (pair_ids % n_universes).astype(np.int32)

    # Universe sizes: union of all intervals per universe (sweep).
    u_size = np.zeros(n_universes, dtype=np.int64)
    if len(ms):
        uk, us, ue = _merge_by_group(univ_of_pair[pair_of_ivl].astype(
            np.int64), ms, me)
        np.add.at(u_size, uk, ue - us)

    can_uncover = (u_size - universe_p * u_size).astype(np.int64)

    return SetCoverInstance(
        n_sets=n_sets, n_universes=n_universes, u_size=u_size,
        can_uncover=can_uncover, ivl_start=ms, ivl_end=me,
        pair_of_ivl=pair_of_ivl.astype(np.int32),
        set_of_pair=set_of_pair, univ_of_pair=univ_of_pair,
        cost=cost, rank_idx=rank_idx, n_rank_vals=len(rank_vals),
        u_len=u_len, pos_univ_offsets=offsets)


# ----------------------------------------------------------------------
# Reference-parity host API
# ----------------------------------------------------------------------

def approx_multiuniverse(sets, costs=None, universe_p=None, ranks=None,
                         use_arrays=False, use_intervalsets=False,
                         logger_prefix=""):
    """Approximate the multi-universe weighted partial set cover.

    API parity with /root/reference/catch/utils/set_cover.py:147-615;
    see module docstring for the device algorithm.  `use_arrays` is
    accepted for compatibility (arrays and sets canonicalize the same
    way here).

    Returns:
        set of chosen set identifiers
    """
    if use_arrays and use_intervalsets:
        raise ValueError("Cannot use both arrays and IntervalSets")
    inst, set_id_list = build_instance(
        sets, costs=costs, universe_p=universe_p, ranks=ranks,
        use_intervalsets=use_intervalsets)
    chosen = solve_instance(inst)
    if ranks is not None and len(chosen):
        ranks_arr = np.array([ranks[set_id_list[i]] for i in chosen])
        min_rank = min(ranks.values())
        n_high = int(np.sum(ranks_arr > min_rank))
        if n_high:
            logger.warning(
                "%sThe solution chose %d sets with rank above the minimum",
                logger_prefix, n_high)
    return {set_id_list[i] for i in chosen}


def approx(sets, costs=None, p=1.0):
    """Approximate the weighted partial set cover (single universe).

    API parity with /root/reference/catch/utils/set_cover.py:14-144.
    """
    if p < 0 or p > 1:
        raise ValueError("p must be in [0,1]")
    mu_sets = {sid: {0: s} for sid, s in sets.items()}
    return approx_multiuniverse(mu_sets, costs=costs, universe_p={0: p})
