"""Sharded greedy multi-universe set cover over a device mesh.

Multi-device form of catch_tpu.ops.set_cover: candidate sets (and their
intervals) are partitioned into contiguous blocks across the mesh; the
coverage state is replicated.  Each greedy iteration:

1. every device computes, for its block of sets, the number of
   still-needed positions each set would newly cover (prefix sum of the
   uncovered indicator + two gathers per interval + segment sums);
2. the global pick is merged with ``lax.pmin`` — first on the minimal
   cost/score ratio, then on the lowest global set id among ties, so
   tie-breaking is bit-identical to the single-device solver
   (catch_tpu/ops/set_cover.py, which uses argmin = first minimum);
3. the winning set's coverage delta is ``lax.psum``-merged (only the
   owning shard contributes nonzero) and applied to the replicated
   state.

This replaces the reference's process-pool parallelism over whole
set-cover instances (/root/reference/catch/filter/set_cover_filter.py:
848-900) with parallelism *inside* one instance, which is the axis that
matters at scale (one instance per species can be millions of candidate
probes x hundreds of Mbp of universe).

Equivalence contract: identical pick order to ops.set_cover's host and
single-device solvers for any device count (tests/test_parallel.py).
"""

import functools
import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = ["solve_instance_sharded", "greedy_step_sharded"]

_INT32_MAX = np.int32(np.iinfo(np.int32).max)


def _next_pow2(x):
    return 1 if x <= 1 else 1 << int(x - 1).bit_length()


def _partition_instance(inst, n_shards):
    """Partition an instance's sets into contiguous per-shard blocks.

    Returns a dict of stacked per-shard arrays (leading axis n_shards)
    plus replicated arrays.  Padded intervals/pairs point at a per-shard
    dummy pair whose set has rank n_rank_vals (never eligible) and whose
    universe is a dummy with zero need; padded intervals are empty
    (start == end == 0) so they contribute nothing anyway.
    """
    S = inst.n_sets
    nU = inst.n_universes
    S_loc = max(1, -(-S // n_shards))
    S_pad = S_loc * n_shards

    # Assign each pair / interval to the shard owning its set.
    pair_shard = inst.set_of_pair // S_loc
    ivl_shard = pair_shard[inst.pair_of_ivl]

    nP_loc = 1  # one dummy pair slot minimum
    M_loc = 1
    for d in range(n_shards):
        nP_loc = max(nP_loc, int(np.sum(pair_shard == d)) + 1)
        M_loc = max(M_loc, int(np.sum(ivl_shard == d)))
    nP_loc = _next_pow2(nP_loc)
    M_loc = _next_pow2(M_loc)
    nU_pad = _next_pow2(nU + 1)

    ivl_start = np.zeros((n_shards, M_loc), dtype=np.int32)
    ivl_end = np.zeros((n_shards, M_loc), dtype=np.int32)
    pair_of_ivl = np.full((n_shards, M_loc), nP_loc - 1, dtype=np.int32)
    set_of_pair = np.full((n_shards, nP_loc), _INT32_MAX, dtype=np.int32)
    univ_of_pair = np.full((n_shards, nP_loc), nU_pad - 1, dtype=np.int32)
    cost_loc = np.ones((n_shards, S_loc), dtype=np.float32)
    rank_loc = np.full((n_shards, S_loc), inst.n_rank_vals, dtype=np.int32)

    for d in range(n_shards):
        pmask = pair_shard == d
        pids = np.flatnonzero(pmask)
        remap = np.full(len(inst.set_of_pair) + 1, nP_loc - 1, dtype=np.int32)
        remap[pids] = np.arange(len(pids), dtype=np.int32)
        set_of_pair[d, :len(pids)] = inst.set_of_pair[pids]
        univ_of_pair[d, :len(pids)] = inst.univ_of_pair[pids]
        imask = ivl_shard == d
        m = int(np.sum(imask))
        ivl_start[d, :m] = inst.ivl_start[imask]
        ivl_end[d, :m] = inst.ivl_end[imask]
        pair_of_ivl[d, :m] = remap[inst.pair_of_ivl[imask]]
        lo, hi = d * S_loc, min((d + 1) * S_loc, S)
        if hi > lo:
            cost_loc[d, :hi - lo] = inst.cost[lo:hi]
            rank_loc[d, :hi - lo] = inst.rank_idx[lo:hi]

    can_uncover = np.zeros(nU_pad, dtype=np.int32)
    u_size = np.zeros(nU_pad, dtype=np.int32)
    can_uncover[:nU] = inst.can_uncover
    u_size[:nU] = inst.u_size

    return dict(
        ivl_start=ivl_start, ivl_end=ivl_end, pair_of_ivl=pair_of_ivl,
        set_of_pair=set_of_pair, univ_of_pair=univ_of_pair,
        cost_loc=cost_loc, rank_loc=rank_loc,
        can_uncover=can_uncover, u_size=u_size,
        S_loc=S_loc, S_pad=S_pad, nU_pad=nU_pad,
        U_pad=_next_pow2(inst.u_len),
        n_rank_vals=inst.n_rank_vals)


def greedy_step_sharded(state, const, axis_name):
    """One sharded greedy iteration (runs inside shard_map).

    state: (covered[U] bool, len_u[nU] i32, in_cover_loc[S_loc] bool,
            order[S_pad] i32, n_chosen i32, cur_rank i32, stop bool)
    All state except in_cover_loc is replicated across shards; const
    holds this shard's interval/pair/set arrays.
    """
    covered, len_u, in_cover_loc, order, n_chosen, cur_rank, stop = state
    d = jax.lax.axis_index(axis_name)
    S_loc = in_cover_loc.shape[0]

    need_u = jnp.maximum(len_u - const["can_uncover"], 0)
    active = jnp.any(need_u > 0)

    uncov = (~covered).astype(jnp.int32)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(uncov)])
    new_ivl = prefix[const["ivl_end"]] - prefix[const["ivl_start"]]
    pair_new = jax.ops.segment_sum(
        new_ivl, const["pair_of_ivl"], num_segments=const["n_pairs"])
    pair_capped = jnp.minimum(pair_new, need_u[const["univ_of_pair"]])
    # Local set index of each pair (pairs of other shards never occur)
    set_local = jnp.clip(const["set_of_pair"] - d * S_loc, 0, S_loc)
    score = jax.ops.segment_sum(
        pair_capped, set_local, num_segments=S_loc + 1)[:S_loc]

    elig = ((~in_cover_loc) & (const["rank_loc"] == cur_rank) & (score > 0))
    ratio = jnp.where(
        elig, const["cost_loc"] / score.astype(jnp.float32), jnp.inf)
    loc_arg = jnp.argmin(ratio).astype(jnp.int32)
    loc_min = ratio[loc_arg]
    gmin = jax.lax.pmin(loc_min, axis_name)
    cand = jnp.where(loc_min == gmin, d * S_loc + loc_arg, _INT32_MAX)
    chosen = jax.lax.pmin(cand, axis_name)
    any_elig = gmin < jnp.inf

    pick = active & any_elig
    adv = active & ~any_elig
    new_stop = (~active) | (adv & (cur_rank + 1 >= const["n_rank_vals"]))
    cur_rank = cur_rank + adv.astype(jnp.int32)

    # Coverage update: only the owning shard's intervals match `chosen`;
    # psum broadcasts the delta.
    set_global_of_ivl = jnp.take(
        const["set_of_pair"], const["pair_of_ivl"], fill_value=_INT32_MAX)
    w = ((set_global_of_ivl == chosen) & pick).astype(jnp.int32)
    U = covered.shape[0]
    delta = jnp.zeros((U + 1,), jnp.int32)
    delta = delta.at[const["ivl_start"]].add(w)
    delta = delta.at[const["ivl_end"]].add(-w)
    delta = jax.lax.psum(delta, axis_name)
    covered = covered | (jnp.cumsum(delta[:U]) > 0)

    dec = jax.ops.segment_sum(
        jnp.where(const["set_of_pair"] == chosen, pair_new, 0),
        const["univ_of_pair"], num_segments=const["n_universes"])
    dec = jax.lax.psum(dec, axis_name)
    len_u = len_u - jnp.where(pick, dec, 0)

    local_idx = chosen - d * S_loc
    is_mine = (local_idx >= 0) & (local_idx < S_loc)
    safe = jnp.clip(local_idx, 0, S_loc - 1)
    in_cover_loc = in_cover_loc.at[safe].set(
        in_cover_loc[safe] | (pick & is_mine))
    order = order.at[n_chosen].set(jnp.where(pick, chosen, order[n_chosen]))
    n_chosen = n_chosen + pick.astype(jnp.int32)
    return (covered, len_u, in_cover_loc, order, n_chosen, cur_rank,
            new_stop)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "U_pad", "S_loc", "S_pad",
                     "n_rank_vals"))
def _solve_sharded_jit(ivl_start, ivl_end, pair_of_ivl, set_of_pair,
                       univ_of_pair, cost_loc, rank_loc, can_uncover,
                       u_size, *, mesh, axis_name, U_pad, S_loc, S_pad,
                       n_rank_vals):
    def body(ivl_start, ivl_end, pair_of_ivl, set_of_pair, univ_of_pair,
             cost_loc, rank_loc, can_uncover, u_size):
        # shard_map passes blocks with the leading shard axis collapsed
        ivl_s = ivl_start[0]
        ivl_e = ivl_end[0]
        const = dict(
            ivl_start=ivl_s, ivl_end=ivl_e, pair_of_ivl=pair_of_ivl[0],
            set_of_pair=set_of_pair[0], univ_of_pair=univ_of_pair[0],
            cost_loc=cost_loc[0], rank_loc=rank_loc[0],
            can_uncover=can_uncover, n_pairs=set_of_pair.shape[1],
            n_universes=can_uncover.shape[0], n_rank_vals=n_rank_vals)
        # Initial covered = complement of the union of all intervals
        delta = jnp.zeros((U_pad + 1,), jnp.int32)
        delta = delta.at[ivl_s].add((ivl_e > ivl_s).astype(jnp.int32))
        delta = delta.at[ivl_e].add(-(ivl_e > ivl_s).astype(jnp.int32))
        delta = jax.lax.psum(delta, axis_name)
        covered0 = ~(jnp.cumsum(delta[:U_pad]) > 0)
        state0 = (
            covered0,
            u_size.astype(jnp.int32),
            jnp.zeros((S_loc,), bool),
            jnp.full((S_pad,), -1, jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
            jnp.bool_(False),
        )
        final = jax.lax.while_loop(
            lambda s: ~s[-1],
            lambda s: greedy_step_sharded(s, const, axis_name), state0)
        _, _, _, order, n_chosen, _, _ = final
        return order[None], n_chosen[None]

    sharded = P(axis_name)
    repl = P()
    order, n_chosen = jax.shard_map(
        body, mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, repl, repl),
        out_specs=(sharded, sharded),
        check_vma=False,
    )(ivl_start, ivl_end, pair_of_ivl, set_of_pair, univ_of_pair,
      cost_loc, rank_loc, can_uncover, u_size)
    # order/n_chosen are replicated values stacked over shards; row 0
    # equals every other row.
    return order[0], n_chosen[0]


def solve_instance_sharded(inst, mesh=None, n_devices=None, axis_name="d"):
    """Solve a SetCoverInstance on a device mesh.

    Returns dense set indices in pick order (np.int32), bit-identical
    to ops.set_cover.solve_instance.

    Args:
        inst: catch_tpu.ops.set_cover.SetCoverInstance
        mesh: jax.sharding.Mesh (1-D); built from n_devices if None
        n_devices: device count when mesh is None (default: all)
    """
    from catch_tpu.parallel.mesh import make_mesh

    if inst.n_sets == 0 or inst.u_len == 0 or len(inst.ivl_start) == 0:
        return np.empty(0, dtype=np.int32)
    if np.all(inst.can_uncover >= inst.u_size):
        return np.empty(0, dtype=np.int32)
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    n_shards = mesh.devices.size
    part = _partition_instance(inst, n_shards)
    order, n_chosen = _solve_sharded_jit(
        jnp.asarray(part["ivl_start"]), jnp.asarray(part["ivl_end"]),
        jnp.asarray(part["pair_of_ivl"]), jnp.asarray(part["set_of_pair"]),
        jnp.asarray(part["univ_of_pair"]), jnp.asarray(part["cost_loc"]),
        jnp.asarray(part["rank_loc"]), jnp.asarray(part["can_uncover"]),
        jnp.asarray(part["u_size"]),
        mesh=mesh, axis_name=axis_name, U_pad=part["U_pad"],
        S_loc=part["S_loc"], S_pad=part["S_pad"],
        n_rank_vals=part["n_rank_vals"])
    n = int(n_chosen)
    return np.asarray(order)[:n]
