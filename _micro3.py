import time, pickle, numpy as np, jax, jax.numpy as jnp
from catch_tpu.ops import set_cover as sc

with open("/tmp/inst.pkl","rb") as f:
    inst = sc.SetCoverInstance(**pickle.load(f))

t0=time.time()
pad = sc._pad_instance(inst)
print("pad: %.2fs" % (time.time()-t0), flush=True)
t0=time.time()
consts = [jnp.asarray(pad[k]) for k in (
    "ivl_start", "ivl_end", "pair_of_ivl", "set_of_pair",
    "univ_of_pair", "cost", "rank_idx", "can_uncover")]
jax.block_until_ready(consts)
print("transfer consts: %.2fs" % (time.time()-t0), flush=True)
t0=time.time()
covered = sc._init_covered_jit(consts[0], consts[1], u_len_pad=pad["U_pad"])
jax.block_until_ready(covered)
print("init_covered: %.2fs" % (time.time()-t0), flush=True)
len_u = jnp.asarray(pad["u_size"].astype(np.int32))
in_cover = jnp.zeros((pad["S_pad"],), bool)
cur_rank = jnp.int32(0)
order = []
for i in range(8):
    t0=time.time()
    covered, len_u, in_cover, cur_rank, stop, chosens, picks = \
        sc._steps_jit(covered, len_u, in_cover, cur_rank, *consts,
                      n_rank_vals=inst.n_rank_vals, n_steps=64)
    t1=time.time()
    picks_np = np.asarray(picks); chosens_np = np.asarray(chosens)
    t2=time.time()
    order.extend(chosens_np[picks_np].tolist())
    st = bool(stop)
    print("dispatch %d: launch %.3fs readback %.3fs stopread %.3fs stop=%s picks=%d" % (
        i, t1-t0, t2-t1, time.time()-t2, st, len(order)), flush=True)
    if st: break
