import time, pickle, numpy as np, jax, jax.numpy as jnp
from catch_tpu.ops import set_cover as sc

with open("/tmp/inst.pkl","rb") as f:
    inst = sc.SetCoverInstance(**pickle.load(f))
print("u_len", inst.u_len, "M", len(inst.ivl_start), "pairs", len(inst.set_of_pair), "S", inst.n_sets, flush=True)

pad = sc._pad_instance(inst)
consts = [jnp.asarray(pad[k]) for k in (
    "ivl_start", "ivl_end", "pair_of_ivl", "set_of_pair",
    "univ_of_pair", "cost", "rank_idx", "can_uncover")]
covered = sc._init_covered_jit(consts[0], consts[1], u_len_pad=pad["U_pad"])
len_u = jnp.asarray(pad["u_size"].astype(np.int32))
in_cover = jnp.zeros((pad["S_pad"],), bool)
cur_rank = jnp.int32(0)
jax.block_until_ready(covered)

t0=time.time()
out = sc._steps_jit(covered, len_u, in_cover, cur_rank, *consts,
                    n_rank_vals=inst.n_rank_vals, n_steps=64)
jax.block_until_ready(out)
print("dispatch1 (incl compile): %.2fs" % (time.time()-t0), flush=True)
covered, len_u, in_cover, cur_rank, stop, chosens, picks = out
t0=time.time()
out = sc._steps_jit(covered, len_u, in_cover, cur_rank, *consts,
                    n_rank_vals=inst.n_rank_vals, n_steps=64)
jax.block_until_ready(out)
print("dispatch2 (warm): %.2fs" % (time.time()-t0), flush=True)
