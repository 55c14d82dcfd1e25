"""Batched device cover scan: the whole corpus in one dispatch.

The per-sequence engine in ops/cover.py pays host work per sequence
(k-mer join + numpy window verification), which dominates on corpora of
thousands of genomes.  This module scans *all* target sequences against
*all* probes in a single jitted megakernel:

- All sequences are concatenated into one PAD-separated mega-sequence
  (gap width = Lmax, so a probe window can never touch two sequences
  and PAD never matches -> per-window match counts are exact
  within-sequence counts).
- A `lax.fori_loop` walks alignment tiles; an inner `lax.scan` walks
  probe blocks.  Phase 1 is the one-hot match-count einsum on the MXU
  (the same predicate as ops/cover.py).  Phase 2 (maximal <=K-mismatch
  windows containing a >=k_seed exact run, via sentinel-padded sorted
  mismatch positions) runs on device immediately on the extracted
  candidates of each tile.  Qualifying spans are appended to a
  device-resident buffer; only the final span arrays leave the device.
- Capacities (candidates per block, spans per tile, total spans) are
  static; true counts are returned so the host can detect overflow and
  retry with doubled capacities (rare) or fall back to the per-sequence
  path.

Semantics are identical to ProbeSearcher's per-sequence path (see the
parity test in tests/test_cover.py), which itself mirrors the reference
engine /root/reference/catch/probe.py:1008-1271 with exhaustive
seeding.  The fast path (lcf >= probe length with pigeonhole seeding or
zero mismatches) emits the clamped overlap verbatim per candidate,
matching ops/cover.py's fast path per sequence.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from catch_tpu.ops import encode

__all__ = ["scan_corpus"]


@functools.partial(
    jax.jit,
    static_argnames=("A", "L", "K", "na_blk", "n_tiles", "cap_blk",
                     "span_cap_tile", "span_cap", "seed_req", "fast_ok"))
def _scan_mega(mega, seq_starts, seq_ends, probes_oh, probe_codes_flat,
               probe_lens_blk, lcf, k_seed, *, A, L, K, na_blk, n_tiles,
               cap_blk, span_cap_tile, span_cap, seed_req, fast_ok):
    """One-dispatch scan of the mega-sequence against all probe blocks.

    mega: (mega_pad,) uint8 codes (0 = PAD)
    seq_starts/seq_ends: (n_seqs,) int32 mega coordinates of each sequence
    probes_oh: (nB, P_blk, L, A) bfloat16 one-hot probe codes
    probe_codes_flat: (nB * P_blk, L) uint8
    probe_lens_blk: (nB, P_blk) int32 (0 for padding probes)
    lcf, k_seed: model scalars (int32); K/seed_req are static

    Returns (buf_p, buf_s, buf_e, n_spans, max_cand, max_span):
    span buffers (probe id, start, end in mega coords; first n_spans
    entries valid if no overflow; sequence attribution happens on the
    host via searchsorted over seq_ends), plus the max per-(tile,block)
    candidate count and max per-tile span count for overflow detection.
    """
    nB, P_blk = probe_lens_blk.shape
    n_seqs = seq_starts.shape[0]
    lens_flat = probe_lens_blk.reshape(-1)
    t_cols = L + 1
    jL = jnp.arange(L, dtype=jnp.int32)

    def tile_body(t, carry):
        buf_p, buf_s, buf_e, n_spans, max_cand, max_span = carry
        a0 = (t * na_blk).astype(jnp.int32)
        a = a0 + jnp.arange(na_blk, dtype=jnp.int32)
        win = mega[a[:, None] + jL[None, :]]                  # (NA, L)
        win_oh = jax.nn.one_hot(win.astype(jnp.int32) - 1, A,
                                dtype=jnp.bfloat16)
        # Unique sequence a window can touch (gap >= L guarantees <=1):
        # the first sequence whose end is past the window start.
        sid = jnp.clip(jnp.searchsorted(seq_ends, a, side="right"),
                       0, n_seqs - 1)
        s_lo = seq_starts[sid]                                # (NA,)
        s_hi = seq_ends[sid]

        def block_body(_, blk):
            codes_oh, lens = blk                 # (P,L,A), (P,)
            counts = jnp.einsum(
                "wla,pla->wp", win_oh, codes_oh,
                preferred_element_type=jnp.float32).astype(jnp.int32)
            ov = (jnp.minimum(s_hi[:, None], a[:, None] + lens[None, :])
                  - jnp.maximum(s_lo[:, None], a[:, None]))
            n_seq = (s_hi - s_lo)[:, None]
            thres = jnp.minimum(jnp.minimum(lcf, lens[None, :]), n_seq)
            need = jnp.maximum(thres - K, k_seed)
            cand = ((ov >= jnp.maximum(thres, k_seed)) & (counts >= need)
                    & (lens[None, :] > 0) & (thres > 0))
            cnt = jnp.sum(cand, dtype=jnp.int32)
            w_i, p_i = jnp.nonzero(cand, size=cap_blk, fill_value=-1)
            return None, (w_i.astype(jnp.int32), p_i.astype(jnp.int32), cnt)

        _, (w_all, p_all, cnts) = jax.lax.scan(
            block_body, None, (probes_oh, probe_lens_blk))
        max_cand = jnp.maximum(max_cand, jnp.max(cnts))

        # ---- phase 2 on this tile's candidates (C = nB * cap_blk) ----
        w = w_all.reshape(-1)
        pb = p_all.reshape(-1)
        blk_i = jnp.repeat(jnp.arange(nB, dtype=jnp.int32), cap_blk)
        valid_c = w >= 0
        wc = jnp.maximum(w, 0)
        pg = blk_i * P_blk + jnp.maximum(pb, 0)               # global probe
        aa = a0 + wc
        sl = s_lo[wc]
        sh = s_hi[wc]
        plen = lens_flat[pg]
        start = jnp.maximum(sl, aa)
        end = jnp.minimum(sh, aa + plen)
        ov = end - start
        thres = jnp.minimum(jnp.minimum(lcf, plen), sh - sl)

        seq_vals = mega[start[:, None] + jL[None, :]]         # (C, L)
        poff = (start - aa)[:, None] + jL[None, :]
        probe_vals = jnp.take_along_axis(
            probe_codes_flat[pg], jnp.minimum(poff, L - 1), axis=1)
        validj = jL[None, :] < ov[:, None]
        match = (seq_vals == probe_vals) & (seq_vals > 0) & validj
        mism = validj & ~match
        nm = jnp.sum(mism, axis=1, dtype=jnp.int32)
        mmpos = jnp.sort(jnp.where(mism, jL[None, :], L + 1), axis=1)
        Pm = jnp.concatenate([
            jnp.full((mmpos.shape[0], 1), -1, jnp.int32),
            jnp.minimum(mmpos, ov[:, None]),
            jnp.broadcast_to(ov[:, None], (mmpos.shape[0], K + 1)),
        ], axis=1)                                            # (C, L+K+2)
        lenW = Pm[:, K + 1:K + 1 + t_cols] - Pm[:, :t_cols] - 1
        runs = Pm[:, 1:] - Pm[:, :-1] - 1
        seedmax = runs[:, :t_cols]
        for s in range(1, K + 1):
            seedmax = jnp.maximum(seedmax, runs[:, s:s + t_cols])
        tq = jnp.arange(t_cols, dtype=jnp.int32)
        qual2 = ((tq[None, :] <= nm[:, None]) & (lenW >= thres[:, None])
                 & (seedmax >= seed_req) & (thres[:, None] > 0)
                 & valid_c[:, None])
        if fast_ok:
            # Per-candidate fast eligibility mirrors ops/cover.py:
            # n >= L (all probes same length) or (K == 0 and n >= k_seed)
            nsq = sh - sl
            is_fast = (nsq >= L) | ((K == 0) & (nsq >= k_seed))
            qual = jnp.where(is_fast[:, None],
                             (tq[None, :] == 0) & valid_c[:, None], qual2)
        else:
            is_fast = jnp.zeros_like(valid_c)
            qual = qual2
        nq = jnp.sum(qual, dtype=jnp.int32)
        max_span = jnp.maximum(max_span, nq)
        rows, ts = jnp.nonzero(qual, size=span_cap_tile, fill_value=-1)
        ok = rows >= 0
        rc = jnp.maximum(rows, 0)
        tc = jnp.maximum(ts, 0)
        if fast_ok:
            sp_s = jnp.where(is_fast[rc], start[rc],
                             Pm[rc, tc] + 1 + start[rc])
            sp_e = jnp.where(is_fast[rc], end[rc],
                             Pm[rc, tc + K + 1] + start[rc])
        else:
            sp_s = Pm[rc, tc] + 1 + start[rc]
            sp_e = Pm[rc, tc + K + 1] + start[rc]
        sp_p = pg[rc]
        idx = jnp.where(ok, n_spans + jnp.cumsum(ok.astype(jnp.int32)) - 1,
                        span_cap)
        buf_p = buf_p.at[idx].set(sp_p, mode="drop")
        buf_s = buf_s.at[idx].set(sp_s, mode="drop")
        buf_e = buf_e.at[idx].set(sp_e, mode="drop")
        n_spans = n_spans + jnp.minimum(nq, span_cap_tile)
        return (buf_p, buf_s, buf_e, n_spans, max_cand, max_span)

    init = (
        jnp.zeros((span_cap,), jnp.int32),
        jnp.zeros((span_cap,), jnp.int32),
        jnp.zeros((span_cap,), jnp.int32),
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    return jax.lax.fori_loop(0, n_tiles, tile_body, init)


def scan_corpus(searcher, sequences, span_cap=None):
    """Scan `sequences` (list of str) against searcher's probes on device.

    Returns (probe_idx, seq_idx, start, end) int64 arrays of unmerged
    cover spans in per-sequence local coordinates, or None if this
    workload cannot run on the batched path (custom model).
    """
    model = searcher.model
    if model.custom_fn is not None or searcher.K_static is None:
        return None
    L = searcher.Lmax
    A = searcher.alphabet.size
    K = int(searcher.K_static)
    k_seed = int(searcher.k_seed)
    island = model.island_of_exact_match
    seed_req = max(k_seed, island) if island > 0 else k_seed

    # Build the mega-sequence: [L pad][seq0][L pad][seq1]...[pad tail]
    n_seqs = len(sequences)
    seq_lens = np.array([len(s) for s in sequences], dtype=np.int64)
    starts = np.empty(n_seqs, dtype=np.int64)
    pos = L
    for i, n in enumerate(seq_lens):
        starts[i] = pos
        pos += int(n) + L
    real_total = pos
    # Mega coordinates ride int32 device arrays: refuse corpora that
    # would overflow (or whose span buffers would blow the HBM budget)
    # and let the caller fall back to the per-sequence path.
    if real_total + L > np.iinfo(np.int32).max:
        return None
    est_span_cap = (span_cap if span_cap is not None
                    else encode.next_pow2(max(2 * real_total, 1 << 16)))
    est_bytes = (
        3 * 4 * est_span_cap                        # span buffers
        + len(searcher.probes) * L * (A * 2 + 1)    # probes_oh + codes
        + encode.next_pow2(real_total + L))         # mega
    if est_bytes > 8 * (1 << 30):
        return None
    mega_pad = encode.next_pow2(real_total + L)
    na_blk = min(32768, mega_pad)
    n_tiles = mega_pad // na_blk
    mega = np.zeros(mega_pad, dtype=np.uint8)
    for i, s in enumerate(sequences):
        mega[starts[i]:starts[i] + seq_lens[i]] = searcher.alphabet.encode(
            encode.encode_bytes(s))
    ends = starts + seq_lens

    # Probe blocks stacked (directly from the searcher's host arrays;
    # no device round trip)
    nP = len(searcher.probes)
    P_blk = searcher.p_blk
    nB = (nP + P_blk - 1) // P_blk
    codes = np.zeros((nB, P_blk, L), dtype=np.uint8)
    lens_blk = np.zeros((nB, P_blk), dtype=np.int32)
    codes.reshape(nB * P_blk, L)[:nP] = searcher.probe_codes
    lens_blk.reshape(-1)[:nP] = searcher.probe_lens
    probes_oh = jax.nn.one_hot(
        jnp.asarray(codes).astype(jnp.int32) - 1, A, dtype=jnp.bfloat16)
    codes_flat = jnp.asarray(codes.reshape(nB * P_blk, L))

    if span_cap is None:
        span_cap = encode.next_pow2(max(2 * real_total, 1 << 16))
    cap_blk = min(encode.next_pow2(max(4096, na_blk // 2)), na_blk * P_blk)
    span_cap_tile = 2 * cap_blk * max(1, min(nB, 4))

    mega_dev = jnp.asarray(mega)
    st_dev = jnp.asarray(starts.astype(np.int32))
    en_dev = jnp.asarray(ends.astype(np.int32))
    lens_dev = jnp.asarray(lens_blk)

    while True:
        buf_p, buf_s, buf_e, n_spans, max_cand, max_span = _scan_mega(
            mega_dev, st_dev, en_dev, probes_oh, codes_flat, lens_dev,
            jnp.int32(min(searcher.lcf_static, 1 << 30)), jnp.int32(k_seed),
            A=A, L=L, K=K, na_blk=na_blk, n_tiles=n_tiles, cap_blk=cap_blk,
            span_cap_tile=span_cap_tile, span_cap=span_cap,
            seed_req=seed_req, fast_ok=searcher.fast_ok)
        n = int(n_spans)
        mc, ms = int(max_cand), int(max_span)
        if mc <= cap_blk and ms <= span_cap_tile and n <= span_cap:
            break
        if mc > cap_blk:
            cap_blk = encode.next_pow2(mc)
        if ms > span_cap_tile:
            span_cap_tile = encode.next_pow2(ms)
        if n > span_cap:
            span_cap = encode.next_pow2(
                int(n * (1.0 if ms <= span_cap_tile else 2.0)) + 1)

    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    m = min(encode.next_pow2(n), span_cap)
    p = np.asarray(buf_p[:m])[:n].astype(np.int64)
    s = np.asarray(buf_s[:m])[:n].astype(np.int64)
    e = np.asarray(buf_e[:m])[:n].astype(np.int64)
    # Attribute each span to its sequence and convert to local coords
    sidx = np.searchsorted(ends, s, side="right")
    s_local = s - starts[sidx]
    e_local = e - starts[sidx]
    return p, sidx.astype(np.int64), s_local, e_local
