"""MinHash clustering: estimator parity and clustering behavior.

The reference exercises clustering via its cluster.py unit tests
(signatures, Mash->Jaccard conversion, connected components with the
early-stop heuristic, hierarchical linkage).  Here additionally the
block-computed distance matrix must equal the row-at-a-time kernel
(the connected-components DFS runs on the precomputed host matrix).
"""

import numpy as np

from catch_tpu.utils import cluster, lsh


def _family_seqs(rng, n_families, copies, length, family_mut=0.35,
                 copy_mut=0.01):
    bases = np.array(list("ACGT"))
    seqs = {}
    for f in range(n_families):
        base = rng.choice(bases, size=length)
        for c in range(copies):
            s = base.copy()
            m = rng.random(length) < copy_mut
            s[m] = rng.choice(bases, size=int(m.sum()))
            seqs[f"f{f}c{c}"] = "".join(s)
    return seqs


def test_block_matrix_matches_row_kernel():
    rng = np.random.default_rng(3)
    seqs = _family_seqs(rng, 3, 7, 800)
    family = lsh.MinHashFamily(12, N=50)
    sig_map = cluster.make_signatures_with_minhash(family, seqs)
    sigs = [sig_map[k] for k in seqs]
    dd = cluster._DeviceDistances(sigs)
    dd._BLOCK = 8          # force multiple blocks + row padding
    full = dd.full_matrix()
    assert full.shape == (len(sigs), len(sigs))
    for j in range(len(sigs)):
        assert np.allclose(full[j], dd.row(j)), j


def test_code_matrix_matches_thresholded_floats():
    """The integer-coded adjacency must equal thresholding the float
    distances with the row kernel's comparison semantics."""
    rng = np.random.default_rng(7)
    seqs = _family_seqs(rng, 3, 6, 700, copy_mut=0.08)
    family = lsh.MinHashFamily(12, N=40)
    sig_map = cluster.make_signatures_with_minhash(family, seqs)
    sigs = [sig_map[k] for k in seqs]
    dd = cluster._DeviceDistances(sigs)
    dd._BLOCK = 8
    thr, early = 0.62, 0.30
    codes = dd.code_matrix(thr, early)
    full = dd.full_matrix().astype(np.float64)
    want = (full <= thr).astype(np.uint8) + (full <= early).astype(np.uint8)
    assert np.array_equal(codes, want)


def test_simple_clustering_separates_families():
    rng = np.random.default_rng(11)
    seqs = _family_seqs(rng, 4, 10, 1200)
    clusters = cluster.cluster_with_minhash_signatures(
        seqs, threshold=0.15, cluster_method="simple")
    assert len(clusters) == 4
    for c in clusters:
        fams = {name.split("c")[0] for name in c}
        assert len(fams) == 1, "a cluster must hold one family"
    assert sum(len(c) for c in clusters) == len(seqs)


def test_hierarchical_clustering_separates_families():
    rng = np.random.default_rng(13)
    seqs = _family_seqs(rng, 3, 8, 1200)
    clusters = cluster.cluster_with_minhash_signatures(
        seqs, threshold=0.15, cluster_method="hierarchical")
    assert len(clusters) == 3
    for c in clusters:
        fams = {name.split("c")[0] for name in c}
        assert len(fams) == 1


def test_threshold_below_early_stop_does_not_over_merge():
    """With a clustering threshold below the (fixed) early-stop
    threshold, pairs within early but beyond the threshold are NOT
    adjacent (the DFS nests early inside the threshold test); the
    coded path must match the float-row path exactly (regression: the
    additive coding treated them as within-threshold and merged
    unrelated clusters)."""
    rng = np.random.default_rng(21)
    # family copies ~1.5% apart: Jaccard distance ~0.28 — within the
    # early-stop threshold (0.352) but beyond threshold=0.01's Jaccard
    # threshold (0.203), the band the additive coding got wrong
    seqs = _family_seqs(rng, 3, 2, 900, copy_mut=0.0075)
    clusters = cluster.cluster_with_minhash_signatures(
        seqs, threshold=0.01, cluster_method="simple")
    # reference semantics via the float row kernel
    family = lsh.MinHashFamily(12, N=100)
    sig_map = cluster.make_signatures_with_minhash(
        family, dict(seqs))
    # independent check: every cluster from the coded path must also
    # be a connected component of the float-thresholded graph
    names = list(seqs.keys())
    sigs = [sig_map[n] for n in names]
    dd = cluster._DeviceDistances(sigs)
    thr = cluster._jaccard_dist_from_mash_dist(0.01, 12)
    want = cluster.find_connected_components(len(sigs), dd.row, thr)
    got_idx = sorted(sorted(names.index(n) for n in c)
                     for c in clusters)
    assert got_idx == sorted(want)


class TestGreedyLeaderClustering:
    """The scalable leader method (cluster_greedy_from_signatures):
    exact agreement with the connected-components method on
    clade-structured input, wave-boundary behavior, and the automatic
    switch above _ALL_PAIRS_MAX sequences."""

    def test_matches_simple_on_clade_structured_input(self):
        rng = np.random.default_rng(31)
        seqs = _family_seqs(rng, 5, 12, 1000)
        got = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="greedy")
        want = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="simple")
        assert sorted(map(sorted, got)) == sorted(map(sorted, want))

    def test_first_wave_leaders_join_within_wave(self, monkeypatch):
        """Leftovers must be able to join a leader created earlier in
        the same wave (wave 1 has no representatives at all)."""
        monkeypatch.setattr(cluster, "_WAVE", 8)
        rng = np.random.default_rng(33)
        seqs = _family_seqs(rng, 2, 3, 900)   # 6 seqs, all in wave 1
        got = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="greedy")
        assert len(got) == 2
        for c in got:
            assert len({n.split("c")[0] for n in c}) == 1

    def test_wave_boundaries_do_not_change_output(self, monkeypatch):
        # Holds for clade-structured input (each genome decisively
        # nearest its own clade's leader); borderline genomes near the
        # threshold of TWO leaders may legitimately move between
        # clusters as the wave width changes (see the greedy
        # docstring) — this test asserts the clade case only.
        rng = np.random.default_rng(35)
        seqs = _family_seqs(rng, 4, 9, 800)
        base = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="greedy")
        for wave in (4, 7, 64):
            monkeypatch.setattr(cluster, "_WAVE", wave)
            got = cluster.cluster_with_minhash_signatures(
                seqs, threshold=0.15, cluster_method="greedy")
            assert sorted(map(sorted, got)) == \
                sorted(map(sorted, base)), wave

    def test_auto_switch_above_all_pairs_cutoff(self, monkeypatch,
                                                caplog):
        monkeypatch.setattr(cluster, "_ALL_PAIRS_MAX", 20)
        rng = np.random.default_rng(37)
        seqs = _family_seqs(rng, 3, 9, 700)   # 27 > 20
        import logging
        with caplog.at_level(logging.WARNING):
            got = cluster.cluster_with_minhash_signatures(
                seqs, threshold=0.15, cluster_method="simple")
        assert "greedy" in caplog.text
        assert len(got) == 3
        assert sum(len(c) for c in got) == len(seqs)

    def test_deterministic(self):
        rng = np.random.default_rng(39)
        seqs = _family_seqs(rng, 3, 6, 600)
        a = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="greedy")
        b = cluster.cluster_with_minhash_signatures(
            seqs, threshold=0.15, cluster_method="greedy")
        assert a == b


def test_single_sequence():
    clusters = cluster.cluster_with_minhash_signatures(
        {"only": "ACGT" * 50}, threshold=0.15, cluster_method="simple")
    assert clusters == [["only"]]


def test_device_modmul_exact():
    """The uint32 limb modular multiply used for on-device MinHash
    signatures must equal the uint64 (a*x + b) % p for all operand
    ranges, including the inclusive extremes of the rng draws."""
    import jax.numpy as jnp

    p = np.uint64(2**31 - 1)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**31 - 1, size=4096).astype(np.uint64)
    cases = [(int(a), int(b)) for a, b in
             rng.integers(0, 2**31, size=(40, 2))]
    cases += [(1, 0), (2**31 - 1, 2**31 - 1), (2**31 - 2, 0),
              (2**16, 2**16), (2**31 - 1, 0), (12345, 2**31 - 1)]
    for a, b in cases:
        want = (np.uint64(a) * x + np.uint64(b)) % p
        got = np.asarray(lsh._modmul_affine_u32(
            jnp.asarray(x.astype(np.uint32)), jnp.uint32(a),
            jnp.uint32(b)))
        assert np.array_equal(got.astype(np.uint64), want), (a, b)


def test_device_signatures_match_numpy():
    """The device signature kernel must reproduce the numpy path's
    minima bit for bit."""
    rng = np.random.default_rng(4)
    U, n, H = 64, 91, 75
    codes = rng.integers(0, 2**31 - 1, size=(U, n)).astype(np.uint64)
    ab = rng.integers(0, 2**31, size=(H, 2)).astype(np.uint64)
    ab[0] = (2**31 - 1, 2**31 - 1)
    dev = lsh._device_signatures(codes, ab)
    assert dev is not None
    p = np.uint64(2**31 - 1)
    for t in range(H):
        want = ((ab[t, 0] * codes + ab[t, 1]) % p).min(axis=1)
        assert np.array_equal(dev[:, t], want), t


def test_jaccard_from_mash_reference_values():
    # Eq. 4 of Ondov et al. 2016 at the reference's default k=12
    got = cluster._jaccard_dist_from_mash_dist(0.02, 12)
    assert abs(got - (1.0 - 1.0 / (2.0 * np.exp(0.24) - 1.0))) < 1e-12
