"""Retrieval tests: exact correctness, LSH recall bounds, IVF recall +
inverted-list integrity, benchmark harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.retrieval import bench, exact, ivf, lsh


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    # Clustered corpus so ANN recall is meaningful.
    centers = rng.standard_normal((10, 32)).astype(np.float32) * 3
    x = np.concatenate([
        centers[i] + rng.standard_normal((100, 32)).astype(np.float32)
        for i in range(10)
    ])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[::97][:8]
    return x, q


def test_exact_matches_numpy(corpus):
    x, q = corpus
    idx = exact.ExactIndex(x.shape[1])
    idx.build(x)
    d, i = idx.search(q, k=5)
    d, i = np.asarray(d), np.asarray(i)
    # Numpy reference
    dist = ((q[:, None] - x[None]) ** 2).sum(-1)
    ref = np.argsort(dist, axis=1)[:, :5]
    for r in range(q.shape[0]):
        assert set(i[r]) == set(ref[r])
    assert (np.diff(d, axis=1) >= -1e-5).all()
    # Query itself is its own nearest neighbor (distance ~0).
    assert d[:, 0] == pytest.approx(0.0, abs=1e-4)


def test_lsh_pack_bits():
    signs = jnp.array([[True] + [False] * 31 + [False] * 31 + [True]])
    packed = lsh._pack_bits(signs)
    assert packed.shape == (1, 2)
    assert int(packed[0, 0]) == 1
    assert int(packed[0, 1]) == 1 << 31


def test_lsh_recall(corpus):
    x, q = corpus
    index = lsh.LSHIndex(x.shape[1], num_bits=128, num_tables=4, seed=0)
    index.build(x)
    d, i = index.search(q, k=10)
    assert np.asarray(i).shape == (8, 10)
    # Recall vs exact must beat random chance by a wide margin.
    ex = exact.ExactIndex(x.shape[1]); ex.build(x)
    _, ei = ex.search(q, k=10)
    recall = np.mean([
        len(set(np.asarray(i)[r]) & set(np.asarray(ei)[r])) / 10
        for r in range(8)
    ])
    assert recall > 0.3  # random chance would be 10/1000 = 0.01


def test_lsh_identical_vector_zero_distance(corpus):
    x, q = corpus
    index = lsh.LSHIndex(x.shape[1], num_bits=64, num_tables=2)
    index.build(x)
    d, i = index.search(x[:3], k=1)
    assert (np.asarray(d)[:, 0] == 0).all()


def test_kmeans_partitions(corpus):
    x, _ = corpus
    cent, assign = ivf.kmeans(jnp.asarray(x), jax.random.PRNGKey(0), 10)
    a = np.asarray(assign)
    assert a.shape == (1000,)
    assert len(np.unique(a)) >= 5  # nondegenerate clustering


def test_ivf_recall_and_ids(corpus):
    x, q = corpus
    index = ivf.WeakANDIndex(x.shape[1], num_partitions=10, nprobe=3)
    index.build(x)
    d, i = index.search(q, k=10)
    i = np.asarray(i)
    assert ((i >= -1) & (i < 1000)).all()
    ex = exact.ExactIndex(x.shape[1]); ex.build(x)
    _, ei = ex.search(q, k=10)
    recall = np.mean([
        len(set(i[r][i[r] >= 0]) & set(np.asarray(ei)[r])) / 10 for r in range(8)
    ])
    # Probing 3/10 clusters of a well-separated mixture: high recall.
    assert recall > 0.5


def test_ivf_full_probe_equals_exact(corpus):
    x, q = corpus
    index = ivf.WeakANDIndex(x.shape[1], num_partitions=5, nprobe=5)
    index.build(x)
    _, i = index.search(q, k=5)
    ex = exact.ExactIndex(x.shape[1]); ex.build(x)
    _, ei = ex.search(q, k=5)
    for r in range(q.shape[0]):
        assert set(np.asarray(i)[r].tolist()) == set(np.asarray(ei)[r].tolist())


def test_benchmark_harness(corpus):
    x, q = corpus
    from movie_recommendation_engine_tpu import small_test_config

    cfg = small_test_config()
    cfg.search.ivf_partitions = 10
    results = bench.benchmark_search_methods(x, q, k=10, cfg=cfg, repeats=1)
    assert set(results) == {"exact", "lsh", "ivf"}
    for m, data in results.items():
        assert data["search_time"] > 0
        assert data["index_size"] == 1000
    assert 0.0 <= results["lsh"]["recall"] <= 1.0
    assert 0.0 <= results["ivf"]["recall"] <= 1.0


def test_lsh_matmul_impl_matches_popcount():
    """MXU Hamming (ham = (B - q.s)/2 on +-1 signatures) must be exactly the
    packed-bit popcount distances — same signatures, exact f32 integer dots."""
    import numpy as np

    from movie_recommendation_engine_tpu.retrieval.lsh import LSHIndex

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((500, 24)).astype(np.float32)
    q = rng.standard_normal((17, 24)).astype(np.float32)
    a = LSHIndex(24, num_bits=64, num_tables=4, hamming_impl="popcount")
    b = LSHIndex(24, num_bits=64, num_tables=4, hamming_impl="matmul")
    a.build(emb)
    b.build(emb)
    da, ia = (np.asarray(x) for x in a.search(q, k=12))
    db, ib = (np.asarray(x) for x in b.search(q, k=12))
    np.testing.assert_array_equal(da, db)
    # Tie order within equal distances may differ; compare per-distance sets.
    for r in range(q.shape[0]):
        for dist in np.unique(da[r]):
            assert (set(ia[r][da[r] == dist].tolist())
                    == set(ib[r][db[r] == dist].tolist()))


def test_lsh_rerank_improves_recall_and_matches_impls(corpus):
    """Shortlist-then-rerank: (a) recall@10 must dominate the plain Hamming
    ranking, (b) matmul (fused one-program) and popcount (two-program) paths
    must agree on the reranked result, (c) scores are exact inner products
    in descending order."""
    x, q = corpus
    k = 10
    ex = exact.ExactIndex(x.shape[1]); ex.build(x)
    _, ei = ex.search(q, k=k)
    ei = np.asarray(ei)

    def recall(i):
        i = np.asarray(i)
        return np.mean([len(set(i[r]) & set(ei[r])) / k
                        for r in range(q.shape[0])])

    plain = lsh.LSHIndex(x.shape[1], num_bits=128, num_tables=4, seed=0)
    plain.build(x)
    _, pi = plain.search(q, k=k)

    rr = lsh.LSHIndex(x.shape[1], num_bits=128, num_tables=4, seed=0,
                      rerank=100, hamming_impl="popcount")
    rr.build(x)
    rs, ri = rr.search(q, k=k)
    rs, ri = np.asarray(rs), np.asarray(ri)
    assert recall(ri) >= recall(pi)
    assert recall(ri) > 0.8  # 100-candidate shortlist on clustered data

    rrm = lsh.LSHIndex(x.shape[1], num_bits=128, num_tables=4, seed=0,
                       rerank=100, hamming_impl="matmul")
    rrm.build(x)
    ms, mi = rrm.search(q, k=k)
    np.testing.assert_array_equal(ri, np.asarray(mi))
    np.testing.assert_allclose(rs, np.asarray(ms), rtol=1e-5, atol=1e-5)

    # Distances are true squared L2 (ExactIndex's expansion), ascending.
    assert (np.diff(rs, axis=1) >= -1e-6).all()
    true_d2 = ((q[:, None, :] - x[np.asarray(ri)]) ** 2).sum(-1)
    np.testing.assert_allclose(rs, true_d2, rtol=1e-3, atol=1e-4)

    # rerank toggles after build, both directions (like hamming_impl).
    rrm.rerank = 0
    pd, _ = rrm.search(q, k=k)
    assert np.asarray(pd).dtype == np.int32  # plain Hamming distances
    plain.rerank = 100
    ts, ti = plain.search(q, k=k)
    np.testing.assert_array_equal(np.asarray(ti), ri)


def test_lsh_rerank_k_exceeds_shortlist(corpus):
    """rerank smaller than k must degrade gracefully (shortlist = k)."""
    x, q = corpus
    idx = lsh.LSHIndex(x.shape[1], num_bits=64, num_tables=2, rerank=3)
    idx.build(x)
    s, i = idx.search(q, k=8)
    assert np.asarray(i).shape == (q.shape[0], 8)
    # All indices valid and unique per row.
    i = np.asarray(i)
    for r in range(q.shape[0]):
        assert len(set(i[r].tolist())) == 8
        assert (i[r] >= 0).all() and (i[r] < x.shape[0]).all()


def test_ivf_balanced_build_caps_lists():
    """Skewed data (one dominant cluster) must not blow up the scan budget:
    balance_factor caps every inverted list at ~factor x the mean size."""
    rng = np.random.default_rng(3)
    n, d, p = 4000, 32, 20
    # 70% of rows literally identical: Lloyd can't split ties (identical
    # rows share one argmin), guaranteeing a dominant inverted list — the
    # real-world failure mode in miniature (near-duplicate embeddings).
    blob = np.tile(0.05 * rng.standard_normal((1, d)), (int(n * 0.7), 1))
    rest = rng.standard_normal((n - blob.shape[0], d)) + 4.0
    x = np.concatenate([blob, rest]).astype(np.float32)

    raw = ivf.WeakANDIndex(d, num_partitions=p, nprobe=5, balance_factor=0.0)
    raw.build(x)
    bal = ivf.WeakANDIndex(d, num_partitions=p, nprobe=5, balance_factor=4.0)
    bal.build(x)
    cap = int(np.ceil(4.0 * n / p))
    assert bal._max_list <= cap
    # The skew really was there: the unbalanced build exceeds the cap.
    assert raw._max_list > cap

    # Quality: balanced recall@10 vs exact stays high on the skewed corpus.
    # Query only distinct rows — exact top-k among 2800 identical blob rows
    # is tie-ambiguous, which would make set-recall meaningless.
    q = x[blob.shape[0] + rng.choice(rest.shape[0], 16, replace=False)]
    ex = exact.ExactIndex(d); ex.build(x)
    _, ei = ex.search(q, k=10)
    _, bi = bal.search(q, k=10)
    bi, ei = np.asarray(bi), np.asarray(ei)
    recall = np.mean([
        len(set(bi[r][bi[r] >= 0]) & set(ei[r])) / 10 for r in range(q.shape[0])
    ])
    assert recall >= 0.9


def test_ivf_balance_assignment_invariants():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    cent = rng.standard_normal((10, 8)).astype(np.float32)
    d2 = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
    assign = d2.argmin(1)
    cap = 60
    out = ivf.balance_assignments(x, cent, assign, cap)
    counts = np.bincount(out, minlength=10)
    assert counts.max() <= cap
    assert counts.sum() == 500
    # Rows already under cap keep their nearest centroid.
    under = np.isin(assign, np.flatnonzero(np.bincount(assign, minlength=10) <= cap))
    np.testing.assert_array_equal(out[under], assign[under])


def test_ivf_balance_infeasible_cap_raised_to_floor():
    """cap * P < N has no feasible assignment; the cap must be raised to
    ceil(N/P) so every list still honors a real bound (silently leaving
    rows in an overfull list would break the scan-budget promise)."""
    rng = np.random.default_rng(6)
    n, p, d = 503, 10, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    cent = rng.standard_normal((p, d)).astype(np.float32)
    assign = ((x[:, None, :] - cent[None]) ** 2).sum(-1).argmin(1)
    out = ivf.balance_assignments(x, cent, assign, cap=10)  # 10*10 < 503
    counts = np.bincount(out, minlength=p)
    floor = -(-n // p)
    assert counts.max() <= floor
    assert counts.sum() == n


def test_ivf_search_transient_is_probe_chunked():
    """The candidate gather must be [Q, budget, D] per scan step, never
    [Q, nprobe*budget, D]: search a corpus where the monolithic form would
    allocate ~0.8 GB and assert it completes with modest peak (smoke: just
    run it — the old form OOMed CI-sized hosts at larger shapes)."""
    rng = np.random.default_rng(5)
    n, d = 20_000, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    index = ivf.WeakANDIndex(d, num_partitions=8, nprobe=8, balance_factor=0.0)
    index.build(x)
    q = x[:256]
    dist, ids = index.search(q, k=10)
    ids = np.asarray(ids)
    assert ids.shape == (256, 10)
    # Self-match: each query's own row must be its top hit.
    assert (ids[:, 0] == np.arange(256)).mean() > 0.99


def test_tunnel_backend_detection(monkeypatch):
    """The axon plugin canonicalizes its platform to "tpu", so
    default_backend() must never be the only Pallas gate (round-2 wedge)."""
    import jax

    from movie_recommendation_engine_tpu.core import backend as be

    prev = jax.config.jax_platforms
    try:
        jax.config.update("jax_platforms", "axon")
        assert be.is_tunnel_backend()
        assert not be.pallas_supported()

        jax.config.update("jax_platforms", "cpu")
        monkeypatch.setenv("JAX_PLATFORMS", "axon")  # env forced, config wins
        assert not be.is_tunnel_backend()

        jax.config.update("jax_platforms", "")
        assert be.is_tunnel_backend()  # falls back to the env signal
    finally:
        jax.config.update("jax_platforms", prev)
