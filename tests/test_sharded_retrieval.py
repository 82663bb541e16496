"""Distributed exact retrieval over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommendation_engine_tpu.parallel import mesh as mesh_mod
from movie_recommendation_engine_tpu.retrieval import sharded


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh((2, 4))


def test_sharded_topk_matches_dense(mesh8):
    rng = np.random.default_rng(0)
    n, d, q = 64, 16, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[rng.choice(n, q, replace=False)]

    emb_sharded, orig = sharded.shard_embeddings(mesh8, emb)
    scores, idx = sharded.sharded_similarity_topk(
        mesh8, emb_sharded, jnp.asarray(queries), k=7
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    dense = queries @ emb.T
    ref_idx = np.argsort(-dense, axis=1)[:, :7]
    for r in range(q):
        assert set(idx[r]) == set(ref_idx[r]), r
        np.testing.assert_allclose(
            scores[r], np.sort(dense[r])[::-1][:7], atol=1e-5
        )


def test_sharded_topk_k_larger_than_chunk(mesh8):
    rng = np.random.default_rng(1)
    n, d = 16, 8   # chunk = 4 rows/shard on the 4-way model axis
    emb = rng.standard_normal((n, d)).astype(np.float32)
    queries = emb[:2]
    emb_sharded, _ = sharded.shard_embeddings(mesh8, emb)
    scores, idx = sharded.sharded_similarity_topk(
        mesh8, emb_sharded, jnp.asarray(queries), k=4
    )
    dense = queries @ emb.T
    ref_idx = np.argsort(-dense, axis=1)[:, :4]
    for r in range(2):
        assert set(np.asarray(idx)[r]) == set(ref_idx[r])


def test_sharded_exact_index_matches_exact(mesh8):
    from movie_recommendation_engine_tpu.retrieval.exact import ExactIndex

    rng = np.random.default_rng(2)
    n, d = 103, 16  # deliberately NOT divisible by the 4-way model axis
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((6, d)).astype(np.float32)

    ref = ExactIndex(d)
    ref.build(emb)
    rd, ri = (np.asarray(x) for x in ref.search(q, k=9))

    idx = sharded.ShardedExactIndex(d, mesh=mesh8)
    idx.build(emb)
    assert idx.ntotal == n
    sd, si = (np.asarray(x) for x in idx.search(q, k=9))

    np.testing.assert_allclose(np.sort(sd, axis=1), np.sort(rd, axis=1),
                               atol=1e-4)
    for r in range(q.shape[0]):
        assert set(si[r]) == set(ri[r]), r
        assert si[r].max() < n  # padding rows never surface


def test_server_over_sharded_index():
    from movie_recommendation_engine_tpu.retrieval.server import (
        BatchingRecommender,
    )

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((90, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    r = BatchingRecommender(emb, method="sharded_exact", max_batch=4, max_k=8)
    try:
        out = r.recommend_by_item(5, k=4)
        dense = ((emb[5][None, :] - emb) ** 2).sum(axis=1)
        expect = [i for i in np.argsort(dense) if i != 5][:4]
        assert out["indices"] == [int(i) for i in expect]
    finally:
        r.close()


def test_sharded_ivf_matches_single_chip(mesh8):
    from movie_recommendation_engine_tpu.retrieval.ivf import WeakANDIndex

    rng = np.random.default_rng(4)
    n, d = 237, 16   # not divisible by the 4-way model axis; skewed lists
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb[:80] += 2.0  # force uneven k-means clusters
    q = np.concatenate([emb[rng.choice(n, 5, replace=False)],
                        rng.standard_normal((3, d)).astype(np.float32)])

    kw = dict(num_partitions=12, nprobe=5, seed=0, balance_factor=4.0)
    ref = WeakANDIndex(d, **kw)
    ref.build(emb)
    rd, ri = (np.asarray(x) for x in ref.search(q, k=9))

    idx = sharded.ShardedIVFIndex(d, mesh=mesh8, **kw)
    idx.build(emb)
    assert idx.ntotal == n
    sd, si = (np.asarray(x) for x in idx.search(q, k=9))

    # Identical-by-construction: same probes, same candidates, same metric.
    np.testing.assert_allclose(np.sort(sd, axis=1), np.sort(rd, axis=1),
                               rtol=1e-5, atol=1e-4)
    for r in range(q.shape[0]):
        assert set(si[r]) == set(ri[r]), r
        assert si[r].max() < n  # group padding rows never surface


def test_sharded_ivf_build_never_runs_single_device_pass(mesh8, monkeypatch):
    """VERDICT r3 #4: the old build ran the unsharded WeakANDIndex.build
    (full-table k-means + reorder on one device) before partitioning. The
    distributed build must never call it, never materialize the base
    index's device arrays, and keep every per-device shard at ~N/S rows."""
    from movie_recommendation_engine_tpu.retrieval.ivf import WeakANDIndex

    def boom(self, embeddings):
        raise AssertionError("single-device WeakANDIndex.build was called")

    monkeypatch.setattr(WeakANDIndex, "build", boom)

    rng = np.random.default_rng(7)
    n, d = 203, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    idx = sharded.ShardedIVFIndex(d, mesh=mesh8, num_partitions=10, nprobe=4)
    idx.build(emb)
    assert idx.ntotal == n
    assert idx._base._emb is None and idx._base._norm2 is None
    # Per-device resident rows = the padded chunk, ~N/S (group padding only).
    size = mesh8.shape["model"]
    for s in idx._emb.addressable_shards:
        assert s.data.shape[0] == idx._chunk
    assert idx._chunk * size >= n
    assert idx._chunk <= n  # no shard ever holds the whole table
    d_, i_ = (np.asarray(x) for x in idx.search(emb[:4], k=5))
    assert (i_[:, 0] == np.arange(4)).all()      # self-match survives


def test_sharded_kmeans_matches_single_chip_on_separated_clusters(mesh8):
    from movie_recommendation_engine_tpu.retrieval.ivf import kmeans
    from movie_recommendation_engine_tpu.retrieval.sharded import (
        sharded_kmeans, shard_embeddings,
    )

    rng = np.random.default_rng(8)
    n, d, p = 96, 8, 4
    centers = rng.standard_normal((p, d)).astype(np.float32) * 20.0
    x = (centers[np.arange(n) % p]
         + rng.standard_normal((n, d)).astype(np.float32) * 0.1)

    c_ref, a_ref = kmeans(jnp.asarray(x), jax.random.PRNGKey(0), p)
    x_sh, _ = shard_embeddings(mesh8, x)
    c_sh, a_sh = sharded_kmeans(mesh8, x_sh, jnp.take(
        jnp.asarray(x), jax.random.choice(jax.random.PRNGKey(0), n,
                                          shape=(p,), replace=False), axis=0),
        valid_rows=n)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a_sh)[:n], np.asarray(a_ref))
    assert (np.asarray(a_sh)[n:] == -1).all()    # padding rows masked


def test_balance_bounded_matches_full_table_variant():
    from movie_recommendation_engine_tpu.retrieval.ivf import (
        balance_assignments, kmeans,
    )
    from movie_recommendation_engine_tpu.retrieval.sharded import (
        balance_assignments_bounded,
    )

    rng = np.random.default_rng(9)
    n, d, p = 150, 8, 6
    x = rng.standard_normal((n, d)).astype(np.float32)
    x[:90] += 3.0                                 # one overfull region
    c, a = kmeans(jnp.asarray(x), jax.random.PRNGKey(1), p)
    c, a = np.asarray(c), np.asarray(a)
    cap = 30
    full = balance_assignments(x, c, a.copy(), cap)
    bounded = balance_assignments_bounded(x, c, a.copy(), cap)
    np.testing.assert_array_equal(full, bounded)
    assert np.bincount(bounded, minlength=p).max() <= max(cap, -(-n // p))


def test_sharded_ivf_probe_all_is_exact(mesh8):
    from movie_recommendation_engine_tpu.retrieval.exact import ExactIndex

    rng = np.random.default_rng(5)
    n, d = 64, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)

    ref = ExactIndex(d)
    ref.build(emb)
    rd, ri = (np.asarray(x) for x in ref.search(q, k=6))

    idx = sharded.ShardedIVFIndex(d, mesh=mesh8, num_partitions=8, nprobe=8)
    idx.build(emb)
    sd, si = (np.asarray(x) for x in idx.search(q, k=6))

    np.testing.assert_allclose(np.sort(sd, axis=1), np.sort(rd, axis=1),
                               rtol=1e-5, atol=1e-4)
    for r in range(q.shape[0]):
        assert set(si[r]) == set(ri[r]), r


def test_server_over_sharded_ivf():
    from movie_recommendation_engine_tpu.retrieval.server import (
        BatchingRecommender,
    )

    rng = np.random.default_rng(6)
    emb = rng.standard_normal((90, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    r = BatchingRecommender(emb, method="sharded_ivf", max_batch=4, max_k=8)
    try:
        out = r.recommend_by_item(7, k=4)
        # deterministic (seeded build): top-4 all live in probed lists
        dense = ((emb[7][None, :] - emb) ** 2).sum(axis=1)
        expect = [i for i in np.argsort(dense) if i != 7][:4]
        assert out["indices"] == [int(i) for i in expect]
    finally:
        r.close()
