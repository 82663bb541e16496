"""Batched recommendation server (retrieval/server.py): correctness under
concurrency, exclusion semantics, batching/stat counters, HTTP front-end."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from movie_recommendation_engine_tpu.retrieval.server import (
    BatchingRecommender,
    make_http_server,
)


def _unit_rows(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def rec():
    emb = _unit_rows(256, 16)
    r = BatchingRecommender(emb, method="exact", max_batch=16,
                            max_wait_ms=1.0, max_k=32)
    yield r
    r.close()


def _exact_topk(emb, q, k, exclude=()):
    d = ((q[None, :] - emb) ** 2).sum(axis=1)
    order = [i for i in np.argsort(d) if i not in set(exclude)]
    return order[:k]


def test_item_query_matches_numpy(rec):
    out = rec.recommend_by_item(7, k=5)
    expect = _exact_topk(rec.emb, rec.emb[7], 5, exclude=[7])
    assert out["indices"] == [int(i) for i in expect]
    assert 7 not in out["indices"]
    assert len(out["scores"]) == 5
    # scores = -distance, so descending.
    assert out["scores"] == sorted(out["scores"], reverse=True)


def test_history_query_excludes_history(rec):
    hist = [3, 9, 40]
    out = rec.recommend_by_history(hist, k=10)
    q = rec.emb[hist].mean(axis=0)
    q /= np.linalg.norm(q)
    expect = _exact_topk(rec.emb, q, 10, exclude=hist)
    assert out["indices"] == [int(i) for i in expect]
    assert not set(hist) & set(out["indices"])


def test_vector_query_and_k_clamp(rec):
    out = rec.recommend_by_vector(rec.emb[0], k=10_000)  # clamps to max_k
    assert len(out["indices"]) == rec.max_k


def test_out_of_range_rejected(rec):
    with pytest.raises(IndexError):
        rec.recommend_by_item(100_000)
    with pytest.raises(IndexError):
        rec.recommend_by_history([0, 99_999])
    with pytest.raises(ValueError):
        rec.recommend_by_history([])


def test_concurrent_requests_all_correct_and_batched():
    emb = _unit_rows(256, 16)
    r = BatchingRecommender(emb, method="exact", max_batch=16,
                            max_wait_ms=200.0, max_k=32)
    try:
        # Non-blocking submits: all 48 are queued well inside the 200 ms
        # batching linger, so coalescing is deterministic (3 batches of 16).
        futures = [r.submit(emb[i], 3, np.asarray([i])) for i in range(48)]
        for i, f in enumerate(futures):
            expect = _exact_topk(emb, emb[i], 3, exclude=[i])
            assert f.result(timeout=30)["indices"] == [int(j) for j in expect]
        s = r.stats()
        assert s["num_requests"] == 48
        assert s["num_batches"] < s["num_requests"]
        assert s["mean_batch_size"] > 1
        assert s["latency_ms_p50"] > 0
    finally:
        r.close()


def test_rejects_bad_k(rec):
    with pytest.raises(ValueError):
        rec.recommend_by_item(3, k=0)
    with pytest.raises(ValueError):
        rec.recommend_by_item(3, k=-1)


def test_large_history_exclusion_not_starved():
    emb = _unit_rows(200, 16, seed=3)
    r = BatchingRecommender(emb, method="exact", max_batch=4, max_k=64,
                            exclusion_headroom=4)
    try:
        hist = list(range(60))  # exclude list far beyond the headroom
        out = r.recommend_by_history(hist, k=64)
        assert len(out["indices"]) == 64  # over-fetch grew to cover exclusion
        assert not set(hist) & set(out["indices"])
    finally:
        r.close()


def test_lsh_method_recall():
    emb = _unit_rows(300, 32, seed=1)
    r = BatchingRecommender(emb, method="lsh", max_batch=8, max_k=20)
    try:
        hits = 0
        for i in range(20):
            out = r.recommend_by_item(i, k=10)
            expect = set(_exact_topk(emb, emb[i], 10, exclude=[i]))
            hits += len(expect & set(out["indices"]))
        assert hits / 200 > 0.5  # LSH recall well above chance
    finally:
        r.close()


def test_http_server_roundtrip():
    emb = _unit_rows(128, 16, seed=2)
    movie_ids = np.arange(128) * 10 + 1  # external ids != indices
    titles = [f"Movie {i}" for i in range(128)]
    rec = BatchingRecommender(emb, method="exact", max_batch=8, max_k=16)
    httpd = make_http_server(rec, "127.0.0.1", 0, movie_ids=movie_ids,
                             titles=titles)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/health"))
        assert health["status"] == "ok" and health["ntotal"] == 128

        got = json.load(urllib.request.urlopen(f"{base}/recommend?movie_id=51&k=4"))
        expect = _exact_topk(emb, emb[5], 4, exclude=[5])  # id 51 -> idx 5
        assert got["indices"] == [int(i) for i in expect]
        assert got["movie_ids"] == [int(movie_ids[i]) for i in expect]
        assert got["titles"][0] == f"Movie {expect[0]}"

        body = json.dumps({"history": [1, 11], "k": 3}).encode()
        req = urllib.request.Request(f"{base}/recommend", data=body,
                                     headers={"Content-Type": "application/json"})
        got = json.load(urllib.request.urlopen(req))
        assert len(got["indices"]) == 3
        assert not {0, 1} & set(got["indices"])

        # Malformed requests -> 400 with a JSON error, not a dropped
        # connection: unknown movieId, k=null, non-dict body, negative k.
        def expect_400(url, data=None):
            req = (urllib.request.Request(url, data=data) if data else url)
            try:
                urllib.request.urlopen(req)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "error" in json.load(e)

        expect_400(f"{base}/recommend?movie_id=999999")
        expect_400(f"{base}/recommend?movie_id=51&k=-2")
        expect_400(f"{base}/recommend", json.dumps({"movie_id": 51, "k": None}).encode())
        expect_400(f"{base}/recommend", json.dumps([1, 2, 3]).encode())
        expect_400(f"{base}/recommend", json.dumps({"history": 3}).encode())

        stats = json.load(urllib.request.urlopen(f"{base}/stats"))
        assert stats["num_requests"] >= 2
    finally:
        httpd.shutdown()
        rec.close()


@pytest.mark.parametrize("method,single", [("sharded_exact", "exact"),
                                           ("sharded_ivf", "ivf")])
def test_server_over_sharded_index_matches_single_chip(method, single):
    """The production serving surface over the distributed indexes
    (VERDICT r4 #8): BatchingRecommender's make_index wiring accepts
    sharded_exact/sharded_ivf, but the two had never been co-executed.
    Runs both servers over the 8-device CPU mesh corpus and asserts the
    sharded results equal the single-chip server's.

    ivf arms: exhaustive probing (nprobe = partitions) so both indexes are
    exact and the comparison is deterministic, matching the ShardedIVFIndex
    contract of identical results to the single-chip WeakANDIndex."""
    from movie_recommendation_engine_tpu.config import default_config

    emb = _unit_rows(256, 16, seed=5)
    cfg = default_config()
    cfg.search.ivf_partitions = 8
    cfg.search.ivf_nprobe = 8
    r_sharded = BatchingRecommender(emb, method=method, max_batch=8,
                                    max_wait_ms=1.0, max_k=16, cfg=cfg)
    r_single = BatchingRecommender(emb, method=single, max_batch=8,
                                   max_wait_ms=1.0, max_k=16, cfg=cfg)
    try:
        for q in (3, 77, 200):
            got = r_sharded.recommend_by_item(q, k=8)
            want = r_single.recommend_by_item(q, k=8)
            assert got["indices"] == want["indices"]
            np.testing.assert_allclose(got["scores"], want["scores"],
                                       rtol=1e-5, atol=1e-5)
        hist = [3, 9, 40]
        got = r_sharded.recommend_by_history(hist, k=10)
        want = r_single.recommend_by_history(hist, k=10)
        assert got["indices"] == want["indices"]
        assert not set(hist) & set(got["indices"])
    finally:
        r_sharded.close()
        r_single.close()
