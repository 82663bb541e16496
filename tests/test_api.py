"""Library API (api.Engine): train / embed / recommend / serve as functions."""

import numpy as np
import pytest

from movie_recommendation_engine_tpu import api, small_test_config


@pytest.fixture(scope="module")
def engine():
    cfg = small_test_config()
    cfg.train.epochs = 1
    return api.train(cfg)


def test_train_returns_engine_with_embeddings(engine):
    emb = engine.embeddings()
    assert emb.shape == (engine.data.num_movies, engine.cfg.model.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)


def test_evaluate_reports_metrics(engine):
    out = engine.evaluate()
    assert set(f"hit_rate@{k}" for k in engine.cfg.eval.k_values) <= set(out)
    assert "mrr" in out and "mrr_standard" in out


def test_recommend_by_movie_id(engine):
    mid = int(engine.data.movie_ids[3])
    recs = engine.recommend(movie_id=mid, k=5)
    assert len(recs) == 5
    assert all(r["movieId"] != mid for r in recs)
    scores = [r["score"] for r in recs]
    assert scores == sorted(scores, reverse=True)
    # Matches direct cosine ranking.
    emb = engine.embeddings()
    sims = emb @ emb[3]
    best = next(i for i in np.argsort(-sims) if i != 3)
    assert recs[0]["movieId"] == int(engine.data.movie_ids[best])


def test_recommend_by_history_excludes_history(engine):
    hist = [int(engine.data.movie_ids[i]) for i in (1, 4, 9)]
    recs = engine.recommend(history=hist, k=6)
    assert len(recs) == 6
    assert not set(hist) & {r["movieId"] for r in recs}


def test_recommend_unknown_movie_raises(engine):
    with pytest.raises(KeyError):
        engine.recommend(movie_id=10_000_000)
    with pytest.raises(ValueError):
        engine.recommend()


def test_checkpoint_roundtrip(engine, tmp_path):
    import jax

    path = str(tmp_path / "ck")
    engine.save_checkpoint(path)
    eng2 = api.load(engine.cfg, checkpoint=path)
    # Params restore exactly. (Embeddings need NOT match the live engine
    # bit-for-bit: they depend on the neighborhood tables, which the live
    # engine sampled mid-training from an earlier RNG state.)
    for a, b in zip(jax.tree_util.tree_leaves(engine.trainer.params),
                    jax.tree_util.tree_leaves(eng2.trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Restore is deterministic: two independent loads embed identically
    # (checkpoint carries the RNG, so resampled tables coincide).
    eng3 = api.load(engine.cfg, checkpoint=path)
    np.testing.assert_allclose(eng2.embeddings(), eng3.embeddings(), atol=1e-6)


def test_serve_consistent_with_recommend(engine):
    server = engine.serve(method="exact")
    try:
        out = server.recommend_by_item(3, k=4)
        recs = engine.recommend(movie_id=int(engine.data.movie_ids[3]), k=4)
        assert out["indices"] == [
            int(np.where(engine.data.movie_ids == r["movieId"])[0][0])
            for r in recs
        ]
    finally:
        server.close()
