"""End-to-end training convergence (SURVEY.md §4d): on a synthetic
co-engagement graph, a few epochs of PinSage training must lift HR@10 well
above the random floor, and the graph (pooled) path must beat random
embeddings."""

import jax
import numpy as np
import pytest

from movie_recommendation_engine_tpu import small_test_config
from movie_recommendation_engine_tpu.graph import dataset
from movie_recommendation_engine_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_training_lifts_hit_rate(tmp_path):
    cfg = small_test_config()
    # Dense per-user histories so the temporal split yields enough held-out
    # co-rated pairs for a meaningful HR estimate (~100 ratings/user).
    cfg.data.synthetic_num_movies = 400
    cfg.data.synthetic_num_users = 400
    cfg.data.synthetic_num_ratings = 60_000
    cfg.data.use_data_subset = False
    cfg.train.epochs = 5
    cfg.train.max_pairs_per_epoch = 4000
    cfg.train.batch_size = 256
    cfg.train.num_negative_samples = 64
    cfg.model.dropout = 0.0
    cfg.paths.checkpoint_dir = str(tmp_path / "ck")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data)

    # Untrained (random-init) baseline.
    before = tr.evaluate()

    tr.fit()
    after = tr.evaluate()

    n = data.num_movies
    random_floor = 10 / n          # HR@10 of random ranking
    assert after["hit_rate@10"] > 3 * random_floor, (before, after)
    assert after["hit_rate@10"] >= before["hit_rate@10"], (before, after)
    # Embeddings must not collapse: mean pairwise similarity of random
    # movies stays clearly below 1.
    emb = np.asarray(tr.movie_embeddings())
    rng = np.random.default_rng(0)
    a = emb[rng.integers(0, n, 200)]
    b = emb[rng.integers(0, n, 200)]
    assert (a * b).sum(1).mean() < 0.98
