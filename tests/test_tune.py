"""Hyperparameter grid-search mode (reference run.py:330-429 parity)."""

import os

import numpy as np

from movie_recommendation_engine_tpu import small_test_config
from movie_recommendation_engine_tpu.core.logging import MetricsLogger
from movie_recommendation_engine_tpu.train.tune import hyperparameter_tuning


def test_tuning_grid(tmp_path):
    import io

    cfg = small_test_config()
    cfg.train.epochs = 1
    cfg.train.max_pairs_per_epoch = 64
    cfg.paths.checkpoint_dir = str(tmp_path / "ck")
    cfg.paths.output_dir = str(tmp_path / "out")
    logger = MetricsLogger(stream=io.StringIO())
    result = hyperparameter_tuning(
        cfg, logger,
        learning_rates=(1e-3,), hidden_dims=(32, 64),
    )
    assert len(result["results"]) == 2
    assert result["best"]["config"] is not None
    # best_tuned_model checkpoint written (run.py:406-410 parity).
    assert os.path.exists(str(tmp_path / "ck" / "best_tuned_model.npz"))
    # results CSV written (run.py:419-422 parity).
    assert os.path.exists(result["csv"])
    with open(result["csv"]) as f:
        header = f.readline()
    assert "hidden_dim" in header and "hit_rate@10" in header
