"""Deeper stacks (num_layers=3) and dense-vs-gather trainer equivalence."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from movie_recommendation_engine_tpu import small_test_config
from movie_recommendation_engine_tpu.core.logging import MetricsLogger
from movie_recommendation_engine_tpu.graph import dataset
from movie_recommendation_engine_tpu.models import pinsage
from movie_recommendation_engine_tpu.train.trainer import Trainer


def test_three_layer_forward_paths():
    rng = np.random.default_rng(0)
    n, f, h, e, k = 12, 8, 16, 8, 3
    params = pinsage.init_params(jax.random.PRNGKey(0), f, h, e, num_layers=3)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))
    w = jnp.asarray(rng.random((n, k)).astype(np.float32))
    full = pinsage.pooled_forward(params, x, [nbrs] * 3, [w] * 3, dtype=jnp.float32)
    assert full.shape == (n, e)
    batch = jnp.array([0, 5], dtype=jnp.int32)
    part = pinsage.pooled_forward_batch(params, x, [nbrs] * 3, [w] * 3, batch,
                                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(part), np.asarray(full)[[0, 5]],
                               atol=1e-5)
    a = pinsage.dense_pool_matrix(nbrs, w, num_cols=n, dtype=jnp.float32)
    dense = pinsage.pooled_forward_batch_dense(params, x, [a] * 3, batch,
                                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(part), atol=1e-5)


def _train_once(pool_impl, tmp_path):
    cfg = small_test_config()
    cfg.train.epochs = 2
    cfg.train.max_pairs_per_epoch = 128
    cfg.model.pool_impl = pool_impl
    cfg.model.dropout = 0.0
    cfg.train.compute_dtype = "float32"
    cfg.paths.checkpoint_dir = str(tmp_path / f"ck_{pool_impl}")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    out = tr.fit()
    return [h["loss"] for h in out["history"]], np.asarray(tr.movie_embeddings())


def test_trainer_dense_matches_gather(tmp_path):
    losses_d, emb_d = _train_once("dense", tmp_path)
    losses_g, emb_g = _train_once("gather", tmp_path)
    # Summation order differs between the scatter-built matrix and the
    # gather einsum; the tiny f32 drift compounds over optimization steps.
    np.testing.assert_allclose(losses_d, losses_g, rtol=5e-3)
    cos = (emb_d * emb_g).sum(axis=1)
    assert cos.min() > 0.995
