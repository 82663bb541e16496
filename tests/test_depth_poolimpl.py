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


def test_trainer_hybrid_matches_gather(tmp_path):
    losses_h, emb_h = _train_once("hybrid", tmp_path)
    losses_g, emb_g = _train_once("gather", tmp_path)
    np.testing.assert_allclose(losses_h, losses_g, rtol=5e-3)
    cos = (emb_h * emb_g).sum(axis=1)
    assert cos.min() > 0.995


def test_hybrid_forward_matches_gather():
    """pool_mats covering a prefix of the layers must not change the math."""
    rng = np.random.default_rng(1)
    n, f, h, e, k = 17, 8, 16, 8, 4
    params = pinsage.init_params(jax.random.PRNGKey(1), f, h, e, num_layers=3)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    nbrs_l, w_l, mats = [], [], []
    for _ in range(3):
        nb = jnp.asarray(rng.integers(0, n + 1, (n, k)).astype(np.int32))
        w = jnp.asarray(rng.random((n, k)).astype(np.float32))
        nbrs_l.append(nb)
        w_l.append(w)
        mats.append(pinsage.dense_pool_matrix(nb, w, num_cols=n, dtype=jnp.float32))
    ref = pinsage.pooled_forward(params, x, nbrs_l, w_l, dtype=jnp.float32)
    hyb = pinsage.pooled_forward(params, x, nbrs_l, w_l, dtype=jnp.float32,
                                 pool_mats=mats[:2])
    np.testing.assert_allclose(np.asarray(hyb), np.asarray(ref), atol=1e-5)

    batch = jnp.array([0, 3, 16], dtype=jnp.int32)
    ref_b = pinsage.pooled_forward_batch(params, x, nbrs_l, w_l, batch,
                                         dtype=jnp.float32)
    hyb_b = pinsage.pooled_forward_batch(params, x, nbrs_l, w_l, batch,
                                         dtype=jnp.float32, pool_mats=mats[:2])
    np.testing.assert_allclose(np.asarray(hyb_b), np.asarray(ref_b), atol=1e-5)
    # Full-length pool_mats in the batch form == the dedicated dense form.
    all_b = pinsage.pooled_forward_batch(params, x, nbrs_l, w_l, batch,
                                         dtype=jnp.float32, pool_mats=mats)
    dense_b = pinsage.pooled_forward_batch_dense(params, x, mats, batch,
                                                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(all_b), np.asarray(dense_b), atol=1e-5)


def test_f8_pool_matrix_close_to_bf16(tmp_path):
    """float8_e4m3fn pool-matrix storage (the HBM-traffic halving at ML-25M
    scale) must stay within quantization tolerance of the bf16 path and
    train end-to-end."""
    rng = np.random.default_rng(3)
    n, k = 64, 8
    nb = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))
    w = jnp.asarray(rng.random((n, k)).astype(np.float32))
    a16 = pinsage.dense_pool_matrix(nb, w, num_cols=n, dtype=jnp.float32)
    a8 = a16.astype(jnp.float8_e4m3fn)
    h = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    p16 = np.asarray(a16 @ h)
    p8 = np.asarray(a8.astype(jnp.float32) @ h)
    # e4m3 carries ~6% per-entry relative step; row sums of ~k entries keep
    # the pooled output well inside 5e-2 absolute at unit-scale features.
    np.testing.assert_allclose(p8, p16, atol=5e-2)

    import io

    from movie_recommendation_engine_tpu.config import small_test_config
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = small_test_config()
    cfg.model.pool_impl = "hybrid"
    cfg.model.pool_matrix_dtype = "float8_e4m3fn"
    cfg.train.epochs = 1
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_f8")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    out = tr.fit()
    assert np.isfinite(out["history"][-1]["loss"])
    assert tr.pool_mats and tr.pool_mats[0].dtype == jnp.float8_e4m3fn


def test_chunked_pool_matrix_builder():
    # Unique neighbor ids per row (what importance_neighborhoods produces;
    # the direct bf16 scatter is exact only then — see
    # dense_pool_matrix_direct's docstring).
    rng = np.random.default_rng(2)
    n, k, cols = 37, 5, 41
    nb = np.stack([rng.choice(cols + 1, size=k, replace=False)
                   for _ in range(n)]).astype(np.int32)
    nb = jnp.asarray(nb)
    w = jnp.asarray(rng.random((n, k)).astype(np.float32))
    ref = pinsage.dense_pool_matrix(nb, w, num_cols=cols, valid_limit=30)
    direct = pinsage.build_pool_matrix(nb, w, num_cols=cols, valid_limit=30,
                                       direct_above_rows=8)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(ref))
    assert direct.dtype == jnp.bfloat16


def test_trainer_block_matches_gather(tmp_path):
    """pool_impl=block (clustered tiles, max_blocks covering everything)
    reproduces the gather trainer exactly up to f32 summation order."""
    losses_g, emb_g = _train_once("gather", tmp_path)

    cfg = small_test_config()
    cfg.train.epochs = 2
    cfg.train.max_pairs_per_epoch = 128
    cfg.model.pool_impl = "block"
    cfg.model.block_pool_block_size = 64
    cfg.model.block_pool_max_blocks = 10_000  # keep every block: exact
    cfg.model.dropout = 0.0
    cfg.train.compute_dtype = "float32"
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_block")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    from movie_recommendation_engine_tpu.ops.block_sparse import BlockPool

    out = tr.fit()
    assert tr.pool_mats and isinstance(tr.pool_mats[0], BlockPool)
    losses_b = [h["loss"] for h in out["history"]]
    emb_b = np.asarray(tr.movie_embeddings())
    np.testing.assert_allclose(losses_b, losses_g, rtol=5e-3)
    cos = (emb_b * emb_g).sum(axis=1)
    assert cos.min() > 0.995


def test_trainer_block_fallback_on_dropped_mass(tmp_path):
    """A max_blocks budget of 1 drops most pooling mass on the synthetic
    graph -> the trainer must fall back to gather (empty pool_mats)."""
    cfg = small_test_config()
    cfg.model.pool_impl = "block"
    cfg.model.block_pool_block_size = 16
    cfg.model.block_pool_max_blocks = 1
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_blockfb")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    tr.refresh_neighborhoods()
    assert tr.pool_mats == ()


def test_hub_pool_direct_f8_build_matches_cast(tmp_path):
    """The hub slab scatter targets pool_matrix_dtype DIRECTLY (round 5):
    neighbor ids are distinct within a row, so every slab cell is written
    at most once — no f8 additions — making the direct build equal to a
    single f32->f8 rounding of the exact weights (strictly tighter than
    the old build-bf16-then-cast double rounding). This is what admits a
    2x-wider f8 head at 256k (a 32768-head bf16 transient would be 17 GB).
    Locks the equivalence, then trains an f8 hub end-to-end."""
    import jax.numpy as jnp

    from movie_recommendation_engine_tpu.ops import hub_pool as hub_mod

    rng = np.random.default_rng(7)
    n, k = 96, 8
    # Distinct ids per row (the walk-table contract).
    nb = np.stack([rng.choice(n, size=k, replace=False) for _ in range(n)])
    nb = nb.astype(np.int32)
    w = rng.random((n, k)).astype(np.float32)
    hp8, s8 = hub_mod.build_hub_pool_device(
        jnp.asarray(nb), jnp.asarray(w), valid_limit=n, head=16, residual=4,
        dtype=jnp.float8_e4m3fn)
    hp32, s32 = hub_mod.build_hub_pool_device(
        jnp.asarray(nb), jnp.asarray(w), valid_limit=n, head=16, residual=4,
        dtype=jnp.float32)
    assert hp8.a_head.dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(
        np.asarray(hp8.a_head.astype(jnp.float32)),
        np.asarray(hp32.a_head.astype(jnp.float8_e4m3fn).astype(jnp.float32)))
    assert abs(s8["dropped_mass"] - s32["dropped_mass"]) < 1e-6

    import io

    from movie_recommendation_engine_tpu.config import small_test_config
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = small_test_config()
    cfg.model.pool_impl = "hub"
    cfg.model.pool_matrix_dtype = "float8_e4m3fn"
    cfg.model.hub_pool_max_dropped_mass = 1.0  # tiny graph: observe, no gate
    cfg.train.epochs = 1
    cfg.paths.checkpoint_dir = str(tmp_path / "ck_hub_f8")
    data = dataset.load(cfg)
    tr = Trainer(cfg, data, MetricsLogger(stream=io.StringIO()))
    out = tr.fit()
    assert np.isfinite(out["history"][-1]["loss"])
    assert tr.pool_mats and tr.pool_mats[0].a_head.dtype == jnp.float8_e4m3fn
